package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TEMPORARY profiling scratch for the r19 optimization round — stage-level
  * attribution of the incremental prefix-probe path. Deleted before close. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        sys.env.getOrElse("SPARK_GRAFT_EXCL", ""))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    if (sys.env.contains("SPARK_GRAFT_PROF_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = for {a <- si.completionTime; b <- si.submissionTime} yield (a - b) / 1e3
          println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d wall=${wall.getOrElse(-1.0)}%6.2fs ${si.name.take(90)}")
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskInfo.duration > 500)
            println(f"[task ] stage=${te.stageId}%4d dur=${te.taskInfo.duration / 1e3}%6.2fs " +
              f"gc=${if (te.taskMetrics != null) te.taskMetrics.jvmGCTime / 1e3 else -1.0}%5.2fs " +
              f"cpu=${if (te.taskMetrics != null) te.taskMetrics.executorCpuTime / 1e9 else -1.0}%5.2fs " +
              f"deser=${if (te.taskMetrics != null) te.taskMetrics.executorDeserializeTime / 1e3 else -1.0}%5.2fs " +
              f"run=${if (te.taskMetrics != null) te.taskMetrics.executorRunTime / 1e3 else -1.0}%5.2fs")
      })

    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[prof] $tag ${(now - t0) / 1e9}%.2fs")
      t0 = now
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    @volatile var printNextPlan = false
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        if (printNextPlan) {
          println(s"[plan ] ---- executed plan ($f) ----")
          println(qe.executedPlan.toString.take(5000))
          printNextPlan = false
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    for (round <- 1 to 2) {
      println(s"[prof] ===== curate round $round =====")
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      locally {
        import operators.{Dedup, QualityFilters, DataPrep, Pipeline}
        val s = spark
        val kept0 = Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0)
        val rep = QualityFilters.repetitionFilter(s, dir).select("doc_id")
        noop(rep); lap("repetitionFilter")
        val con = QualityFilters.decontaminate(s, dir).select("doc_id")
        noop(con); lap("decontaminate")
        val w = Window.partitionBy(md5(col("text")), length(col("text")))
          .orderBy(col("doc_id"))
        val exact = kept0.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        noop(exact); lap("exact survivors")
        val arr = Dedup.shingleArrays(exact).cache()
        noop(arr); lap("shingleArrays cache")
        val candB = Dedup.minhashMd5CandidatesFrom(arr)
        noop(candB); lap("minhashMd5 candidates")
        val pairs = Dedup.verifyPairs(candB, arr, 0.5).select("a_id", "b_id")
        noop(pairs); lap("verifyPairs")
        val pairsCk = pairs.localCheckpoint()
        lap("pairs checkpoint (recompute)")
        val nonReps = Dedup.ccLabels(pairsCk)
          .filter(col("id") =!= col("lbl"))
          .select(col("id").as("doc_id"))
        lap("ccLabels (eager)")
        val dropSet = nonReps.union(rep).union(con).distinct()
        val keptD = exact.join(dropSet, Seq("doc_id"), "left_anti")
        noop(keptD); lap("dropSet join + kept")
        val out = DataPrep.splitOf(keptD)
          .join(keptD.select("doc_id", "lang", "source"), "doc_id")
          .select("doc_id", "lang", "source", "n_chars", "split")
          .orderBy("doc_id")
        noop(out); lap("splitOf + final")
        arr.unpersist()
      }
      println(s"[prof] ===== simhash round $round =====")
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      locally {
        val docs = Tables.documents(spark, dir)
        val toks = operators.Dedup.shingleArrays(docs)
          .select(col("doc_id"), explode(col("sh")).as("s"))
          .withColumn("h", xxhash64(col("s")))
        if (round == 2) printNextPlan = true
        noop(toks); lap("explode+hash")
        // variant: element_at concat instead of slice+concat_ws
        val toksV2 = docs
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
          .filter(size(col("tk")) >= 3)
          .select(col("doc_id"),
            array_distinct(expr("IF(size(tk) >= 3, " +
              "transform(sequence(1, size(tk) - 2), i -> " +
              "concat(element_at(tk, cast(i as int)), ' ', element_at(tk, cast(i+1 as int)), ' ', element_at(tk, cast(i+2 as int)))), " +
              "array())")).as("sh"))
          .select(col("doc_id"), explode(col("sh")).as("s"))
          .withColumn("h", xxhash64(col("s")))
        noop(toksV2); lap("explode+hash V2 (element_at concat)")
        val chk = toks.select(col("doc_id"), col("s")).exceptAll(toksV2.select(col("doc_id"), col("s"))).count() +
          toksV2.select(col("doc_id"), col("s")).exceptAll(toks.select(col("doc_id"), col("s"))).count()
        println(s"[prof] V2 symmetric diff rows = $chk")
        lap("V2 equivalence check")
        val sims = toks.groupBy("doc_id")
          .agg(graft.functions.SimHashAggregate.simhashAgg(col("h")).as("simhash"))
        noop(sims); lap("simhash agg")
        val blocks = sims
          .select(col("doc_id"), col("simhash"),
            explode(sequence(lit(0), lit(7))).as("blk"))
          .withColumn("blkval",
            expr(s"shiftrightunsigned(simhash, blk * 8)")
              .bitwiseAND(lit((1L << 8) - 1)))
        val w = Window.partitionBy(col("blk"), col("blkval"))
        val annotated = blocks
          .withColumn("bsz", count(lit(1)).over(w))
          .withColumn("bm", min(struct(col("doc_id"), col("simhash"))).over(w))
          .filter(col("bsz") >= 2)
          .cache()
        noop(annotated); lap("window annotate")
        val small = annotated.filter(col("bsz") <= 64)
          .select(col("doc_id"), col("simhash"), col("blk"), col("blkval"))
        val smallPairs = small.as("x").join(small.as("y"),
            col("x.blk") === col("y.blk") && col("x.blkval") === col("y.blkval") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
            col("x.simhash").as("ha"), col("y.simhash").as("hb"))
        val starPairs = annotated
          .filter(col("bsz") > 64 && col("doc_id") =!= col("bm.doc_id"))
          .select(col("bm.doc_id").as("a_id"), col("doc_id").as("b_id"),
            col("bm.simhash").as("ha"), col("simhash").as("hb"))
        val out = smallPairs.union(starPairs)
          .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
          .filter(col("hamming") <= 12)
          .select("a_id", "b_id", "hamming")
          .distinct()
          .orderBy("a_id", "b_id")
        noop(out); lap("pairs+verify+sort")
      }
      println(s"[prof] ===== round $round =====")
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val docs = Tables.documents(spark, dir)
      val batch = docs.filter(col("doc_id") % 7 === 0)
      val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      def keyed(d: org.apache.spark.sql.DataFrame, as: String) = d.select(
        col("doc_id").as(as), md5(col("text")).as("h"),
        length(col("text")).as("len"))
      val exact = keyed(batch, "batch_id").join(keyed(corpus, "corpus_id"), Seq("h", "len"))
        .groupBy("batch_id").agg(min("corpus_id").as("corpus_id"))
        .select(col("batch_id"), col("corpus_id"),
          lit("exact").as("kind"), lit(1.0).as("jac"))
        .cache()
      noop(exact); lap("exact digest join")
      val rest = batch.join(
        exact.select(col("batch_id").as("doc_id")), Seq("doc_id"), "left_anti")
      val bArr = operators.Dedup.shingleArrays(rest).select(
        col("doc_id").as("batch_id"), col("sh"), size(col("sh")).cast("long").as("nb"))
        .cache()
      val cArr = operators.Dedup.shingleArrays(corpus).select(
        col("doc_id").as("corpus_id"), col("sh"), size(col("sh")).cast("long").as("nc"))
        .cache()
      noop(bArr); noop(cArr); lap("bArr+cArr shingle arrays")

      val t = 0.5
      val sh = bArr.select(col("batch_id").as("id"), lit(true).as("isB"),
          explode(col("sh")).as("s"))
        .unionByName(cArr.select(col("corpus_id").as("id"), lit(false).as("isB"),
          explode(col("sh")).as("s")))
      val dfreq = sh.groupBy("s")
        .agg(count(lit(1)).as("df"),
          count(when(!col("isB"), lit(1))).as("dfc"))
        .cache()
      noop(dfreq); lap("dfreq")
      val idx = sh.join(dfreq, "s")
        .groupBy("id", "isB")
        .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("os"))
        .select(col("id"), col("isB"), size(col("os")).cast("long").as("n"),
          expr(s"slice(os, 1, cast(size(os) - ceil($t * size(os)) + 1 as int))")
            .as("pf"))
        .select(col("id"), col("isB"), col("n"), posexplode(col("pf")).as(Seq("p", "e")))
        .select(col("id"), col("isB"), col("n"), col("p").cast("long").as("p"), col("e.s").as("s"))
        .cache()
      noop(idx); lap("prefix idx")
      val prefixRows = cArr
        .select(size(col("sh")).cast("long").as("n"))
        .select(when(col("n") > 0,
          col("n") - ceil(lit(t) * col("n")).cast("long") + 1L)
          .otherwise(lit(0L)).as("p"))
        .agg(coalesce(sum("p"), lit(0L)).as("p")).head.getLong(0)
      val dfreqRows = dfreq.filter(col("dfc") > 0).count().max(1L)
      lap(s"guard counts (stat=${prefixRows.toDouble / dfreqRows})")
      val cand = idx.filter(col("isB"))
        .select(col("id").as("batch_id"), col("n").as("bn"), col("p").as("pb"), col("s"))
        .join(idx.filter(!col("isB"))
          .select(col("id").as("corpus_id"), col("n").as("cn"), col("p").as("pc"), col("s")), "s")
        .filter(col("bn") * t <= col("cn") && col("cn") * t <= col("bn"))
        .filter(lit(1L) + least(col("bn") - col("pb") - 1L, col("cn") - col("pc") - 1L) >=
          ceil(lit(t) * (col("bn") + col("cn")) / lit(1 + t)))
        .select("batch_id", "corpus_id").distinct()
      val candC = cand.cache()
      println(s"[prof] n_cand=${candC.count()} n_b=${bArr.count()} n_c=${cArr.count()} idx=${idx.count()}")
      lap("candidate join")
      val cand2 = candC
      val best = cand2
        .join(bArr.select(col("batch_id"), col("sh").as("sb"), col("nb")), "batch_id")
        .join(cArr.select(col("corpus_id"), col("sh").as("sc"), col("nc")), "corpus_id")
        .withColumn("c", size(array_intersect(col("sb"), col("sc"))).cast("long"))
        .withColumn("jac",
          col("c").cast("double") / (col("nb") + col("nc") - col("c")))
        .filter(col("jac") >= 0.5)
        .withColumn("rn", row_number().over(
          Window.partitionBy("batch_id").orderBy(col("jac").desc, col("corpus_id"))))
        .filter(col("rn") === 1)
        .select(col("batch_id"), col("corpus_id"), lit("near").as("kind"), col("jac"))
      noop(best); lap("verify+best")
      if (round == 2) {
        println("[prof] ---- cand executed plan ----")
        println(candC.queryExecution.executedPlan.toString.take(6000))
        println("[prof] ---- best executed plan ----")
        println(best.queryExecution.executedPlan.toString.take(8000))
      }
      val out = exact.unionByName(best).orderBy("batch_id").localCheckpoint()
      lap("final checkpoint")
      out.count()
      lap("count")
    }
    spark.stop()
  }
}
