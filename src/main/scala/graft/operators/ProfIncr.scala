package graft.operators

// SCRATCH measurement aid for optimization round 20 — stage attribution of
// pipeline_curate_incremental. Deleted before round close (the Prof.scala
// convention from r19).
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProfIncr {
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
      .config("spark.sql.optimizer.excludedRules", graft.GraftExtensions.ExcludedOptimizerRules)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    // warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.documents(s, dir).count()

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep0 <- 1 to 3) {
      println(s"== iteration $rep0 ==")
      spark.catalog.clearCache()

      val corpus = Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0)
      val base  = corpus.filter(col("doc_id") % 7 =!= 0)
      val batch = corpus.filter(col("doc_id") % 7 === 0).cache()
      t("batch cache")(batch.count())
      val rep = QualityFilters.repetitionFilter(s, dir).select("doc_id").cache()
      t("rep (repetitionFilter)")(rep.count())
      val con = QualityFilters.decontaminate(s, dir).select("doc_id").cache()
      t("con (decontaminate)")(con.count())

      // kept build, decomposed
      val w = Window.partitionBy(md5(col("text")), length(col("text")))
        .orderBy(col("doc_id"))
      val exact = base.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn").cache()
      t("base exact survivors (window)")(exact.count())
      val arr = Dedup.shingleArrays(exact).cache()
      t("shingleArrays(exact) cache fill")(arr.count())
      val cand = Dedup.minhashMd5CandidatesFrom(arr).cache()
      t("md5-band candidates")(cand.count())
      val pairs = Dedup.verifyPairs(cand, arr, 0.5).select("a_id", "b_id").cache()
      t("verify pairs")(pairs.count())
      val labels = t("ccLabels (CC fixpoint)")(Dedup.ccLabels(pairs.select("a_id", "b_id")))
      t("ccLabels count")(labels.count())
      cand.unpersist(); pairs.unpersist()

      val nonReps = labels.filter(col("id") =!= col("lbl")).select(col("id").as("doc_id"))
      val dropSet = nonReps.union(rep).union(con).distinct()
      val kept = Pipeline.dropSetJoin(s, dir, exact, dropSet).cache()
      t("kept (drop-set anti-join) cache")(kept.count())

      // batch probe section
      def keyed(d: DataFrame, as: String): DataFrame = d.select(
        col("doc_id").as(as), md5(col("text")).as("h"), length(col("text")).as("len"))
      val exactBase = keyed(batch, "doc_id")
        .join(keyed(kept, "kid"), Seq("h", "len"))
        .groupBy("doc_id").agg(min("kid").as("ref_id")).cache()
      t("exactBase digest join")(exactBase.count())
      val r1 = batch.join(exactBase.select("doc_id"), Seq("doc_id"), "left_anti")
      val grp = Window.partitionBy(md5(col("text")), length(col("text")))
      val r1k = r1.withColumn("keep_id", min("doc_id").over(grp))
      val r2 = r1k.filter(col("doc_id") === col("keep_id")).drop("keep_id").cache()
      t("r2 (batch exact window)")(r2.count())

      val bArr = Dedup.shingleArrays(r2).select(
        col("doc_id").as("batch_id"), col("sh"),
        size(col("sh")).cast("long").as("nb")).cache()
      t("bArr cache")(bArr.count())
      val cArr = Dedup.shingleArrays(kept).select(
        col("doc_id").as("corpus_id"), col("sh"),
        size(col("sh")).cast("long").as("nc")).cache()
      t("cArr cache (shingleArrays(kept))")(cArr.count())
      val (nearCand, nearCaches) = t("incrementalNearCandidates BUILD (guard actions)") {
        Dedup.incrementalNearCandidates(bArr, cArr, 0.5, "prof", "prof")
      }
      val nearCandC = nearCand.cache()
      t("near candidate join")(nearCandC.count())
      val nearBase = nearCandC
        .join(bArr.select(col("batch_id"), col("sh").as("sb"), col("nb")), "batch_id")
        .join(cArr.select(col("corpus_id"), col("sh").as("sc"), col("nc")), "corpus_id")
        .withColumn("c", size(array_intersect(col("sb"), col("sc"))).cast("long"))
        .withColumn("jac", col("c").cast("double") / (col("nb") + col("nc") - col("c")))
        .filter(col("jac") >= 0.5)
        .withColumn("rn", row_number().over(
          Window.partitionBy("batch_id").orderBy(col("jac").desc, col("corpus_id"))))
        .filter(col("rn") === 1)
        .select(col("batch_id").as("doc_id"), col("corpus_id").as("ref_id"), col("jac"))
        .localCheckpoint()
      t("nearBase verify+best (localCheckpoint already eager)")(nearBase.count())
      nearCaches.foreach(_.unpersist()); nearCandC.unpersist()
      val r3 = r2.join(nearBase.select("doc_id"), Seq("doc_id"), "left_anti").cache()
      t("r3 cache")(r3.count())
      val nearBatch = t("nearBatch (jaccardPairsFrom(r3) + CC)") {
        Dedup.ccLabels(Dedup.jaccardPairsFrom(r3).select("a_id", "b_id"))
          .filter(col("id") =!= col("lbl")).localCheckpoint()
      }
      t("nearBatch count")(nearBatch.count())
      val r4 = r3.join(nearBatch.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      val r5 = r4.join(rep, Seq("doc_id"), "left_anti")
      val r6 = r5.join(con, Seq("doc_id"), "left_anti")
      t("tail joins + splits")(DataPrep.splitOf(r6).count())
      spark.catalog.clearCache()
      t("FULL curateIncremental")(Pipeline.curateIncremental(s, dir).count())
    }
    spark.stop()
  }
}
