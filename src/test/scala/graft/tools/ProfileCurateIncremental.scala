package graft.tools

// Scratch stage profiler for pipeline_curate_incremental (not a test; run
// via `sbt -J-Xmx16g "Test/runMain graft.tools.ProfileCurateIncremental"`).
// The heap MUST come from the launcher (-J-Xmx16g): in local mode the
// driver JVM is already running when the session is created, so a
// spark.driver.memory config here would be silently ignored and the
// stage timings would be skewed by the default sbt heap. Times each
// stage of the incremental-curation build+probe in isolation so
// optimization targets the measured hot stage, not a guess.
object ProfileCurateIncremental {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    require(Runtime.getRuntime.maxMemory() > (8L << 30),
      "launch with a >=16g heap (sbt -J-Xmx16g ...): local-mode sessions " +
      "cannot raise driver memory after JVM start")
    val spark = SparkSession.builder()
      .appName("profile-curate-incremental").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import graft.operators.{Dedup, Pipeline, QualityFilters}
    import graft.Tables
    val m = Pipeline.getClass.getDeclaredMethods
      .filter(_.getName == "curateIncremental").head

    // whole-query baseline, twice (second run shows cache-warm delta)
    (1 to 2).foreach { i =>
      timed(s"FULL curateIncremental #$i") {
        m.invoke(Pipeline, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame]
          .write.mode("overwrite").format("noop").save()
      }
    }

    // stage-level: mirror the query's internal structure
    val corpus = Tables.documents(spark, dir).filter(col("doc_id") % 10 =!= 0)
    val base  = corpus.filter(col("doc_id") % 7 =!= 0)
    val batch = corpus.filter(col("doc_id") % 7 === 0).cache()
    timed("batch count")(println("  batch rows=" + batch.count()))

    val rep = timed("repetitionFilter") {
      val r = QualityFilters.repetitionFilter(spark, dir).select("doc_id").cache()
      println("  rep rows=" + r.count()); r
    }
    val con = timed("decontaminate") {
      val c = QualityFilters.decontaminate(spark, dir).select("doc_id").cache()
      println("  con rows=" + c.count()); c
    }

    val keptM = Pipeline.getClass.getDeclaredMethods
      .filter(_.getName == "keptDocsOf").head
    val bandedM = Pipeline.getClass.getDeclaredMethods
      .filter(_.getName == "bandedNearPairs").head
    val banded = (df: org.apache.spark.sql.DataFrame) =>
      bandedM.invoke(Pipeline, df).asInstanceOf[org.apache.spark.sql.DataFrame]
    val kept = timed("kept build (banded)") {
      val k = keptM.invoke(Pipeline, spark, dir, base, Some(rep), Some(con), banded)
        .asInstanceOf[org.apache.spark.sql.DataFrame].cache()
      println("  kept rows=" + k.count()); k
    }

    val shM = Dedup.getClass.getDeclaredMethods
      .filter(_.getName == "shingleArrays").head
    def shingle(df: org.apache.spark.sql.DataFrame) =
      shM.invoke(Dedup, df, Int.box(3)).asInstanceOf[org.apache.spark.sql.DataFrame]

    val bArr = timed("bArr shingles (batch)") {
      val a = shingle(batch).select(col("doc_id").as("batch_id"), col("sh"),
        size(col("sh")).cast("long").as("nb")).cache()
      println("  bArr rows=" + a.count()); a
    }
    val cArr = timed("cArr shingles (kept)") {
      val a = shingle(kept).select(col("doc_id").as("corpus_id"), col("sh"),
        size(col("sh")).cast("long").as("nc")).cache()
      println("  cArr rows=" + a.count()); a
    }

    val candM = Dedup.getClass.getDeclaredMethods
      .filter(_.getName == "incrementalNearCandidates").head
    val cands = timed("incrementalNearCandidates") {
      val c = candM.invoke(Dedup, bArr, cArr, Double.box(0.5))
        .asInstanceOf[org.apache.spark.sql.DataFrame].cache()
      println("  candidate pairs=" + c.count()); c
    }
    timed("verify candidates (join+jac)") {
      val n = cands
        .join(bArr.select(col("batch_id"), col("sh").as("sb"), col("nb")), "batch_id")
        .join(cArr.select(col("corpus_id"), col("sh").as("sc"), col("nc")), "corpus_id")
        .withColumn("c", size(array_intersect(col("sb"), col("sc"))).cast("long"))
        .withColumn("jac", col("c").cast("double") / (col("nb") + col("nc") - col("c")))
        .filter(col("jac") >= 0.5).count()
      println("  verified pairs=" + n)
    }
    spark.stop()
  }
}
