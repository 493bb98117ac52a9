package graft.tools

// Scratch calibration probe for the round-18 IN-RUN saturation guard on
// the per-run prefix-rebuild forms (not a test; run via
// `sbt -J-Xmx16g "Test/runMain graft.tools.ProbeSaturationStat <dir>..."`).
// For each corpus dir it rebuilds exactly the frames
// Dedup.incrementalNearCandidates materializes for `dedup_incremental`
// (batch = doc_id % 7 == 0 vs corpus) and for
// `pipeline_curate_incremental`'s nearBase stage shape, and prints the
// statistic the guard reads — corpus-side prefix rows / distinct
// shingles — so the shared 128 threshold can be validated against the
// measured regimes (heaps corpora must PASS, adversarial sf10 must
// REFUSE) without paying the full queries.
object ProbeSaturationStat {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .appName("probe-saturation-stat").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    import graft.operators.Dedup
    for (dir <- args) {
      val docs = Tables.documents(spark, dir)
      val batch  = docs.filter(col("doc_id") % 7 === 0)
      val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      val bArr = Dedup.shingleArrays(batch).select(
        col("doc_id").as("batch_id"), col("sh"))
      val cArr = Dedup.shingleArrays(corpus).select(
        col("doc_id").as("corpus_id"), col("sh"))
      val t = 0.5
      val sh = bArr.select(col("batch_id").as("id"), lit(true).as("isB"),
          explode(col("sh")).as("s"))
        .unionByName(cArr.select(col("corpus_id").as("id"), lit(false).as("isB"),
          explode(col("sh")).as("s")))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df")).cache()
      val idx = sh.join(dfreq, "s")
        .groupBy("id", "isB")
        .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("os"))
        .select(col("id"), col("isB"),
          expr(s"slice(os, 1, cast(size(os) - ceil($t * size(os)) + 1 as int))")
            .as("pf"))
        .select(col("id"), col("isB"), explode(col("pf")).as("e"))
      val t0 = System.nanoTime()
      val prefixRows = idx.filter(!col("isB")).count()
      val dfreqRows = dfreq.count().max(1L)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"STAT $dir: corpus prefix rows=$prefixRows dfreq rows=$dfreqRows " +
        f"mean=${prefixRows.toDouble / dfreqRows}%.1f (guard cost ${secs}%.1f s, threshold 128)")
      dfreq.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
