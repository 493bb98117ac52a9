package graft.operators

// SCRATCH measurement aid for optimization round 20 — stage attribution of
// entity_resolution_lsh (VERDICT r19 item 5). Deleted before round close.
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProfEr {
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
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[er] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (it <- 1 to 3) {
      println(s"== iteration $it ==")
      spark.catalog.clearCache()
      val docs = Tables.documents(spark, dir)
      val w = Window.partitionBy(md5(col("text")), length(col("text")))
      val exact = docs
        .withColumn("bmin", min(col("doc_id")).over(w))
        .filter(col("doc_id") =!= col("bmin"))
        .select(col("bmin").as("a_id"), col("doc_id").as("b_id"))
      t("exact digest window")(exact.count())
      val docsArr = Dedup.shingleArrays(docs).cache()
      t("shingleArrays cache")(docsArr.count())
      val cand = Dedup.minhashMd5CandidatesFrom(docsArr).cache()
      t("md5 band candidates")(cand.count())
      val near = Dedup.verifyPairs(cand, docsArr, 0.7).select("a_id", "b_id")
      t("verify pairs (t=0.7)")(near.count())
      val media = Multimodal.imageNearDupOf(docs, sentinels = false)
        .select(col("a_id"), col("b_id")).cache()
      t("media aHash near-dup")(media.count())
      val edges = exact.unionAll(near).unionAll(media).distinct()
      t("edge union distinct")(edges.count())
      t("connected components + agg")(
        Dedup.connectedComponents(edges).count())
      cand.unpersist(); docsArr.unpersist(); media.unpersist()
      spark.catalog.clearCache()
      t("FULL entity_resolution_lsh")(Dedup.entityResolutionLsh(spark, dir).count())
    }
    spark.stop()
  }
}
