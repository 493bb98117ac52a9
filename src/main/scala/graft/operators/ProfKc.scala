package graft.operators

// SCRATCH measurement aid for optimization round 20 — A/B of the k-center
// carried-frame width (VERDICT r19 item 7: checkpoint (vec_id, dmin) and
// re-attach v per round vs checkpointing the full vector). Deleted before
// round close.
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

object ProfKc {
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
    import graft.functions.VectorFunctions.dot
    def d2(v: org.apache.spark.sql.Column, sv: org.apache.spark.sql.Column) =
      dot(v, v) - lit(2.0) * dot(v, sv) + dot(sv, sv)
    val K = Similarity.KcenterK

    // A: current — carried frame holds (vec_id, v, dmin)
    def wide(): DataFrame = {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
      var sel = e.orderBy("vec_id").limit(1)
        .select(col("vec_id"), col("v"), lit(1L).as("s_rank"),
          lit(null).cast("double").as("dmin")).localCheckpoint()
      var dmin = e
        .join(broadcast(sel.select(col("vec_id").as("s_id"), col("v").as("sv"))), lit(true))
        .filter(col("vec_id") =!= col("s_id"))
        .select(col("vec_id"), col("v"), d2(col("v"), col("sv")).as("dmin"))
        .localCheckpoint()
      for (i <- 2 to K) {
        val next = dmin.orderBy(col("dmin").desc, col("vec_id")).limit(1)
          .select(col("vec_id"), col("v"), lit(i.toLong).as("s_rank"), col("dmin"))
          .localCheckpoint()
        val prevSel = sel
        sel = prevSel.unionByName(next).localCheckpoint()
        GraftShims.unpersistCheckpoint(prevSel)
        if (i < K) {
          val prevD = dmin
          dmin = prevD
            .join(broadcast(next.select(col("vec_id").as("s_id"), col("v").as("sv"))), lit(true))
            .filter(col("vec_id") =!= col("s_id"))
            .select(col("vec_id"), col("v"), least(col("dmin"), d2(col("v"), col("sv"))).as("dmin"))
            .localCheckpoint()
          GraftShims.unpersistCheckpoint(prevD)
        }
      }
      GraftShims.unpersistCheckpoint(dmin)
      val out = sel.select(col("s_rank"), col("vec_id"), round(col("dmin"), 6).as("dmin"))
        .orderBy("s_rank")
      out
    }

    // B: narrow — carried frame holds (vec_id, dmin) only; v re-attached
    // per round from the cached corpus (narrow ops over e keep the cached
    // partitioning, so the vec_id join can stay exchange-light)
    def narrow(): DataFrame = {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .repartition(col("vec_id")).cache()
      var sel = e.orderBy("vec_id").limit(1)
        .select(col("vec_id"), col("v"), lit(1L).as("s_rank"),
          lit(null).cast("double").as("dmin")).localCheckpoint()
      var dmin = e
        .join(broadcast(sel.select(col("vec_id").as("s_id"), col("v").as("sv"))), lit(true))
        .filter(col("vec_id") =!= col("s_id"))
        .select(col("vec_id"), d2(col("v"), col("sv")).as("dmin"))
        .localCheckpoint()
      for (i <- 2 to K) {
        val nextId = dmin.orderBy(col("dmin").desc, col("vec_id")).limit(1)
        val next = broadcast(nextId).join(e, "vec_id")
          .select(col("vec_id"), col("v"), lit(i.toLong).as("s_rank"), col("dmin"))
          .localCheckpoint()
        val prevSel = sel
        sel = prevSel.unionByName(next).localCheckpoint()
        GraftShims.unpersistCheckpoint(prevSel)
        if (i < K) {
          val prevD = dmin
          dmin = e
            .join(prevD, "vec_id")
            .join(broadcast(next.select(col("vec_id").as("s_id"), col("v").as("sv"))), lit(true))
            .filter(col("vec_id") =!= col("s_id"))
            .select(col("vec_id"), least(col("dmin"), d2(col("v"), col("sv"))).as("dmin"))
            .localCheckpoint()
          GraftShims.unpersistCheckpoint(prevD)
        }
      }
      GraftShims.unpersistCheckpoint(dmin)
      sel.select(col("s_rank"), col("vec_id"), round(col("dmin"), 6).as("dmin"))
        .orderBy("s_rank")
    }

    def t(name: String)(body: => DataFrame): Array[String] = {
      val t0 = System.nanoTime()
      val rows = body.collect().map(_.mkString("|"))
      println(f"[kc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      rows
    }
    for (it <- 1 to 3) {
      println(s"== iteration $it ==")
      spark.catalog.clearCache()
      val a = t("A wide (current)")(wide())
      spark.catalog.clearCache()
      val b = t("B narrow + reattach")(narrow())
      println(s"[kc] identical: ${a.sameElements(b)}")
    }
    spark.stop()
  }
}
