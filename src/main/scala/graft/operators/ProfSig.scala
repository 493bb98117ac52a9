package graft.operators

// SCRATCH measurement aid for optimization round 20 — A/B of the md5-minhash
// signature shapes (VERDICT r19 "next round" item 2). Deleted before close.
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProfSig {
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[sig] $name%-42s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val K = Dedup.NumHashes
    def hc(i: Int): String =
      s"cast(conv(substring(md5(concat(x, '#$i')), 1, 15), 16, 10) as bigint)"

    // A: current shape — explode + 16 wide min aggregates (one partial-agg shuffle)
    def sigExplode(docsArr: DataFrame): DataFrame = {
      val mins = (0 until K).map { i =>
        min(conv(substring(md5(concat(col("s"), lit(s"#$i"))), 1, 15), 16, 10)
          .cast("long")).as(s"mh$i")
      }
      docsArr.select(col("doc_id"), explode(col("sh")).as("s"))
        .groupBy("doc_id").agg(mins.head, mins.tail: _*)
    }
    // B: row-local — 16 × array_min(transform(sh, ...)), no explode, no shuffle
    def sigRowLocal(docsArr: DataFrame): DataFrame = {
      val mins = (0 until K).map(i =>
        expr(s"array_min(transform(sh, x -> ${hc(i)}))").as(s"mh$i"))
      docsArr.select((col("doc_id") +: mins): _*)
    }
    // C: row-local via a single transform producing all K per element, then
    // aggregate() folding elementwise mins — one pass over sh instead of 16
    def sigRowLocalOnePass(docsArr: DataFrame): DataFrame = {
      val arr = (0 until K).map(hc).mkString("array(", ", ", ")")
      val big = Long.MaxValue
      val zero = (0 until K).map(_ => s"${big}L").mkString("array(", ", ", ")")
      val sel = expr(
        s"aggregate(sh, $zero, (acc, x) -> zip_with(acc, $arr, (a, b) -> least(a, b)))")
        .as("mhs")
      docsArr.select(col("doc_id"), sel)
        .select(col("doc_id") +: (0 until K).map(i => col("mhs").getItem(i).as(s"mh$i")): _*)
    }

    for (it <- 1 to 3) {
      println(s"== iteration $it ==")
      spark.catalog.clearCache()
      val docsArr = Dedup.shingleArrays(Tables.documents(spark, dir)).cache()
      docsArr.count()
      t("A sig explode+agg (current)")(noop(sigExplode(docsArr)))
      t("B sig 16x array_min(transform)")(noop(sigRowLocal(docsArr)))
      t("C sig aggregate zip_with one-pass")(noop(sigRowLocalOnePass(docsArr)))
      t("A again")(noop(sigExplode(docsArr)))
      docsArr.unpersist()
    }
    // value identity check at sf0.01
    val smallDir = "/root/testdata/sf0.01"
    val arrS = Dedup.shingleArrays(Tables.documents(spark, smallDir)).cache()
    arrS.count()
    val a = sigExplode(arrS)
    val b = sigRowLocal(arrS)
    val c = sigRowLocalOnePass(arrS)
    println(s"[sig] identity A vs B: ${a.exceptAll(b).count()} / ${b.exceptAll(a).count()}")
    println(s"[sig] identity A vs C: ${a.exceptAll(c).count()} / ${c.exceptAll(a).count()}")
    println(s"[sig] counts: A=${a.count()} B=${b.count()} C=${c.count()}")
    spark.stop()
  }
}
