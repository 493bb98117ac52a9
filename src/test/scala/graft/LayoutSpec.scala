package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends GraftSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction collapses a many-small-files table, preserving content") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val small = s"$base/small"; val out = s"$base/compact"
    val src = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    src.repartition(40).write.parquet(small) // the pathology: 40 tiny files
    assert(parquetFiles(small).length == 40)
    val n = Layout.compact(spark, small, out, targetFileMB = 128)
    assert(parquetFiles(out).length == n && n < 40,
      s"expected $n compacted files, found ${parquetFiles(out).length}")
    // content identical (multiset equality via sorted collect)
    val a = spark.read.parquet(out).orderBy("o_orderkey", "o_totalprice").collect()
    val b = src.orderBy("o_orderkey", "o_totalprice").collect()
    assert(a.sameElements(b))
  }

  test("dynamic partition overwrite rewrites only the partitions present in the batch") {
    // the incremental-backfill contract: re-running one day/split must not
    // truncate the rest of the table (static overwrite mode would)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    val dir = java.nio.file.Files.createTempDirectory("graft_dyn").toString + "/t"
    try {
      import spark.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "part")
        .write.partitionBy("part").mode("overwrite").parquet(dir)
      // backfill touches ONLY part=b with a corrected row
      Seq((20L, "b")).toDF("id", "part")
        .write.partitionBy("part").mode("overwrite").parquet(dir)
      val rows = spark.read.parquet(dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "a"), (20L, "b")),
        s"partition a must survive the b-only overwrite: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("range layout yields disjoint per-file key ranges (file-level skipping)") {
    val out = java.nio.file.Files.createTempDirectory("graft_range").toString + "/orders"
    Layout.rangeLayout(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_orderstatus"),
      out, "o_orderkey", numFiles = 8)
    val files = parquetFiles(out)
    assert(files.length == 8)
    // each file's [min, max] of the layout key must not overlap any other's
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // and a point-lookup plan keeps the predicate pushed to the scan, so
    // the disjoint footer stats actually get to skip files
    val plan = spark.read.parquet(out).filter(col("o_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      plan.take(800))
  }
}
