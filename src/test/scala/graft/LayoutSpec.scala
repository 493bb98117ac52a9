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

  test("morton interleave round-trips bit-exactly against a reference impl") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val probe = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)) ++
      Seq((255L, 0L), (0L, 255L), (255L, 255L), (170L, 85L))
    val got = probe.toDF("x", "y")
      .withColumn("z", Layout.morton(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    probe.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"morton($x,$y)")
    }
  }

  test("hilbert index is a bijection and consecutive indices are ALWAYS adjacent cells") {
    import spark.implicits._
    // full 16×16 grid at bits=4: the curve must visit every cell exactly
    // once (bijection onto 0..255) and each step must move exactly one
    // cell in Manhattan distance — the locality guarantee Morton lacks
    // (the Z-curve jumps at every power-of-two boundary)
    val probe = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = probe.toDF("x", "y")
      .withColumn("h", Layout.hilbert(col("x"), col("y"), bits = 4))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    assert(got.map(_._1).sorted.toSeq == (0L until 256L).toSeq, "bijection onto 0..255")
    val byD = got.sortBy(_._1).map(_._2)
    byD.toSeq.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve step ($x1,$y1)→($x2,$y2) is not unit-adjacent")
    }
    // reference impl agreement at bits=8 on asymmetric probes (catches a
    // transposed x/y convention a symmetric grid cannot)
    def refRot(n: Long, x0: Long, y0: Long, rx: Long, ry: Long): (Long, Long) =
      if (ry == 0) { val (x, y) = if (rx == 1) (n - 1 - x0, n - 1 - y0) else (x0, y0); (y, x) }
      else (x0, y0)
    def ref(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      for (i <- 7 to 0 by -1) {
        val s = 1L << i
        val rx = (x >> i) & 1L; val ry = (y >> i) & 1L
        d += s * s * ((3 * rx) ^ ry)
        val (nx, ny) = refRot(256L, x, y, rx, ry); x = nx; y = ny
      }
      d
    }
    val asym = Seq((255L, 0L), (0L, 255L), (170L, 85L), (1L, 254L))
    val got8 = asym.toDF("x", "y")
      .withColumn("h", Layout.hilbert(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    asym.foreach { case (x, y) => assert(got8((x, y)) == ref(x, y), s"hilbert($x,$y)") }
  }

  test("z-order layout bounds BOTH key dims per file; single-key sort does not") {
    val base = java.nio.file.Files.createTempDirectory("graft_z").toString
    val df = Tables.lineitem(spark, sf0001)
      .select(pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
              pmod(col("l_suppkey") * 37, lit(256)).cast("long").as("y"))
    Layout.zOrderLayout(df, s"$base/z", "x", "y", bits = 8, numFiles = 16)
    Layout.rangeLayout(df, s"$base/x", "x", numFiles = 16)
    def spreads(dir: String): Array[(Long, Long)] = parquetFiles(dir).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(max("x") - min("x"), max("y") - min("y")).head
      (r.getLong(0), r.getLong(1))
    }
    // Z-order: the WORST file still covers only a fraction of each dim's
    // 0..255 range — footer min/max stats can prune on either predicate
    val z = spreads(s"$base/z")
    assert(z.map(_._1).max < 200 && z.map(_._2).max < 200,
      s"z-order must bound both dims: ${z.toSeq}")
    // single-key sort: x is tight but y stays at (nearly) full range —
    // median spread shows the typical file is unprunable on y
    val xs = spreads(s"$base/x").map(_._2).sorted
    assert(xs(xs.length / 2) > 200,
      s"single-key layout leaves y unbounded per file: ${xs.toSeq}")
  }
}
