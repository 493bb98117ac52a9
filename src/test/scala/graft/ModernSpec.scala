package graft

import graft.operators.Modern
import org.apache.spark.sql.functions._

/** Specs for the Spark 4.x-native surface (operators/Modern.scala). The
  * oracle-checked members (variant, listagg, recursive CTE) are gated by
  * the driver's DuckDB compare; these specs pin the two rows-only sketch
  * queries to their exact twins plus the structural invariants that ARE
  * run-stable. */
class ModernSpec extends GraftSpec {

  test("md5-HLL twin: estimate within the sketch's standard-error envelope of the exact count") {
    val r = graft.operators.Relational.approxDistinctMd5(spark, sf0001).collect().head
    val (exact, est, empty) = (r.getLong(0), r.getDouble(1), r.getLong(2))
    assert(exact > 0 && empty > 0)
    // p=12 registers: standard error 1.04/sqrt(4096) ≈ 1.6%; allow 4σ —
    // md5 is a fixed "random" draw, so this is a deterministic check, not
    // a flaky statistical one (the harness corpus either passes or it
    // doesn't, forever)
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 0.065, f"HLL rel err $relErr%.4f vs exact $exact (est $est%.1f)")
    // the rank extraction must be the exact bit-length form: pin it on
    // known words (w=1 → 48 leading zeros → rank 49 − 1; high bit set →
    // rank 1)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ranks = Seq(1L, 1L << 47, 3L).toDF("w")
      .select(when(col("w") > 0, lit(49) - length(bin(col("w")))).otherwise(lit(49))
        .cast("int").as("rank"))
      .collect().map(_.getInt(0)).toSeq
    assert(ranks == Seq(48, 1, 47), ranks.toString)
  }

  test("md5-CM twin: estimates never undercount, and heavy hitters match exact top-10") {
    val rows = graft.operators.Modern.approxTopKMd5(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    rows.foreach { case (tok, est, exact) =>
      assert(est >= exact, s"CM one-sided guarantee violated for '$tok': $est < $exact")
    }
    // at this vocabulary (~31 tokens in 4096 counters) collisions are
    // rare enough that the estimated top-10 set equals the exact top-10
    val exactTop = graft.Tables.documents(spark, sf0001)
      .selectExpr("explode(split(text, ' ')) AS tok")
      .groupBy("tok").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("tok"))
      .limit(10).collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet == exactTop,
      s"CM top-10 ${rows.map(_._1).toSet} vs exact $exactTop")
  }

  test("md5-HLL inclusion-exclusion overlap lands near the exact intersection") {
    val r = graft.operators.RelationalExt.hllIntersectMd5(spark, sf0001).collect().head
    val (approxBoth, exactBoth) = (r.getDouble(0), r.getLong(1))
    assert(exactBoth > 0, "fixture must have click∩purchase users")
    // inclusion-exclusion compounds three ±1.6%-σ estimates scaled by the
    // set sizes; 25% is a deliberately loose deterministic envelope
    val relErr = math.abs(approxBoth - exactBoth) / exactBoth
    assert(relErr < 0.25, f"I-E overlap rel err $relErr%.4f ($approxBoth%.1f vs $exactBoth)")
  }

  test("approx_top_k estimates equal exact token counts below sketch capacity") {
    // vocabulary << maxItemsTracked=1000, so the sketch holds every item
    // exactly and the estimate must be the true count — the same
    // "sketch degrades to exact when it fits" contract the HLL spec uses
    val approx = Modern.approxTopKTokens(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // take 11 so we know the cut count: tokens tied exactly at rank 10
    // may legitimately differ between sketch and exact tie-breaks, so
    // (a) member-compare only tokens STRICTLY above the rank-11 count and
    // (b) the count-multisets of the two top-10s must still be identical
    val exact11 = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("tok")).limit(11)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val cut = if (exact11.length > 10) exact11.last._2 else -1L
    val exactTop = exact11.take(10)
    assert(approx.values.toSeq.sorted == exactTop.map(_._2).toSeq.sorted,
      s"count multisets differ: approx=$approx exact=${exactTop.toSeq}")
    val strictly = exactTop.filter(_._2 > cut).toMap
    assert(strictly.forall { case (t, c) => approx.get(t).contains(c) },
      s"approx=$approx\nexactAboveCut=$strictly")
  }

  test("HLL inclusion-exclusion intersection stays within 5% of exact") {
    val r = graft.operators.RelationalExt.hllIntersect(spark, sf0001).head
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(exact > 0, "harness users both click and purchase")
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"approx=$approx exact=$exact")
  }

  test("histogram_numeric conserves mass, stays in range, and sorts centroids") {
    val rows = Modern.histogramPrices(spark, sf0001).collect()
    assert(rows.length == 8, "one row per requested bin")
    val centroids = rows.map(_.getDouble(0))
    assert(centroids.sameElements(centroids.sorted), "centroids ordered")
    val mass = rows.map(_.getLong(1)).sum
    val li = Tables.lineitem(spark, sf0001)
    val (n, lo, hi) = {
      val r = li.agg(count(lit(1)), min(col("l_extendedprice").cast("double")),
        max(col("l_extendedprice").cast("double"))).head
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    // mass conservation up to the bigint cast's per-bin truncation
    assert(math.abs(mass - n) <= rows.length, s"mass $mass vs rows $n")
    assert(centroids.head >= lo && centroids.last <= hi, "centroids within data range")
  }

  test("recursive CTE depth equals floor(log2(key)) per supplier") {
    val rows = Modern.recursiveChain(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0)
      val hops = r.getInt(1)
      val expected = if (key <= 1) 0 else (63 - java.lang.Long.numberOfLeadingZeros(key)).toInt
      assert(hops == expected, s"key=$key hops=$hops expected=$expected")
      assert(r.getLong(2) == hops + 1L, "chain_len = hops + 1")
    }
  }

  test("ANSI mode is on: bad casts throw, try_ variants null out") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "engine must run under Spark 4's ANSI default — error_safe_funcs depends on it")
    intercept[Exception] {
      spark.sql("SELECT CAST('Brand#13' AS INT)").collect()
    }
    assert(spark.sql("SELECT try_cast('Brand#13' AS INT)").head.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT 1/0").collect()
    }
    assert(spark.sql("SELECT try_divide(1, 0)").head.isNullAt(0))
  }

  test("parameterized SQL binds named and positional markers as literals") {
    // the injection-safe query surface: markers bind as foldable literals,
    // so Catalyst still constant-folds and pushes them down
    Tables.registerAll(spark, sf0001)
    val named = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority = :p AND o_totalprice > :lo",
      Map("p" -> "1-URGENT", "lo" -> 0)).head.getLong(0)
    val positional = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority = ? AND o_totalprice > ?",
      Array("1-URGENT", 0)).head.getLong(0)
    val direct = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 0).count()
    assert(named == direct && positional == direct)
  }

  test("variant extraction agrees with string-JSON extraction on every group") {
    val viaVariant = Modern.variantExtract(spark, sf0001)
      .select("event_type", "cnt", "sum_k", "min_k", "max_k").collect()
    val viaString = Tables.events(spark, sf0001)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).cast("bigint").as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type").collect()
    assert(viaVariant.map(_.toSeq).toSeq == viaString.map(_.toSeq).toSeq)
  }
}
