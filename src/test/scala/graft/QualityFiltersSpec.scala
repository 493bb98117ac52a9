package graft

import graft.operators.{Dedup, QualityFilters}
import org.apache.spark.sql.functions._

/** Invariants for the quality-filter operators (values are oracle-gated). */
class QualityFiltersSpec extends GraftSpec {

  test("LR fit replays an independent exact-sum gradient-descent reference, and learns") {
    import graft.operators.QualityFilters
    val feats = graft.Tables.documents(spark, sf0001)
      .select("text", "lang").collect().map { r =>
        val toks = r.getString(0).split(" ", -1)
        val x1 = toks.length.toDouble / 100
        val x2 = (r.getString(0).length - (toks.length - 1)).toDouble / toks.length / 10
        val x3 = toks.count(t => t == "the" || t == "a" || t == "of").toDouble / toks.length
        val y = if (r.getString(1) == "en") 1.0 else 0.0
        (Array(x1, x2, x3, 1.0), y)
      }
    val n = feats.length
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to QualityFilters.LrSteps) {
      val sig = feats.map { case (x, _) =>
        1.0 / (1.0 + math.exp(-(x(0) * w(0) + x(1) * w(1) + x(2) * w(2) + w(3)))) }
      // exact-sum gradient: BigDecimal accumulation stands in for the
      // engines' DECIMAL(38,20) partial sums (order-insensitive)
      val g = (0 until 4).map { j =>
        feats.indices.map(i => BigDecimal((sig(i) - feats(i)._2) * feats(i)._1(j))
          .setScale(20, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n
      }
      w = (0 until 4).map(j =>
        BigDecimal(w(j) - QualityFilters.LrRate * g(j))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
    }
    val out = QualityFilters.qualityLrFit(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((name, j) <- Seq("w1" -> 0, "w2" -> 1, "w3" -> 2, "w4" -> 3))
      assert(math.abs(out(name) - w(j)) < 1e-9, s"$name: ${out(name)} vs ${w(j)}")
    // the classifier must beat the majority-class baseline on its own
    // training set — otherwise the descent silently did nothing
    val majority = feats.map(_._2).groupBy(identity).values.map(_.length).max
    assert(out("train_acc") >= majority,
      s"acc ${out("train_acc")} below majority baseline $majority / $n")
  }

  test("ppl buckets: balanced terciles, head kept whole, tail dropped whole, middle sampled") {
    import graft.operators.QualityFilters
    val rows = QualityFilters.pplBuckets(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(3)))
    val byBucket = rows.groupBy(_._2)
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    val sizes = byBucket.view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, s"ntile imbalance: $sizes")
    assert(byBucket("head").forall(_._3), "head must be kept in full")
    assert(byBucket("tail").forall(!_._3), "tail must be dropped in full")
    val midKept = byBucket("middle").count(_._3).toDouble / byBucket("middle").length
    assert(midKept > 0.3 && midKept < 0.7, s"middle sample rate $midKept far from 1/2")
  }

  test("scrub accounting matches a direct token count of 'a'/'the'") {
    val direct = graft.Tables.documents(spark, sf0001)
      .select(sum(size(filter(split(col("text"), " "),
        t => t === "a" || t === "the")))).collect()(0).getLong(0)
    val scrubbed = QualityFilters.scrubStopTokens(spark, sf0001)
      .select(sum(col("n_removed"))).collect()(0).getLong(0)
    assert(scrubbed == direct)
  }

  test("repetition filter output respects both thresholds") {
    val rows = QualityFilters.repetitionFilter(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "top_c >= min count")
      assert(r.getDouble(3) >= 0.05 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(3) == r.getLong(1).toDouble / r.getLong(2).toDouble)
    }
  }

  test("decontamination flags near-dup partners of benchmark docs") {
    // a planted near-dup pair (jac >= 0.8) with exactly one member in the
    // benchmark (doc_id % 10 == 0) must flag the other member
    val pairs = Dedup.jaccardNearDup(spark, sf0001)
      .filter(col("jac") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.collect {
      case (a, b) if a % 10 == 0 && b % 10 != 0 => b
      case (a, b) if b % 10 == 0 && a % 10 != 0 => a
    }.toSet
    val flagged = QualityFilters.decontaminate(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture should plant cross-benchmark dups")
    assert(expected.subsetOf(flagged),
      s"missed contaminated docs: ${expected.diff(flagged)}")
  }

  test("perplexity: bigram coverage is exact, scores positive, ppl = e^nll") {
    val rows = QualityFilters.perplexityScore(spark, sf0001).cache()
    try {
      // every doc appears, with n_bigrams = n_tokens - 1
      val expected = Tables.documents(spark, sf0001)
        .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("nb"))
      val mismatch = rows.join(expected, "doc_id")
        .filter(col("n_bigrams") =!= col("nb")).count()
      assert(mismatch == 0, "bigram count = token count - 1 per doc")
      assert(rows.count() == expected.count())
      rows.collect().foreach { r =>
        val (nll, ppl) = (r.getDouble(2), r.getDouble(3))
        assert(nll > 0.0, "smoothed probabilities are < 1, so -ln > 0")
        assert(math.abs(ppl - math.exp(nll)) < ppl * 1e-4, s"ppl $ppl vs e^$nll")
      }
    } finally rows.unpersist()
  }

  test("compression ratio: deterministic, and repetitive text scores far below varied text") {
    import spark.implicits._
    val a = QualityFilters.compressRatio(spark, sf0001).collect()
    val b = QualityFilters.compressRatio(spark, sf0001).collect()
    assert(a.sameElements(b), "DEFLATE output is input-determined — runs must agree")
    a.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.2, s"ratio ${r.getDouble(3)}")
    }
    // planted contrast on a corpus-free probe
    val probe = Seq((1L, "ab " * 200), (2L, (1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")))
      .toDF("doc_id", "text")
    probe.createOrReplaceTempView("cr_probe")
    val deflater = new java.util.zip.Deflater(6)
    def ratioOf(sTxt: String): Double = {
      val bytes = sTxt.getBytes("UTF-8"); deflater.reset(); deflater.setInput(bytes); deflater.finish()
      val buf = new Array[Byte](1 << 16); var n = 0L
      while (!deflater.finished()) n += deflater.deflate(buf)
      n.toDouble / bytes.length
    }
    assert(ratioOf("ab " * 200) < 0.1, "pure repetition compresses to almost nothing")
    assert(ratioOf((1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")) >
      2 * ratioOf("ab " * 200), "varied text compresses far worse than repetition")
  }

  test("signal agreement: rho bounded, overlap within decile, full doc coverage") {
    val r = QualityFilters.qualitySignalAgreement(spark, sf0001).head
    val (n, rho, ovl) = (r.getLong(0), r.getDouble(1), r.getLong(2))
    assert(n == Tables.documents(spark, sf0001).count(), "every doc ranked by both signals")
    assert(math.abs(rho) <= 1.000001, s"spearman $rho")
    assert(ovl >= 0 && ovl <= math.max(1L, n / 10), s"overlap $ovl vs decile ${n / 10}")
  }

  test("13-gram decontamination matches an independent gram-set recompute") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def grams13(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      if (tk.length < 13) Set.empty else tk.sliding(13).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(_._1 % 10 == 0).flatMap(d => grams13(d._2)).toSet
    val expected = docs.filter(_._1 % 10 != 0)
      .map { case (id, t) => id -> (grams13(t) & bench).size.toLong }
      .filter(_._2 > 0).toMap
    val got = QualityFilters.decontaminate13gram(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"13-gram collisions diverge: got $got expected $expected")
    assert(expected.nonEmpty, "fixture must contain 13-gram leakage")
  }

  test("repetition n-gram profile: flag fires iff any published threshold is met") {
    val rows = QualityFilters.repetitionNgramProfile(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { case (id, r2, r3, r4, f) =>
      assert(f == (r2 >= 0.20 || r3 >= 0.18 || r4 >= 0.16),
        s"doc $id: flag inconsistent with fractions ($r2,$r3,$r4)")
    }
    // the published Gopher thresholds only fire at sf0.1 on this corpus
    // (7 flagged docs, DuckDB-verified; the driver gate hash-compares the
    // booleans there) — here, pin the FRACTIONS against an independent
    // recompute for the most repetitive doc instead of lowering thresholds
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def frac(t: String, n: Int): Double = {
      val gs = t.split(" ", -1).sliding(n).map(_.mkString(" ")).toSeq
      if (gs.isEmpty || gs.head.split(" ", -1).length < n) 0.0
      else {
        val counts = gs.groupBy(identity).map(_._2.size)
        counts.max.toDouble / counts.sum
      }
    }
    val top = rows.maxBy(_._2)
    assert(top._2 == math.rint(frac(docs(top._1), 2) * 1e6) / 1e6,
      s"doc ${top._1}: r2 diverges from independent recompute")
    assert(top._2 > 0.1, "fixture must contain repetitive structure")
  }

  test("observed scrub reports metrics from the same job, matching recomputation") {
    val (df, obs) = QualityFilters.scrubObserved(spark, sf0001)
    val rows = df.collect() // the one action both returns rows and fills obs
    val m = obs.get
    assert(m("n_docs") == rows.length.toLong)
    assert(m("total_removed") == rows.map(_.getLong(1)).sum)
    assert(m("max_chars_after") == rows.map(_.getLong(2)).max)
  }
}
