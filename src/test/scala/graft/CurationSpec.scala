package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Semantic invariants for the Curation family — each test asserts a
  * property the hash gate alone can't express (the gate proves Spark and
  * DuckDB agree; these prove they agree on the RIGHT answer). */
class CurationSpec extends GraftSpec {
  import spark.implicits._

  test("gopher rule flags are consistent with the verdict and the signals") {
    val rows = Curation.gopherRules(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_words")
      val flags = r.getAs[Int]("rule_flags")
      val pass = r.getAs[Int]("pass")
      assert(pass == (if (flags == 15) 1 else 0), s"doc ${r.get(0)}: pass/flags")
      assert(((flags & 1) == 1) == (nw >= 30 && nw <= 100000),
        s"doc ${r.get(0)}: word-count bit disagrees with n_words=$nw")
      val stopBit = (flags & 8) == 8
      assert(stopBit == (r.getAs[Long]("stop_count") >= 2))
    }
    // the rule gate must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Int]("pass") == 0) &&
           rows.exists(_.getAs[Int]("pass") == 1))
  }

  test("DSIR weights rank the target slice above the rest on average") {
    val df = Curation.dsirWeights(spark, sf0001)
    val byTgt = df.groupBy(($"source" === "src0").as("is_tgt"))
      .agg(avg($"dsir_logweight").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the target unigram model must like its own slice more than the rest —
    // that is the entire point of importance resampling
    assert(byTgt(true) > byTgt(false),
      s"target slice mean ${byTgt(true)} !> rest ${byTgt(false)}")
    // weights are log-ratios of two proper distributions: corpus-wide token-
    // weighted mean is the negative KL(raw || tgt) ≤ 0 sanity bound
    val wMean = df.agg(sum($"dsir_logweight" * $"n_toks") / sum($"n_toks"))
      .head().getDouble(0)
    assert(wMean <= 1e-9, s"token-weighted mean log-ratio $wMean must be ≤ 0")
  }

  test("token budget keeps a maximal quality-ranked prefix under the cap") {
    val kept = Curation.tokenBudget(spark, sf0001).collect()
    val all = Curation.gopherRules(spark, sf0001) // reuse: doc_id + n_words
      .select($"doc_id", $"n_words").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = all.values.sum
    val budget = total * 6 / 10
    val keptToks = kept.map(_.getAs[Long]("n_toks")).sum
    assert(keptToks <= budget, s"kept $keptToks exceeds budget $budget")
    assert(kept.map(_.getAs[Long]("cum_tokens")).max <= budget)
    // maximality: the prefix stops only because the next doc would overflow
    val keptIds = kept.map(_.getLong(0)).toSet
    assert(keptIds.size < all.size, "budget of 60% must exclude someone")
  }

  test("k-anonymity partitions the corpus and flags exactly the small cells") {
    val rows = Curation.kAnonymity(spark, sf0001).collect()
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("k")).sum == n, "cells must partition the corpus")
    rows.foreach { r =>
      assert((r.getAs[Int]("at_risk") == 1) == (r.getAs[Long]("k") < 5))
    }
  }

  test("l-diversity flags cells whose sensitive attribute collapses") {
    val rows = Curation.lDiversity(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.map(_._3).sum == n, "cells must partition the corpus")
    rows.foreach { case (_, _, k, l, risk) =>
      assert(l >= 1 && l <= k, "diversity bounded by cell size")
      assert((risk == 1) == (l < 3))
    }
    // the audit must separate: some cell at risk, some not (else the
    // quasi-identifier choice demonstrates nothing on this corpus)
    assert(rows.exists(_._5 == 1) && rows.exists(_._5 == 0))
  }

  test("corpus diff statuses reconcile with the bucket derivation") {
    val m = Curation.corpusDiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val b = Tables.documents(spark, sf0001)
      .select(expr("conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) % 100")
        .cast("int").as("b"))
      .groupBy($"b" < 2, $"b" >= 2 && $"b" < 6, $"b" >= 96)
      .count().collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) -> r.getLong(3)).toMap
    val removed = b.collect { case ((true, _, _), c) => c }.sum
    val changed = b.collect { case ((_, true, _), c) => c }.sum
    val added = b.collect { case ((_, _, true), c) => c }.sum
    assert(m.getOrElse("removed", 0L) == removed)
    assert(m.getOrElse("changed", 0L) == changed)
    assert(m.getOrElse("added", 0L) == added)
    val n = Tables.documents(spark, sf0001).count()
    assert(m.values.sum == n + added, "v1 ∪ v2 keyspace = v1 ids + clones")
  }

  test("gated training set replays an independent pure-Scala chain") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val stop = Set("the", "a", "of", "to", "and", "in", "or", "is")
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // stage 1: gopher gate
    val gated = docs.filter { case (_, text, _) =>
      val tk = text.split(" ").filter(_.nonEmpty)
      val nw = tk.length
      val meanWl = tk.map(_.length).sum.toDouble / nw
      val fracAlpha = tk.count(_.exists(_.isLetter)).toDouble / nw
      nw >= 30 && nw <= 100000 && meanWl >= 3.0 && meanWl <= 10.0 &&
        fracAlpha >= 0.8 && tk.count(stop) >= 2
    }
    // stage 2: exact dedup, min doc_id per text
    val deduped = gated.groupBy(_._2).map(_._2.minBy(_._1)).toSeq
    // stage 3: DSIR model on the deduped slice + scoring
    val allToks = deduped.flatMap { case (id, text, src) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, src, t)) }
    val cr = allToks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = allToks.filter(_._2 == "src0").groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum; val tt = cr.keys.map(k => ct.getOrElse(k, 0L)).sum
    val v = cr.size
    val llr = cr.keys.map { k =>
      k -> (math.log((ct.getOrElse(k, 0L) + 1.0) / (tt + v)) -
            math.log((cr(k) + 1.0) / (tr + v)))
    }.toMap
    val scored = allToks.groupBy(_._1).map { case (id, ts) =>
      val w = math.round(ts.map(t => llr(t._3)).sum / ts.size * 1e6) / 1e6
      (id, ts.head._2, ts.size.toLong, w)
    }.toSeq
    // stage 4: token budget = half the surviving tokens
    val budget = scored.map(_._3).sum / 2
    val ranked = scored.sortBy { case (id, _, _, w) => (-w, id) }
    val kept = ranked.scanLeft((0L, 0L, "", 0L)) { case ((cum, _, _, _), (id, src, n, _)) =>
      (cum + n, id, src, n) }.drop(1).takeWhile(_._1 <= budget)
    // stage 5: per-source rollup with commutative id checksum
    val expected = kept.groupBy(_._3).map { case (src, rows) =>
      (src, rows.size.toLong, rows.map(_._4).sum,
        rows.map(r => java.lang.Long.parseLong(md5hex(r._2.toString).take(8), 16)).sum)
    }.toSeq.sortBy(_._1)
    val got = Curation.gatedTrainingSet(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"capstone diverges: got=${got.take(3)} exp=${expected.take(3)}")
  }

  test("water-fill budget is max-min fair and sums exactly to the budget") {
    val rows = Curation.waterfillBudget(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val totalSupply = rows.map(_._2).sum
    val budget = totalSupply * 6 / 10
    assert(rows.map(_._3).sum == budget, "allocations must sum exactly to the budget")
    rows.foreach { case (src, supply, alloc, capped) =>
      assert(alloc <= supply, s"$src allocated past its supply")
      assert((capped == 1) == (alloc == supply) || alloc == supply,
        s"$src: capped flag inconsistent with alloc")
    }
    val uncapped = rows.filter(_._4 == 0)
    if (uncapped.nonEmpty) {
      // max-min fairness: uncapped allocations are level within the integer
      // remainder, and every capped source's whole supply sits at or below
      // the waterline (else it should have been uncapped)
      assert(uncapped.map(_._3).max - uncapped.map(_._3).min <= 1,
        s"uncapped allocations not level: ${uncapped.toSeq}")
      val line = uncapped.map(_._3).min
      rows.filter(_._4 == 1).foreach { case (src, supply, _, _) =>
        assert(supply <= line + 1, s"capped $src supply $supply above waterline $line")
      }
    }
  }

  test("DSIR resample decisions replay from the weights and the md5 bucket") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = Curation.dsirResample(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0); val w = r.getDouble(3)
      val p = r.getAs[Long]("accept_permille"); val kept = r.getAs[Int]("kept")
      assert(p == math.min(1000L, math.max(0L, 500L + math.floor(w * 1000).toLong)),
        s"doc $id: permille $p inconsistent with weight $w")
      val bucket = java.lang.Long.parseLong(md5hex(id.toString).slice(12, 16), 16) % 1000
      assert(kept == (if (bucket < p) 1 else 0), s"doc $id: kept flag wrong")
    }
    // both outcomes must occur, or the operator demonstrates nothing
    assert(rows.exists(_.getAs[Int]("kept") == 1) &&
           rows.exists(_.getAs[Int]("kept") == 0))
  }

  test("quality x duplication cross-tab partitions the corpus both ways") {
    val cells = Curation.qualityDupXtab(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val n = Tables.documents(spark, sf0001).count()
    assert(cells.values.map(_._1).sum == n, "cells must partition the corpus")
    // marginal check against the standalone operators
    val passDocs = Curation.gopherRules(spark, sf0001)
      .filter("pass = 1").count()
    assert(cells.collect { case ((1, _), (c, _)) => c }.sum == passDocs)
    val dupDocs = graft.operators.Dedup.exactDedup(spark, sf0001)
      .filter("n_copies > 1").collect().map(_.getAs[Long]("n_copies")).sum
    assert(cells.collect { case ((_, 1), (c, _)) => c }.sum == dupDocs,
      "dup marginal must equal the exact-dedup group mass")
  }

  test("heaps curve grows monotonically with concave vocabulary ratio") {
    val rows = Curation.heapsCurve(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(rows.map(_._1) == (1 to 10).map(_ * 10))
    rows.sliding(2).foreach { case Seq((_, n1, v1, _), (p2, n2, v2, _)) =>
      assert(n2 >= n1 && v2 >= v1, s"curve not monotone at $p2%")
    }
    val full = rows.last
    val allToks = Tables.documents(spark, sf0001).select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    assert(full._2 == allToks.length.toLong, "100% token mass = corpus tokens")
    assert(full._3 == allToks.distinct.length.toLong, "100% vocab = corpus vocab")
    // Heaps: vocabulary grows sublinearly — the ratio V/n must not increase
    rows.sliding(2).foreach { case Seq((_, _, _, r1), (p2, _, _, r2)) =>
      assert(r2 <= r1 + 1e-9, s"vocab ratio grew at $p2%")
    }
  }

  test("lineitem profile covers every column with consistent bounds") {
    val rows = Curation.dqProfileLineitem(spark, sf0001).collect()
    assert(rows.length == 11, "one row per lineitem column")
    val n = Tables.lineitem(spark, sf0001).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      val nulls = r.getAs[Long]("n_nulls"); val nd = r.getAs[Long]("n_distinct")
      assert(nulls >= 0 && nulls <= n)
      assert(nd >= 1 && nd <= n - nulls)
      if (!r.isNullAt(4)) assert(r.getDouble(4) <= r.getDouble(5), "min <= max")
    }
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("l_returnflag").isNullAt(4), "string columns carry NULL bounds")
    assert(byName("l_quantity").getDouble(4) >= 1.0)
  }

  test("distinct-n ratios are sane and n-gram totals shrink with n") {
    val rows = Curation.distinctN(spark, sf0001).collect()
    assert(rows.length == 20 * 3, "20 sources × n ∈ {1,2,3}")
    rows.foreach { r =>
      val total = r.getAs[Long]("total_ngrams")
      val uniq = r.getAs[Long]("uniq_ngrams")
      assert(uniq >= 1 && uniq <= total)
      val ratio = r.getAs[Double]("distinct_ratio")
      assert(math.abs(ratio - math.round(uniq.toDouble / total * 1e6) / 1e6) < 1e-12)
    }
    // per source: each doc contributes (len - n + 1) n-grams, so totals
    // strictly decrease as n grows (all docs have ≥ 3 tokens here)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byN = rs.map(r => r.getInt(1) -> r.getAs[Long]("total_ngrams")).toMap
      assert(byN(1) > byN(2) && byN(2) > byN(3))
    }
  }
}
