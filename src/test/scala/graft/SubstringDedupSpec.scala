package graft

import graft.operators.{Analytics, SubstringDedup}

/** Fixture-driven proofs for the substring-level dedup family and BM25 —
  * each test plants the one behavior the harness corpus cannot witness
  * (the driver oracle hash-gates the corpus-level results; these pin the
  * semantics the oracle merely reproduces). */
class SubstringDedupSpec extends GraftSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // 26 distinct filler tokens so no accidental 8-gram repeats
  private def filler(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("substring spans: a planted shared run is found once, maximal, with exact positions") {
    val run = (0 until 15).map(i => s"run$i").mkString(" ") // 15-token shared run
    val a = filler("a", 10) + " " + run + " " + filler("z", 5)  // run at pos 11
    val b = run + " " + filler("q", 20)                          // run at pos 1
    val out = SubstringDedup.substringSpansFrom(docs(1L -> a, 2L -> b))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ONE maximal span — the gaps-and-islands merge must not emit the
    // 15−8+1 = 8 constituent anchor matches as separate rows
    assert(out.toSeq == Seq((1L, 2L, 11L, 1L, 15L)), out.toSeq.toString)
  }

  test("substring spans: runs shorter than MinSpan or gram width are not reported") {
    val run = (0 until SubstringDedup.MinSpan - 1).map(i => s"r$i").mkString(" ")
    val out = SubstringDedup.substringSpansFrom(docs(
      1L -> (run + " " + filler("a", 10)),
      2L -> (run + " " + filler("b", 10)))).collect()
    assert(out.isEmpty, s"an ${SubstringDedup.MinSpan - 1}-token run is below the threshold")
  }

  test("substring spans: two separate shared runs in one pair stay two spans") {
    val r1 = (0 until 12).map(i => s"x$i").mkString(" ")
    val r2 = (0 until 13).map(i => s"y$i").mkString(" ")
    val out = SubstringDedup.substringSpansFrom(docs(
      1L -> (r1 + " " + filler("a", 9) + " " + r2),
      2L -> (r1 + " " + filler("b", 4) + " " + r2)))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // r1 at (1,1) len 12; r2 at a-pos 12+9+1=22, b-pos 12+4+1=17, len 13
    assert(out == Set((1L, 1L, 12L), (22L, 17L, 13L)), out.toString)
  }

  test("substring spans: the occurrence cap silences corpus-wide boilerplate grams") {
    val boiler = (0 until 12).map(i => s"bp$i").mkString(" ")
    // OccCap+1 docs all carrying the same 12-token boilerplate run: every
    // anchor gram inside it exceeds the corpus-wide occurrence cap, so the
    // run generates NO candidates at all — the 100 TB hot-key guard
    val many = (1L to (SubstringDedup.OccCap + 1).toLong).map(i =>
      i -> (boiler + " " + filler(s"u${i}_", 10)))
    val out = SubstringDedup.substringSpansFrom(docs(many: _*)).collect()
    assert(out.isEmpty, "boilerplate over the cap must not fan out candidates")
  }

  test("span excision removes the duplicated run from the later doc only, keeps the earlier intact") {
    val run = (0 until 15).map(i => s"run$i").mkString(" ")
    val tail = filler("q", 20)
    val out = SubstringDedup.spanExciseFrom(docs(
      1L -> (run + " " + filler("a", 10)),
      2L -> (run + " " + tail)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 is canonical (a_id side) — untouched, so absent from output;
    // doc 2 loses exactly the 15 run tokens and keeps its own tail
    assert(out.toSeq == Seq((2L, 35L, 15L, tail)), out.toSeq.toString)
  }

  test("span excision: overlapping spans never double-count; full duplicates excise to empty") {
    val run = (0 until 20).map(i => s"v$i").mkString(" ")
    // doc 3 duplicates doc 1 AND doc 2's overlapping halves of the same
    // run — two spans covering overlapping position ranges of doc 3
    val out = SubstringDedup.spanExciseFrom(docs(
      1L -> (run + " " + filler("a", 10)),
      2L -> run,
      3L -> run))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(2L) == ((20L, 20L, "")), s"doc 2 is a full duplicate of doc 1's prefix: ${out(2L)}")
    assert(out(3L) == ((20L, 20L, "")), s"overlapping spans on doc 3 must not over- or under-count: ${out(3L)}")
  }

  test("containment separates doc-inside-doc from symmetric similarity where Jaccard cannot") {
    val small = (0 until 20).map(i => s"c$i").mkString(" ")
    val big = small + " " + filler("w", 80)
    val out = SubstringDedup.containmentFrom(docs(1L -> small, 2L -> big))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 1)
    val (_, _, cont, jac) = out.head
    assert(cont == 1.0, s"the small doc's shingles are all in the big doc: $cont")
    assert(jac < 0.5, s"Jaccard must miss this embedded copy: $jac")
  }

  test("substring curate: exact dups collapse before span search; husks below the floor drop") {
    val run = (0 until 15).map(i => s"cu$i").mkString(" ")
    val d = Seq(
      1L -> (run + " " + filler("a", 20)),   // canonical span source
      2L -> (run + " " + filler("a", 20)),   // EXACT dup of 1 — must collapse in stage 1,
                                             // so it never excises against doc 1
      3L -> (run + " " + filler("b", 3)),    // later doc: run excised → 3 tokens < floor → dropped
      4L -> (run + " " + filler("c", 12)))   // later doc: run excised → 12 tokens, kept
    import spark.implicits._
    val df = d.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("curate_fixture")
    // drive the same three-stage logic through the operator by swapping
    // the table: run it via the private From-form equivalents
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.functions.md5($"text"),
        org.apache.spark.sql.functions.length($"text"))
    val exact = df.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w.orderBy($"doc_id")))
      .filter($"rn" === 1).drop("rn")
    assert(exact.count() == 3, "doc 2 collapses into doc 1")
    val excised = SubstringDedup.spanExciseFrom(exact)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(excised == Map(3L -> 15L, 4L -> 15L),
      s"both later docs lose exactly the 15-token run: $excised")
  }

  test("incremental substring: indexed probe equals the per-run rebuild on the harness corpus") {
    val plain = SubstringDedup.incrementalSubstring(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val indexed = SubstringDedup.incrementalSubstringIndexed(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(indexed == plain,
      s"lost ${(plain -- indexed).take(3)} / invented ${(indexed -- plain).take(3)}")
    assert(plain.nonEmpty, "fixture corpus must contain batch-vs-corpus spans")
  }

  test("gram-index append: probe equals a fresh build over the union UNDER THE FROZEN stop set") {
    val run = (0 until 15).map(i => s"ap$i").mkString(" ")
    val corpusA = docs(10L -> (run + " " + filler("a", 8)), 11L -> filler("b", 30))
    val corpusB = docs(20L -> (filler("c", 5) + " " + run))      // appended later
    val batch = docs(30L -> (run + " " + filler("z", 6)))
    val tag = "specgrams_append"
    SubstringDedup.buildGramsFor(spark, corpusA, tag)
    SubstringDedup.appendGrams(spark, tag, corpusB)
    val probed = SubstringDedup.probeGrams(spark, tag, batch)
      .collect().map(_.toSeq).toSet
    // the batch doc shares the run with BOTH the original corpus doc and
    // the appended one — appends must be probe-visible
    val partners = probed.map(_(1))
    assert(partners == Set(10L, 20L), s"got partners $partners")
    // reference: fresh build over the union, stop set frozen from A (all
    // of A's grams are under the cap here, so a plain rebuild agrees)
    val tag2 = "specgrams_union"
    SubstringDedup.buildGramsFor(spark, corpusA.union(corpusB), tag2)
    val fresh = SubstringDedup.probeGrams(spark, tag2, batch)
      .collect().map(_.toSeq).toSet
    assert(probed == fresh, s"append diverged from rebuild: ${probed.diff(fresh)} / ${fresh.diff(probed)}")
  }

  test("bm25: more query-term occurrences rank higher at equal length; absent docs don't appear") {
    val d1 = 1L -> ("spark spark spark " + filler("a", 27))
    val d2 = 2L -> ("spark " + filler("b", 29))
    val d3 = 3L -> filler("c", 30)
    val out = Analytics.bm25From(spark, docs(d1, d2, d3))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L), out.toSeq.toString)
    assert(out(0)._2 > out(1)._2, "tf saturation still orders 3 hits above 1")
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val short = 1L -> ("shuffle " + filler("a", 9))
    val long  = 2L -> ("shuffle " + filler("b", 59))
    val out = Analytics.bm25From(spark, docs(short, long))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L),
      s"b=0.75 must penalize the longer doc: ${out.toSeq}")
  }
}
