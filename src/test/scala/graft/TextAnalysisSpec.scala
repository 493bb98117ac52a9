package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSpec {

  test("fingerprint is order-sensitive: permuted document fingerprints differently") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val vals = df
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      .withColumn("term",
        (col("pos") + 1L) * ((length(col("t")) * 127L + ascii(col("t"))) % 2147483647L))
      .groupBy("doc_id").agg(sum("term").as("f"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(vals(0) != vals(1), "permutation must change the fingerprint")
    // and the real operator runs clean on the corpus
    assert(TextAnalysis.fingerprint(spark, sf0001).count() > 0)
  }

  test("quality signals are in-range on the corpus") {
    val rows = TextAnalysis.qualityScore(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ttr = r.getDouble(4); val stop = r.getDouble(5); val q = r.getDouble(6)
      assert(ttr > 0 && ttr <= 1.0)
      assert(stop >= 0 && stop <= 1.0)
      assert(q >= 0 && q <= 1.0)
    }
  }

  test("stratified sample keeps 100% strata intact and downsamples 'en' to ~50%") {
    val full = Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val sampled = TextAnalysis.stratifiedSample(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    full.foreach { case (lang, n) =>
      val s = sampled.getOrElse(lang, 0L)
      if (lang == "en") assert(s > n * 0.3 && s < n * 0.7, s"en: $s of $n")
      else assert(s == n, s"$lang stratum must be kept whole: $s of $n")
    }
  }

  test("stratified sample is content-deterministic: invariant under repartitioning") {
    // the hash-mod keep rule must be a pure function of doc_id — the same
    // per-row fate regardless of physical layout (the property seeded
    // sampleBy lacks, and the reason a 100 TB rerun/backfill can trust it)
    import org.apache.spark.sql.functions._
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
      df.filter(bucket < when(col("lang") === "en", 50).otherwise(100))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val docs = Tables.documents(spark, sf0001)
    val base = keptIds(docs)
    assert(base == keptIds(docs.repartition(13)), "layout changed the sample")
    assert(base == keptIds(docs.orderBy(desc("n_chars"))), "order changed the sample")
    assert(base.nonEmpty)
  }

  test("lang-id confusion rollup covers every document exactly once") {
    val n = TextAnalysis.langId(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    val total = Tables.documents(spark, sf0001).count()
    assert(n == total)
  }
}
