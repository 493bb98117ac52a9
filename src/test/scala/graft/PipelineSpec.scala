package graft

import graft.operators.{Dedup, Pipeline, QualityFilters}
import org.apache.spark.sql.functions._

/** Semantic invariants of the composed curation pipeline, asserted
  * against the standalone oracle-checked operators it is built from. */
class PipelineSpec extends GraftSpec {

  test("curate output is disjoint from every drop category and well-formed") {
    val out = Pipeline.curate(spark, sf0001).collect()
    val ids = out.map(_.getLong(0))
    assert(ids.nonEmpty)
    assert(ids.distinct.length == ids.length, "no doc emitted twice")
    assert(ids.forall(_ % 10 != 0), "benchmark docs never in the curated set")
    assert(out.map(_.getString(4)).toSet.subsetOf(Set("train", "valid", "test")))

    val idSet = ids.toSet
    // flagged-by-quality docs must be absent
    val rep = QualityFilters.repetitionFilter(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val dec = QualityFilters.decontaminate(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(idSet.intersect(rep).isEmpty, s"repetition-flagged docs leaked: ${idSet.intersect(rep)}")
    assert(idSet.intersect(dec).isEmpty, s"contaminated docs leaked: ${idSet.intersect(dec)}")

    // of every near-dup pair that survives the quality drops, at most one
    // member is kept (the cluster collapse guarantee)
    val pairs = Dedup.jaccardNearDup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(idSet.contains(a) && idSet.contains(b)),
        s"near-dup pair ($a, $b) fully kept")
    }
  }

  test("drop-set anti-join broadcasts only under the corpus-size guard") {
    // under the guard (default 10M): a forced broadcast anti-join
    val key = "spark.graft.dropSetBroadcast.maxCorpusRows"
    spark.conf.unset(key)
    val hinted = Pipeline.curate(spark, sf0001).queryExecution.sparkPlan.toString
    assert(hinted.contains("BroadcastHashJoin") && hinted.contains("LeftAnti"),
      s"small corpus should broadcast the drop set:\n$hinted")

    // past the guard: no broadcast HINT — the initial (pre-AQE) plan must
    // fall back to a shuffled anti-join; at runtime AQE may still convert
    // when actual sizes allow, which is exactly the desired degradation
    try {
      spark.conf.set(key, "0")
      // also pin autoBroadcastJoinThreshold off so the *planner* can't
      // re-introduce a broadcast from its own stats — we are asserting the
      // hint is gone, not fighting the optimizer's legitimate choice
      val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val unhinted = Pipeline.curate(spark, sf0001).queryExecution.sparkPlan.toString
        val antiLines = unhinted.linesIterator.filter(_.contains("LeftAnti")).mkString("\n")
        assert(antiLines.nonEmpty && !antiLines.contains("BroadcastHashJoin"),
          s"guarded-off corpus must not force a broadcast anti-join:\n$unhinted")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)

      // and the guarded-off path still computes the identical answer
      val a = Pipeline.curate(spark, sf0001).collect().map(_.toString).toSeq
      spark.conf.unset(key)
      val b = Pipeline.curate(spark, sf0001).collect().map(_.toString).toSeq
      assert(a == b, "broadcast guard changed the curate result")
    } finally spark.conf.unset(key)
  }
}
