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
}
