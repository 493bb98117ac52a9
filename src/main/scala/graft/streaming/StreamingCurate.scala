package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The COMPOSED curation pipeline as a continuous job — the streaming twin
  * of the batch `pipeline_curate` flagship ([[graft.operators.Pipeline]]),
  * with the near-dup stage in its greedy growing-corpus form (the only
  * order-deterministic continuous semantic; see
  * [[StreamingDedup.growingCurationStream]]'s scaladoc for why batch CC
  * collapse has no streaming equivalent).
  *
  * Per arriving document, in doc_id order within a batch and batch order
  * across batches (the same total order as the batch pipeline's doc_id
  * survivorship rule):
  *
  *   1. exact/near dedup against every EARLIER KEPT-BY-DEDUP doc — the
  *      growing index from [[StreamingDedup.GreedyGrowingIndex]]. As in
  *      the batch pipeline, dedup runs FIRST and is blind to quality
  *      flags: a repetition-flagged doc still absorbs its exact twin
  *      (both end up dropped — stage order is semantics, not cosmetics).
  *   2. repetition gate — dominant-bigram ratio, same thresholds as
  *      [[graft.operators.QualityFilters.repetitionFilter]]; per-doc
  *      arithmetic, order-independent.
  *   3. decontamination gate — shingle containment ≥ 0.5 against a STATIC
  *      benchmark shingle frame (eval sets are fixed artifacts — MBs; at
  *      scale this is a broadcast stream-static join, the canonical
  *      Structured Streaming enrichment shape).
  *   4. split assignment — the content-stable md5 bucket of
  *      [[graft.operators.DataPrep.splitOf]]; kept docs only.
  *
  * Verdict precedence mirrors batch stage order: a dedup drop reports
  * `exact`/`near` (keeper_id set); a dedup survivor failing a gate
  * reports `repetition` else `contaminated`; survivors report `kept`
  * with their split. Each micro-batch does bounded distributed work
  * (candidates against the index + batch-local aggregates); only the
  * batch's own decision list reaches the driver.
  *
  * Spec-pinned ([[graft.StreamingCurateSpec]]): decisions equal an
  * independent O(n²) greedy + per-doc-arithmetic reference for ANY
  * micro-batch slicing of the corpus. */
object StreamingCurate {
  import StreamingDedup.DocEvent

  /** One curation decision. `verdict` ∈ kept | exact | near | repetition |
    * contaminated; `keeper_id` is the absorbing doc for dedup drops, −1
    * otherwise; `split` is train/valid/test for kept docs, "" otherwise. */
  case class CurateVerdict(doc_id: Long, verdict: String, keeper_id: Long,
                           split: String)

  private val RepMinCount = 2
  private val RepRatio = 0.05
  private val DeconThreshold = 0.5

  /** Distinct-shingle frame (s) of the benchmark documents — build once
    * from the eval-set corpus and pass to [[curateStream]]. */
  def benchmarkShingles(benchDocs: DataFrame): DataFrame =
    Dedup.shingles(benchDocs).select("s").distinct()

  def curateStream(stream: Dataset[DocEvent], benchShingles: DataFrame,
                   t: Double = 0.5)
                  (sink: (Seq[CurateVerdict], Long) => Unit)
      : DataStreamWriter[Row] = {
    val gi = new StreamingDedup.GreedyGrowingIndex(t)
    // the benchmark frame is re-joined every batch: pin it once
    val bench = benchShingles.withColumn("hit", lit(1)).localCheckpoint()

    stream.toDF().writeStream.foreachBatch { (mb0: DataFrame, batchId: Long) =>
      val mb = mb0.select("doc_id", "text").localCheckpoint()

      // ---- stage 1: greedy dedup, all docs participate (flags come later)
      val dedup = gi.decideAndGrow(mb)

      // ---- stages 2-4: per-doc, order-independent, one pass each
      val bg = Dedup.ngrams(mb, 2)
      val rep = bg.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top_c"), sum(col("c")).as("total"))
        .filter(col("top_c") >= RepMinCount &&
          col("top_c").cast("double") / col("total").cast("double") >= RepRatio)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val cont = Dedup.shingles(mb)
        .join(bench, Seq("s"), "left")
        .groupBy("doc_id").agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_hit"))
        .filter(col("n_hit").cast("double") / col("n_sh").cast("double") >= DeconThreshold)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // split assignment: same md5 bucket arithmetic as DataPrep.splitOf
      val splits = mb.select(col("doc_id"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int") % 100).as("bucket"))
        .collect().map { r =>
          val b = r.getInt(1)
          r.getLong(0) -> (if (b < 90) "train" else if (b < 95) "valid" else "test")
        }.toMap

      val verdicts = dedup.map { d =>
        if (d.kind != "kept") CurateVerdict(d.doc_id, d.kind, d.keeper_id, "")
        else if (rep(d.doc_id)) CurateVerdict(d.doc_id, "repetition", -1L, "")
        else if (cont(d.doc_id)) CurateVerdict(d.doc_id, "contaminated", -1L, "")
        else CurateVerdict(d.doc_id, "kept", -1L, splits(d.doc_id))
      }
      org.apache.spark.sql.GraftShims.unpersistCheckpoint(mb)
      sink(verdicts, batchId)
    }
  }
}
