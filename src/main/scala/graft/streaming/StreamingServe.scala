package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Continuous ANN serving over the standing IVF index — the vector-store
  * query loop as a streaming job, completing the standing-artifact
  * family: the dedup index serves [[StreamingDedup.incrementalDedupStream]],
  * the gram index serves [[StreamingDedup.substringSpanStream]], the bloom
  * filter serves [[StreamingDedup.bloomProbeStream]], and the IVF index
  * serves this. */
object StreamingServe {

  /** A query vector arriving on the serving stream. */
  case class VecQuery(q_id: Long, qv: Seq[Double])

  /** Each micro-batch of arriving query vectors probes the STANDING IVF
    * index (built once via
    * [[graft.operators.Similarity.ensureAnnIndex]], maintained via its
    * append/delete paths). The per-batch plan is exactly the batch
    * `ann_ivf_indexed` probe: centroids broadcast, inverted lists joined
    * on their bucket key, zero corpus-side shuffle — per-batch cost
    * follows the BATCH size, never the corpus. Split invariance is
    * structural (one query's top-k depends on (query, index) only) and
    * spec-checked over random slicings against the batch probe. Index
    * maintenance (append/delete) happens between streaming queries, as
    * with every standing-artifact stream here. */
  def annProbeStream(stream: Dataset[VecQuery], tag: String)
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.toDF().writeStream
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        sink(graft.operators.Similarity.ivfProbe(mb.sparkSession, tag,
          mb.select(col("q_id"), col("qv"))), batchId)
      }

  // ---------------------------------------------- media ingest dedup
  /** Continuous perceptual image dedup: each micro-batch of arriving image
    * docs is hashed (aHash through the real decode path) and probed
    * against the FROZEN standing band table — the media-ingest mirror of
    * the text streams above. Per-batch cost is batch-sized plus the index
    * partitions the batch's band keys touch; split invariance is
    * structural (a probe's matches depend on (doc, index) only) and
    * spec-checked over random slicings against the batch probe. Index
    * growth (newly admitted images) is an append between streaming
    * queries, exactly as for the dedup/gram/bloom/IVF artifacts. */
  def mediaProbeStream(stream: Dataset[StreamingDedup.DocEvent],
                       corpusBands: DataFrame)
                      (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val frozen = corpusBands.localCheckpoint()
    stream.toDF().writeStream
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        sink(graft.operators.Multimodal.imageProbe(mb, frozen), batchId)
      }
  }

  /** The standing band table for [[mediaProbeStream]], built from the
    * corpus at `dir`. */
  def mediaBandsFor(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.imageBandsOf(Multimodal.imageHashes(s, dir))
  }
}
