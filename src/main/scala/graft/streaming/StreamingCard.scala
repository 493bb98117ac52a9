package graft.streaming

import graft.operators.DataPrep
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Continuous twin of the ADDITIVE slice of
  * [[graft.operators.Pipeline.dataCard]] — the running dataset datasheet
  * an ingest pipeline publishes while the corpus grows (reference
  * analogue: ABSENT; §2c monitoring scope, sibling of the continuous
  * quality scorer and curation streams).
  *
  * Per micro-batch, ONE small aggregate runs on the cluster — counts and
  * token mass grouped by (lang, split) — and its result (bounded by the
  * label-domain size, |langs|·|splits| rows, NOT by batch size: the same
  * sanctioned driver-state shape as the greedy curation streams) folds
  * into driver-side accumulators. The emitted card is recomputed from the
  * accumulators after each batch: `n_docs`, `total_tokens`,
  * `mean_doc_tokens`, `lang_entropy_bits`, `split_{train,valid,test}_frac`
  * — every value matching the batch card's arithmetic (round-6 half-up,
  * log2 entropy) exactly, which the spec asserts for arbitrary
  * micro-batch slicings.
  *
  * Deliberately ABSENT: the distinct-dependent metrics
  * (`exact_dup_fraction`, `n_uniq`, `type_token_ratio`) — distinct counts
  * do not accumulate additively; computing them continuously is the job
  * of the standing-digest streams ([[StreamingDedup.bloomProbeStream]],
  * [[StreamingDedup.incrementalDedupStream]]) or a sketch with known
  * error, not of a card that promises exact values. A deployment runs the
  * batch card periodically for those and this stream for the rest.
  *
  * Split assignment reuses the shared [[DataPrep.splitBucketCol]] md5
  * ranges, so the running `split_*_frac` rows converge on exactly the
  * batch card's. Same-batchId retry guard as the curation processors: a
  * re-invoked foreachBatch re-emits the previous card instead of
  * double-counting. */
object StreamingCard {

  /** Driver-side accumulator + card arithmetic, exposed for the spec. */
  final class CardAccumulator {
    private val docs   = scala.collection.mutable.Map[(String, String), Long]()
    private val tokens = scala.collection.mutable.Map[(String, String), Long]()
    private var lastBatch = -1L
    private var lastCard: Seq[(String, Double)] = Nil

    private def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fold(rows: Seq[((String, String), Long, Long)]): Unit =
      rows.foreach { case (k, d, t) =>
        docs(k) = docs.getOrElse(k, 0L) + d
        tokens(k) = tokens.getOrElse(k, 0L) + t
      }

    /** The additive card from the current accumulators — identical
      * arithmetic to the batch card (round-6 half-up, log2 entropy). */
    def card(): Seq[(String, Double)] = {
      val n = docs.values.sum
      val tok = tokens.values.sum
      val langCounts = docs.groupBy(_._1._1).view.mapValues(_.values.sum)
      val splitCounts = docs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val entropy =
        if (n == 0) 0.0
        else -langCounts.values.map { c =>
          val p = c.toDouble / n; p * (math.log(p) / math.log(2.0))
        }.sum
      Seq(
        "n_docs" -> n.toDouble,
        "total_tokens" -> tok.toDouble,
        "mean_doc_tokens" -> (if (n == 0) 0.0 else r6(tok.toDouble / n)),
        "lang_entropy_bits" -> r6(entropy)) ++
        Seq("train", "valid", "test").map(s =>
          s"split_${s}_frac" ->
            (if (n == 0) 0.0 else r6(splitCounts.getOrElse(s, 0L).toDouble / n)))
    }

    def process(mb: DataFrame, batchId: Long,
                sink: (Seq[(String, Double)], Long) => Unit): Unit = {
      if (batchId == lastBatch) { sink(lastCard, batchId); return }
      val agg = mb
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("split", DataPrep.splitLabelOf(DataPrep.splitBucketCol))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("d"), sum(col("n_toks")).as("t"))
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getLong(3)))
        .toSeq
      fold(agg)
      lastBatch = batchId; lastCard = card()
      sink(lastCard, batchId)
    }
  }

  /** Events must carry (doc_id, text, lang) — the card's label domain. */
  case class CardDocEvent(doc_id: Long, text: String, lang: String)

  /** Wire the accumulator to a stream of arriving docs. The sink receives
    * the CUMULATIVE card after every micro-batch. */
  def dataCardStream(stream: Dataset[CardDocEvent])
                    (sink: (Seq[(String, Double)], Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val acc = new CardAccumulator
    stream.toDF().writeStream
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        acc.process(mb, batchId, sink)
      }
  }
}
