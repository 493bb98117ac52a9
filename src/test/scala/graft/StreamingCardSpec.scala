package graft

import graft.operators.Pipeline
import graft.streaming.StreamingCard
import graft.streaming.StreamingCard.CardDocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The continuous data card must converge on exactly the batch card's
  * additive metrics — same round-6 half-up, same log2 entropy, same
  * shared md5 split ranges — for any micro-batch slicing, and must not
  * double-count on a same-batchId foreachBatch retry. */
class StreamingCardSpec extends GraftSpec {
  import spark.implicits._

  private val AdditiveMetrics = Set("n_docs", "total_tokens", "mean_doc_tokens",
    "lang_entropy_bits", "split_train_frac", "split_valid_frac", "split_test_frac")

  private def docs: Seq[CardDocEvent] =
    Tables.documents(spark, sf0001).select("doc_id", "text", "lang").collect()
      .map(r => CardDocEvent(r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def batchCard: Map[String, Double] =
    Pipeline.dataCard(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
      .filter { case (k, _) => AdditiveMetrics.contains(k) }

  test("continuous card converges on the batch card's additive metrics, any slicing") {
    val expected = batchCard
    for ((seed, msId) <- Seq((2, 351), (13, 352))) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(docs)
      val cuts = (Seq.fill(3)(rnd.nextInt(shuffled.length + 1)) :+ 0 :+ shuffled.length)
        .sorted.distinct
      val chunks = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val ms = MemoryStream[CardDocEvent](msId, spark, None)
      @volatile var last: Seq[(String, Double)] = Nil
      val ckpt = java.nio.file.Files.createTempDirectory("graft_card").toString
      val q = StreamingCard.dataCardStream(ms.toDS()) { (card, _) => last = card }
        .option("checkpointLocation", ckpt).start()
      try chunks.foreach { c =>
        if (c.nonEmpty) { ms.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = last.toMap
      assert(got.keySet == AdditiveMetrics, s"card metrics: ${got.keySet}")
      AdditiveMetrics.foreach { m =>
        assert(got(m) == expected(m), s"seed=$seed metric=$m: ${got(m)} != ${expected(m)}")
      }
    }
  }

  test("same-batchId retry re-emits the previous card without double-counting") {
    val acc = new StreamingCard.CardAccumulator
    val mb = docs.take(20).toDF()
    var emitted = List.empty[Seq[(String, Double)]]
    acc.process(mb, 0L, (c, _) => emitted ::= c)
    val first = emitted.head
    acc.process(mb, 0L, (c, _) => emitted ::= c) // retried batch 0
    assert(emitted.head == first, "retry must re-emit, not recompute")
    assert(emitted.head.toMap.apply("n_docs") == 20.0, "retry must not double-count")
    acc.process(docs.slice(20, 30).toDF(), 1L, (c, _) => emitted ::= c)
    assert(emitted.head.toMap.apply("n_docs") == 30.0, "new batch still accumulates")
  }
}
