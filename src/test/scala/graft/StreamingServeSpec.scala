package graft

import graft.operators.Similarity
import graft.streaming.StreamingServe
import graft.streaming.StreamingServe.VecQuery
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous ANN serving must return, per query, exactly what the batch
  * standing-index probe returns — independent of how the query stream is
  * sliced into micro-batches. */
class StreamingServeSpec extends GraftSpec {
  import spark.implicits._

  test("continuous IVF probe == batch standing-index probe for arbitrary slicings") {
    val rnd = new scala.util.Random(31)
    def vec() = Seq.fill(8)(rnd.nextInt(10).toDouble)
    val corpus = (Seq(0L, 200L, 400L) ++ (1L to 149L)).map(id => (id, vec()))
    Similarity.buildAnnFor(corpus.toDF("vec_id", "v"), "spec_annserve")
    val queries = (500L to 529L).map(id => VecQuery(id, vec()))
    val expected = Similarity.ivfProbe(spark, "spec_annserve",
        queries.toDF("q_id", "qv")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(expected.nonEmpty)
    for ((seed, msId) <- Seq((4, 361), (17, 362))) {
      val r2 = new scala.util.Random(seed)
      val shuffled = r2.shuffle(queries)
      val cuts = (Seq.fill(2)(r2.nextInt(shuffled.length + 1)) :+ 0 :+ shuffled.length)
        .sorted.distinct
      val chunks = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val ms = MemoryStream[VecQuery](msId, spark, None)
      val sink = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Double)]()
      val ckpt = java.nio.file.Files.createTempDirectory("graft_serve").toString
      val q = StreamingServe.annProbeStream(ms.toDS(), "spec_annserve") { (df, _) =>
        val rows = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        sink.synchronized { sink ++= rows }
        ()
      }.option("checkpointLocation", ckpt).start()
      try chunks.foreach { c =>
        if (c.nonEmpty) { ms.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = sink.synchronized(sink.toSet)
      assert(got == expected,
        s"seed=$seed: streamed serving diverges from the batch probe " +
        s"(missing=${(expected -- got).take(3)}, extra=${(got -- expected).take(3)})")
    }
  }

  test("continuous media probe == batch probe for arbitrary slicings") {
    import graft.operators.Multimodal
    import graft.streaming.StreamingDedup.DocEvent
    val base = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._1 % 3 != 1)
    val bands = StreamingServe.mediaBandsFor(spark, sf0001)
    // the arriving stream carries copies + a 1-byte edit of an indexed
    // image (ids in the image classes) — matches are guaranteed nonempty
    val (srcId, srcText) = base(1)
    val events = (base.take(8).map { case (id, t) => DocEvent(id, t) } ++ Seq(
      DocEvent(90000L, srcText),
      DocEvent(90002L, srcText.updated(srcText.length / 2, 'q')))).toSeq
    val expected = Multimodal.imageProbe(
        events.toDF("doc_id", "text"), bands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.exists(m => m._1 == 90000L && m._2 == srcId && m._3 == 0),
      s"planted copy must match its indexed source: $expected")
    for ((seed, msId) <- Seq((9, 371), (23, 372))) {
      val r2 = new scala.util.Random(seed)
      val shuffled = r2.shuffle(events)
      val cuts = (Seq.fill(2)(r2.nextInt(shuffled.length + 1)) :+ 0 :+ shuffled.length)
        .sorted.distinct
      val chunks = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val ms = MemoryStream[DocEvent](msId, spark, None)
      val sink = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      val ckpt = java.nio.file.Files.createTempDirectory("graft_mserve").toString
      val q = StreamingServe.mediaProbeStream(ms.toDS(), bands) { (df, _) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        sink.synchronized { sink ++= rows }
        ()
      }.option("checkpointLocation", ckpt).start()
      try chunks.foreach { c =>
        if (c.nonEmpty) { ms.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = sink.synchronized(sink.toSet)
      assert(got == expected,
        s"seed=$seed: streamed media probe diverges from the batch probe " +
        s"(missing=${(expected -- got).take(3)}, extra=${(got -- expected).take(3)})")
    }
  }
}
