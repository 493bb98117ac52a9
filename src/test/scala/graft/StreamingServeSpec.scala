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

  test("continuous semantic dedup == day-by-day fold of the batch probe over same-centroid rebuilds") {
    // the accretion proof for the semantic stream (round 19): streaming
    // the delta in ordered micro-batches — probe, then append the KEPT
    // vectors — must decide exactly what a manual fold decides, where
    // each step probes a FRESH index rebuilt over base ∪ all previously
    // kept (the centroid set is identical: no delta id is % 200 == 0).
    // Slicing is arbitrary but ordered: the fold semantics are
    // order-dependent by design (a later twin base-hits an earlier kept
    // vector), unlike the stateless probes above.
    import graft.streaming.StreamingServe.SemDecision
    val rnd = new scala.util.Random(47)
    def vec() = Seq.fill(8)(rnd.nextInt(10).toDouble + 0.1)
    val base = (Seq(0L, 200L, 400L) ++ (1L to 149L)).map(id => (id, vec()))
    // delta: fresh directions + planted duplicates of base vectors AND of
    // earlier delta vectors (cross-batch twins once sliced)
    val fresh = (2001L to 2024L).map(id => (id, vec()))
    val deltaDups = Seq(2101L -> base(5)._2, 2102L -> fresh.head._2,
      2103L -> fresh.head._2, 2104L -> fresh(3)._2)
    val delta = rnd.shuffle(fresh ++ deltaDups).toIndexedSeq
    def df(rows: Seq[(Long, Seq[Double])]) = rows.toDF("vec_id", "v")
    for ((seed, msId) <- Seq((11, 381), (29, 382))) {
      val r2 = new scala.util.Random(seed)
      val cuts = (Seq.fill(2)(r2.nextInt(delta.length + 1)) :+ 0 :+ delta.length)
        .sorted.distinct
      val chunks = cuts.zip(cuts.tail).map { case (a, b) => delta.slice(a, b) }
        .filter(_.nonEmpty)
      // the manual fold: fresh same-centroid rebuild per step
      var keptSoFar = Seq.empty[(Long, Seq[Double])]
      val expected = chunks.zipWithIndex.flatMap { case (c, i) =>
        val tag = s"spec_semfold_${seed}_$i"
        Similarity.buildSemDedupFor(df(base ++ keptSoFar), tag)
        val got = Similarity.semanticDedupIvfIndexedFor(spark, tag, df(c))
          .collect().map(r => SemDecision(r.getLong(0), r.getLong(1), r.getBoolean(2)))
        keptSoFar ++= c.filter { case (id, _) => got.exists(d => d.vec_id == id && d.kept) }
        got
      }.toSet
      assert(expected.exists(!_.kept), "fixture must contain duplicates")
      // the stream over the same slicing
      val tagS = s"spec_semstream_$seed"
      Similarity.buildSemDedupFor(df(base), tagS)
      val ms = MemoryStream[VecQuery](msId, spark, None)
      val sink = scala.collection.mutable.ArrayBuffer[SemDecision]()
      val ckpt = java.nio.file.Files.createTempDirectory("graft_semserve").toString
      val q = StreamingServe.semanticDedupStream(ms.toDS(), tagS) { (ds, _) =>
        sink.synchronized { sink ++= ds }
        ()
      }.option("checkpointLocation", ckpt).start()
      try chunks.foreach { c =>
        ms.addData(c.map { case (id, v) => VecQuery(id, v) }: _*)
        q.processAllAvailable()
      } finally q.stop()
      val got = sink.synchronized(sink.toSet)
      assert(got == expected,
        s"seed=$seed: semantic stream diverges from the batch fold " +
        s"(missing=${(expected -- got).take(3)}, extra=${(got -- expected).take(3)})")
    }
  }
}
