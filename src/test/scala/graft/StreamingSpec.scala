package graft

import graft.operators.TimeWindows
import graft.streaming.StreamingWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{TTLConfig, Trigger}
import java.sql.Timestamp

/** The streaming twin must compute exactly what the batch, oracle-checked
  * operators compute on the same data — that equivalence is the test. */
class StreamingSpec extends GraftSpec {
  import spark.implicits._

  test("file-replay sliding counts == batch oracle-checked slidingCounts") {
    val stream = StreamingWindows.eventsFileStream(spark, sf0001)
    val agg = StreamingWindows.slidingCounts(stream)
    val q = agg.writeStream
      .format("memory").queryName("sliding_mem")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sliding_mem")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = TimeWindows.slidingCounts(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("file-replay handles every ts encoding the driver has shipped (long-nanos, NTZ, TZ)") {
    // the driver regenerates /root/testdata between rounds and has already
    // switched events.ts physical types once (nanos → NTZ-micros, round 7),
    // silently breaking the watermark path. Synthesize all three encodings
    // and replay each — a future regeneration can't break streaming unseen.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val batch = TimeWindows.slidingCounts(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val base = Tables.events(spark, sf0001)  // normalized TimestampType
    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "tz"    -> base,
      "ntz"   -> base.withColumn("ts", col("ts").cast("timestamp_ntz")),
      "nanos" -> base.withColumn("ts", unix_micros(col("ts")) * 1000L))
    variants.foreach { case (name, df) =>
      val work = Files.createTempDirectory(s"graft_ts_$name")
      val outDir = work.resolve("spark_out")
      df.coalesce(1).write.parquet(outDir.toString)
      // eventsFileStream expects a single FILE named events.parquet inside
      // the table dir (the driver's layout) — move the lone part file there
      val part = Files.list(outDir).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val tableDir = work.resolve("table")
      Files.createDirectories(tableDir)
      Files.move(part, tableDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

      val stream = StreamingWindows.eventsFileStream(spark, tableDir.toString)
      assert(stream.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"$name: loader must normalize ts")
      val q = StreamingWindows.slidingCounts(stream)
        .writeStream.format("memory").queryName(s"replay_$name")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val streamed = spark.table(s"replay_$name")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch, s"$name encoding diverged from the batch result")
    }
  }

  test("MemoryStream incremental: counts accumulate across micro-batches") {
    val ms = MemoryStream[(Timestamp, String)](42, spark, None)
    val df = ms.toDF().toDF("ts", "event_type")
    val agg = StreamingWindows.slidingCounts(df, winSec = 60, slideSec = 30,
      watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("inc_mem")
      .outputMode("complete").start()
    try {
      ms.addData((Timestamp.valueOf("2024-01-01 00:00:10"), "click"))
      q.processAllAvailable()
      ms.addData((Timestamp.valueOf("2024-01-01 00:00:20"), "click"),
                 (Timestamp.valueOf("2024-01-01 00:01:05"), "view"))
      q.processAllAvailable()
      val rows = spark.table("inc_mem")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // click@10,click@20 → windows starting at -30 and 0 with cnt 2
      // view@65 → windows starting at 30 and 60 with cnt 1
      val epoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      assert(rows == Set(
        (epoch - 30, "click", 2L), (epoch, "click", 2L),
        (epoch + 30, "view", 1L), (epoch + 60, "view", 1L)))
    } finally q.stop()
  }

  test("streaming hashtag pipeline keeps reference tokenizer semantics") {
    val ms = MemoryStream[(Timestamp, String, String)](43, spark, None)
    val df = ms.toDF().toDF("ts", "lang", "text")
    val agg = StreamingWindows.hashtagCounts(df, winSec = 60, slideSec = 60,
      watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("tag_mem")
      .outputMode("complete").start()
    try {
      ms.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), "en", "#a  #b x #a"),
        (Timestamp.valueOf("2024-01-01 00:00:02"), "de", "#nope"),
        (Timestamp.valueOf("2024-01-01 00:00:03"), "en", "# plain"))
      q.processAllAvailable()
      val rows = spark.table("tag_mem")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      // lang≠en dropped; '#a' twice; bare '#' kept (reference quirk)
      assert(rows == Set(("#a", 2L), ("#b", 1L), ("#", 1L)))
    } finally q.stop()
  }

  test("processing-time windows: batch-arrival counting with reference window shape") {
    // the reference counts by wall-clock arrival, not event time; golden
    // values are impossible (the clock moves), so assert the invariants
    // that define the semantics instead
    val ms = MemoryStream[(Long, String)](50, spark, None)
    val df = ms.toDF().toDF("event_id", "event_type")
    val agg = StreamingWindows.processingTimeCounts(df, winSec = 60, slideSec = 30)
    val q = agg.writeStream.format("memory").queryName("proc_mem")
      .outputMode("complete").start()
    try {
      val before = System.currentTimeMillis() / 1000
      ms.addData((1L, "click"), (2L, "click"), (3L, "view"))
      q.processAllAvailable()
      val after = System.currentTimeMillis() / 1000
      val rows = spark.table("proc_mem")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // every event lands in exactly window/slide = 2 sliding windows
      assert(rows.filter(_._2 == "click").map(_._3).sum == 4L)
      assert(rows.filter(_._2 == "view").map(_._3).sum == 2L)
      rows.foreach { case (start, _, _) =>
        assert(start % 30 == 0, s"window start $start not slide-aligned")
        assert(start >= before - 60 && start <= after,
          s"window start $start not within the batch's wall-clock envelope")
      }
    } finally q.stop()
  }

  test("Kafka-shaped source decodes to the events schema and feeds the same sliding counts") {
    // no broker in the sandbox: a MemoryStream of Kafka-shaped rows (binary
    // value) stands in for format("kafka"); decodeKafkaEvents is the same
    // code either way, and the source options are asserted config-complete
    val opts = StreamingWindows.kafkaSourceOptions("broker:9092", "events")
    assert(opts("subscribe") == "events" && opts("kafka.bootstrap.servers") == "broker:9092"
      && opts.contains("startingOffsets") && opts.contains("maxOffsetsPerTrigger")
      && opts.contains("failOnDataLoss"))

    val ms = MemoryStream[Array[Byte]](49, spark, None)
    val decoded = StreamingWindows.decodeKafkaEvents(ms.toDF().toDF("value"))
    val agg = StreamingWindows.slidingCounts(decoded, winSec = 60, slideSec = 30,
      watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("kafka_mem")
      .outputMode("complete").start()
    try {
      val epoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      def rec(id: Long, tsSec: Long, et: String): Array[Byte] =
        s"""{"event_id":$id,"ts":${tsSec * 1000000L},"user_id":1,"event_type":"$et","value":1.0,"props":"{}"}"""
          .getBytes("UTF-8")
      ms.addData(rec(1, epoch + 10, "click"), rec(2, epoch + 20, "click"),
                 "not json at all".getBytes("UTF-8")) // poison pill: dropped, not fatal
      q.processAllAvailable()
      val rows = spark.table("kafka_mem")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // same window arithmetic as the MemoryStream/batch twins
      assert(rows == Set((epoch - 30, "click", 2L), (epoch, "click", 2L)))
    } finally q.stop()
  }

  test("stateful aggregation recovers from checkpoint across query restarts") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val ms = MemoryStream[(Timestamp, String)](48, spark, None)
    val agg = StreamingWindows.slidingCounts(
      ms.toDF().toDF("ts", "event_type"), winSec = 60, slideSec = 60,
      watermark = "10 minutes")
    def start() = agg.writeStream.format("memory").queryName("ckpt_mem")
      .option("checkpointLocation", ckpt).outputMode("complete").start()

    val q1 = start()
    try {
      ms.addData((Timestamp.valueOf("2024-01-01 00:00:10"), "click"))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // restart from the same checkpoint
    try {
      ms.addData((Timestamp.valueOf("2024-01-01 00:00:20"), "click"))
      q2.processAllAvailable()
      val rows = spark.table("ckpt_mem")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      // state restored: both events in the same window → cnt 2, not 1
      assert(rows == Set(("click", 2L)), s"got $rows")
    } finally q2.stop()
  }

  test("foreachBatch top-k per window reproduces the reference's per-batch console shape") {
    // the reference printed "top 10 + distinct count" per batch
    // (main.scala:51-55); rank-per-window cannot run inside an append
    // stream, so the idiomatic port computes it per micro-batch in
    // foreachBatch over the windowed counts — asserted against the same
    // rank computed in batch
    import org.apache.spark.sql.DataFrame
    val ms = MemoryStream[(Timestamp, String, String)](52, spark, None)
    val agg = StreamingWindows.hashtagCounts(ms.toDF().toDF("ts", "lang", "text"),
      winSec = 60, slideSec = 60, watermark = "10 minutes")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Int)]()
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("win_start")).orderBy(col("cnt").desc, col("tag"))
        sink.synchronized {
          sink.clear()
          sink ++= batch.withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 2)
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        }
        ()
      }.start()
    try {
      ms.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), "en", "#a #b #a"),
        (Timestamp.valueOf("2024-01-01 00:00:02"), "en", "#b #c #b #b"))
      q.processAllAvailable()
      val epoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      val got = sink.synchronized(sink.toSet)
      // counts: #b=4, #a=2, #c=1 → top-2 is (#b,4),( #a,2)
      assert(got == Set((epoch, "#b", 4L, 1), (epoch, "#a", 2L, 2)), s"got $got")
    } finally q.stop()
  }

  test("partitioned streaming parquet sink: hive layout, exactly-once across restart") {
    // the production sink beyond memory/console: parquet + partitionBy with
    // the file-sink transaction log (_spark_metadata) giving exactly-once
    // output across query restarts from the same checkpoint
    val dir  = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    val ms = MemoryStream[(Long, String, Timestamp)](51, spark, None)
    val df = ms.toDF().toDF("event_id", "event_type", "ts")
    def start() = df.writeStream.format("parquet")
      .option("path", dir).option("checkpointLocation", ckpt)
      .partitionBy("event_type").outputMode("append").start()

    val t = Timestamp.valueOf("2024-01-01 00:00:01")
    val q1 = start()
    try { ms.addData((1L, "click", t), (2L, "view", t)); q1.processAllAvailable() }
    finally q1.stop()

    val q2 = start() // restart from the same checkpoint: batch 0 must not re-commit
    try { ms.addData((3L, "click", t)); q2.processAllAvailable() }
    finally q2.stop()

    val back = spark.read.parquet(dir)
    assert(back.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L)), "exactly-once: no duplicates, no loss")
    // partition columns become hive-style directories (pruned on read)
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("event_type="))
    assert(parts.toSet == Set("event_type=click", "event_type=view"))
  }

  test("stream-stream join matches purchases to preceding clicks within the gap") {
    val clicks = MemoryStream[(Long, Long, Timestamp)](46, spark, None)
    val purchases = MemoryStream[(Long, Long, Timestamp)](47, spark, None)
    val joined = StreamingWindows.streamStreamJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts"),
      maxGapSec = 300L)
    val q = joined.writeStream.format("memory").queryName("ssj_mem")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      clicks.addData((100L, 1L, new Timestamp(t0)),
                     (101L, 2L, new Timestamp(t0)))
      purchases.addData(
        (200L, 1L, new Timestamp(t0 + 60_000)),   // 60 s after click → match
        (201L, 2L, new Timestamp(t0 + 600_000)),  // 600 s after → outside gap
        (202L, 3L, new Timestamp(t0 + 30_000)))   // no click for user 3
      q.processAllAvailable()
      val rows = spark.table("ssj_mem")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(rows == Set((100L, 200L, 60L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks only after the watermark") {
    val clicks = MemoryStream[(Long, Long, Timestamp)](54, spark, None)
    val purchases = MemoryStream[(Long, Long, Timestamp)](55, spark, None)
    val joined = StreamingWindows.streamStreamJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts"),
      maxGapSec = 300L, watermark = "0 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer_mem")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      clicks.addData((100L, 1L, new Timestamp(t0)),       // will match
                     (101L, 2L, new Timestamp(t0)))       // never matches
      purchases.addData((200L, 1L, new Timestamp(t0 + 60_000)))
      q.processAllAvailable()
      // user 2's click must NOT have emitted a null row yet: a purchase at
      // t0+300 s could still arrive — the outer result is provisional
      // until the watermark passes click_ts + gap
      val early = spark.table("ssj_outer_mem")
        .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
      assert(early == Set((100L, false)), s"got $early")
      // advance both watermarks far past t0+300 s (min of the two drives
      // the global watermark), then one more batch to apply it
      clicks.addData((110L, 9L, new Timestamp(t0 + 3_600_000)))
      purchases.addData((210L, 9L, new Timestamp(t0 + 3_600_000)))
      q.processAllAvailable()
      clicks.addData((111L, 9L, new Timestamp(t0 + 3_700_000)))
      purchases.addData((211L, 9L, new Timestamp(t0 + 3_700_000)))
      q.processAllAvailable()
      val ids = spark.table("ssj_outer_mem")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(ids(100L) == 200L)
      assert(ids.get(101L).contains(-1L),
        s"unmatched click must emit (click, null) after watermark: $ids")
    } finally q.stop()
  }

  test("stream-static decontamination equals the batch operator on the same corpus") {
    import graft.operators.{Dedup, QualityFilters}
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    val bench = Dedup.shingles(docs.filter(col("doc_id") % 10 === 0))
      .select("s").distinct()
    val ms = MemoryStream[(Long, String)](48, spark, None)
    val q = StreamingWindows.streamingDecontaminate(
        ms.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("decon_mem")
      .outputMode("complete").start()
    try {
      // feed the non-benchmark docs across two micro-batches
      val rows = docs.filter(col("doc_id") % 10 =!= 0)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("decon_mem")
        .collect().map(_.getLong(0)).toSet
      val batch = QualityFilters.decontaminate(spark, sf0001)
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch,
        s"stream-static result diverged: only-stream=${streamed.diff(batch)} only-batch=${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered keys across micro-batches") {
    val ms = MemoryStream[(Long, Timestamp)](45, spark, None)
    val df = ms.toDF().toDF("event_id", "ts")
    val q = StreamingWindows.streamingDedup(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:01")
      ms.addData((1L, t), (1L, t), (2L, t))   // in-batch duplicate
      q.processAllAvailable()
      ms.addData((1L, t), (3L, t))            // cross-batch re-delivery
      q.processAllAvailable()
      val ids = spark.table("dedup_mem").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)))
    } finally q.stop()
  }

  test("StreamingQueryListener surfaces per-batch progress metrics") {
    // the monitoring hook a production pipeline wires to its metrics
    // system: input rows and state rows per micro-batch, no polling
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        seen.add(e.progress.numInputRows)
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val ms = MemoryStream[(Long, String)](57, spark, None)
    val q = ms.toDF().toDF("event_id", "event_type")
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("listener_mem")
      .outputMode("complete").start()
    try {
      ms.addData((1L, "click"), (2L, "view"), (3L, "click"))
      q.processAllAvailable()
      // progress events are posted asynchronously after the batch commits
      val deadline = System.currentTimeMillis() + 30000
      while (!seen.contains(3L) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(seen.contains(3L), s"expected a 3-input-row batch in $seen")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("built-in session_window streams: sessions close when the watermark passes the gap") {
    // the third sessionization form (besides FMGWS and transformWithState):
    // the declarative session_window aggregate — state merging and
    // eviction are the engine's, emission is append-on-watermark
    val ms = MemoryStream[(Long, Timestamp)](56, spark, None)
    val agg = ms.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "60 seconds").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start"),
              unix_timestamp(col("w.end")).as("sess_end"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("sw_mem")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      ms.addData((1L, new Timestamp(t0)), (1L, new Timestamp(t0 + 30_000)))
      q.processAllAvailable()
      assert(spark.table("sw_mem").isEmpty,
        "open session must not emit before the watermark passes its close")
      // watermark jumps past t0+90 s (session end = last event + gap)
      ms.addData((2L, new Timestamp(t0 + 600_000)))
      q.processAllAvailable()
      ms.addData((2L, new Timestamp(t0 + 601_000))) // one more batch applies it
      q.processAllAvailable()
      val rows = spark.table("sw_mem")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val s0 = t0 / 1000
      // session [t0, t0+30+60): two events, closed by watermark passage
      assert(rows == Set((1L, s0, s0 + 90, 2L)), s"got $rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer splits on gap > threshold") {
    val ms = MemoryStream[StreamingWindows.SessEvent](44, spark, None)
    // NoTimeout: the assertion is about in-batch gap splitting; a
    // processing-time timeout would keep scheduling batches and hang
    // processAllAvailable.
    val sessions = StreamingWindows.sessionize(ms.toDS(), gapSec = 60,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.format("memory").queryName("sess_mem")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      ms.addData(
        StreamingWindows.SessEvent(1L, new Timestamp(t0)),
        StreamingWindows.SessEvent(1L, new Timestamp(t0 + 30_000)),
        StreamingWindows.SessEvent(1L, new Timestamp(t0 + 300_000)), // gap > 60 s
        StreamingWindows.SessEvent(2L, new Timestamp(t0)))
      q.processAllAvailable()
      // first session of user 1 closed by the in-batch gap
      val closed = spark.table("sess_mem")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(closed == Set((1L, t0 / 1000, t0 / 1000 + 30, 2L)))
    } finally q.stop()
  }

  test("MapState running counts: per-type totals accumulate across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamingWindows.TypedEvent](59, spark, None)
      val counts = StreamingWindows.runningTypeCounts(ms.toDS())
      val q = counts.writeStream.format("memory").queryName("map_mem")
        .outputMode("update").start()
      try {
        ms.addData(
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(1L, "view"),
          StreamingWindows.TypedEvent(2L, "click"))
        q.processAllAvailable()
        val b1 = spark.table("map_mem")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(b1 == Set((1L, "click", 2L), (1L, "view", 1L), (2L, "click", 1L)), s"b1=$b1")
        // batch 2: only touched (user, type) pairs re-emit, with running totals
        ms.addData(
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(2L, "purchase"))
        q.processAllAvailable()
        val all = spark.table("map_mem")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(all == b1 ++ Set((1L, "click", 3L), (2L, "purchase", 1L)), s"all=$all")
        // the latest emission per (user, type) equals the batch groupBy of
        // everything replayed — MapState is the streaming twin of count()
        val latest = spark.table("map_mem")
          .groupBy("user_id", "event_type").agg(max("cnt").as("cnt"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(latest == Set((1L, "click", 3L), (1L, "view", 1L),
          (2L, "click", 1L), (2L, "purchase", 1L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState recovers exactly-once from checkpoint after a mid-stream kill") {
    // fault-tolerance proof for the custom-state path (VERDICT r5 item 5):
    // the RocksDB-backed MapState must survive a query kill and restart
    // from checkpoint with exactly-once semantics. The kill is placed at a
    // DELIBERATELY racy point — data added but processAllAvailable not
    // called — so batch 2 may land before or after the cut; the final
    // totals must be identical either way (state restored, offsets
    // neither replayed nor dropped), which is the exactly-once contract.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
      val ms = MemoryStream[StreamingWindows.TypedEvent](63, spark, None)
      // memory-sink recovery is Complete-mode-only; foreachBatch is the
      // restartable update-mode sink
      val sink = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
      def start() =
        StreamingWindows.runningTypeCounts(ms.toDS()).writeStream
          .option("checkpointLocation", ckpt).outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = batch.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            sink.synchronized { sink ++= rows }
            ()
          }.start()

      val q1 = start()
      try {
        ms.addData(
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(2L, "view"))
        q1.processAllAvailable()
        val b1 = sink.synchronized(sink.toSet)
        assert(b1 == Set((1L, "click", 2L), (2L, "view", 1L)), s"b1=$b1")
        // batch 2 enqueued, then the query is stopped WITHOUT waiting
        ms.addData(
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(2L, "view"))
      } finally q1.stop()

      val q2 = start()
      try {
        // batch 3 touches every key so the update-mode output re-emits
        // each running total no matter which side of the kill batch 2
        // landed on
        ms.addData(
          StreamingWindows.TypedEvent(1L, "click"),
          StreamingWindows.TypedEvent(2L, "view"),
          StreamingWindows.TypedEvent(3L, "purchase"))
        q2.processAllAvailable()
        val latest = sink.synchronized(sink.toSeq)
          .groupBy(e => (e._1, e._2)).map { case (_, es) => es.maxBy(_._3) }.toSet
        assert(latest == Set((1L, "click", 4L), (2L, "view", 3L), (3L, "purchase", 1L)),
          s"state must continue exactly-once across the kill: $latest")
      } finally q2.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("ListState sequence detector: matches complete across micro-batch boundaries") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamingWindows.SeqEvent](61, spark, None)
      val hits = StreamingWindows.detectSequences(ms.toDS())
      val q = hits.writeStream.format("memory").queryName("seq_mem")
        .outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        def ev(u: Long, t: String, off: Long) =
          StreamingWindows.SeqEvent(u, t, new Timestamp(t0 + off * 1000))
        // batch 1: user 1 has click,view (incomplete); user 2 breaks
        // adjacency with an error between view and purchase
        ms.addData(ev(1, "click", 0), ev(1, "view", 1),
          ev(2, "click", 0), ev(2, "view", 1), ev(2, "error", 2), ev(2, "purchase", 3))
        q.processAllAvailable()
        assert(spark.table("seq_mem").count() == 0, "no complete adjacent run yet")
        // batch 2: user 1's purchase completes the pattern ACROSS batches
        // (the suffix [click,view] survived in ListState); a second full
        // run in-batch also fires
        ms.addData(ev(1, "purchase", 2),
          ev(1, "click", 10), ev(1, "view", 11), ev(1, "purchase", 12))
        q.processAllAvailable()
        val rows = spark.table("seq_mem")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val s0 = t0 / 1000
        assert(rows == Set((1L, s0 + 2), (1L, s0 + 12)), s"got $rows")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sessionizer state is bounded to ACTIVE users: closed sessions free their rows") {
    // the 100 TB state story: per-key state must be reclaimed when the
    // event-time timer closes a session, or state grows with every user
    // ever seen instead of concurrent actives. Pinned via the state
    // operator's numRowsTotal metric: 3 open sessions → 3 rows; after the
    // watermark closes them, only the one still-open session remains.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamingWindows.SessEvent](65, spark, None)
      val q = StreamingWindows.sessionizeTws(ms.toDS(), gapSec = 60,
        watermark = "0 seconds").writeStream
        .format("memory").queryName("state_bound_mem").outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        ms.addData(
          StreamingWindows.SessEvent(1L, new Timestamp(t0)),
          StreamingWindows.SessEvent(2L, new Timestamp(t0 + 1000)),
          StreamingWindows.SessEvent(3L, new Timestamp(t0 + 2000)))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.head.numRowsTotal == 3L,
          "one state row per open session")
        // watermark jumps past end+gap for users 1-3 (one-batch lag),
        // their timers fire and clear state; user 4 stays open
        ms.addData(StreamingWindows.SessEvent(4L, new Timestamp(t0 + 600_000)))
        q.processAllAvailable()
        ms.addData(StreamingWindows.SessEvent(4L, new Timestamp(t0 + 601_000)))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L,
          "closed sessions must release their state rows")
        val closed = spark.table("state_bound_mem").count()
        assert(closed == 3L, s"users 1-3 emitted on close, got $closed")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sessionizer merges an out-of-order in-watermark event across micro-batches") {
    // regression pin for the round-4 min/max merge fix: a LATE event that
    // arrives in a later micro-batch but inside the watermark, EARLIER
    // than the open session's start, must extend the session backwards
    // (start = min) and count — not reset it or open a phantom session
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamingWindows.SessEvent](64, spark, None)
      val sessions = StreamingWindows.sessionizeTws(ms.toDS(), gapSec = 60,
        watermark = "10 minutes")
      val q = sessions.writeStream.format("memory").queryName("tws_ooo_mem")
        .outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        // batch 1: open session [100 s, 130 s], n=2
        ms.addData(
          StreamingWindows.SessEvent(1L, new Timestamp(t0 + 100_000)),
          StreamingWindows.SessEvent(1L, new Timestamp(t0 + 130_000)))
        q.processAllAvailable()
        // batch 2: out-of-order event at 90 s — before the session start,
        // within the 10 min watermark, within gap of the session
        ms.addData(StreamingWindows.SessEvent(1L, new Timestamp(t0 + 90_000)))
        q.processAllAvailable()
        // advance the watermark past end+gap (190 s): needs max_ts−600 s
        // > 190 s, then one more batch (watermark applies with a lag)
        ms.addData(StreamingWindows.SessEvent(2L, new Timestamp(t0 + 900_000)))
        q.processAllAvailable()
        ms.addData(StreamingWindows.SessEvent(2L, new Timestamp(t0 + 901_000)))
        q.processAllAvailable()
        val rows = spark.table("tws_ooo_mem")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val s0 = t0 / 1000
        assert(rows == Set((1L, s0 + 90, s0 + 130, 3L)),
          s"late in-watermark event must merge backwards (start=min, n+1): $rows")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState sessionizer: in-batch split + watermark-timer close") {
    // the Spark 4 arbitrary-state API needs the RocksDB provider (named
    // state column families); scoped to this query, restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamingWindows.SessEvent](53, spark, None)
      val sessions = StreamingWindows.sessionizeTws(ms.toDS(), gapSec = 60,
        watermark = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName("tws_mem")
        .outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        // batch 1: two sessions for user 1 in one batch (170 s > gap) —
        // the first must close in-batch, the second stays open with an
        // event-time timer armed at end+gap = t0+240 s
        ms.addData(
          StreamingWindows.SessEvent(1L, new Timestamp(t0)),
          StreamingWindows.SessEvent(1L, new Timestamp(t0 + 10_000)),
          StreamingWindows.SessEvent(1L, new Timestamp(t0 + 180_000)))
        q.processAllAvailable()
        // batch 2 advances the watermark to t0+600 s (> timer); batch 3
        // then fires the timer (watermark is applied with one batch lag)
        ms.addData(StreamingWindows.SessEvent(2L, new Timestamp(t0 + 600_000)))
        q.processAllAvailable()
        ms.addData(StreamingWindows.SessEvent(2L, new Timestamp(t0 + 601_000)))
        q.processAllAvailable()
        val rows = spark.table("tws_mem")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val s0 = t0 / 1000
        assert(rows == Set(
          (1L, s0, s0 + 10, 2L),         // in-batch gap split
          (1L, s0 + 180, s0 + 180, 1L)), // closed by the event-time timer
          s"got $rows")
        // user 2's session (600..601) is still open — correctly unemitted
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming exact dedup: cross-batch duplicates drop within the watermark, state evicts after") {
    // the streaming half of the dedup family (batch: dedup_exact,
    // dedup_incremental): dropDuplicatesWithinWatermark guarantees
    // at-most-once per key among events within the watermark delay of
    // each other, with state EVICTED once the watermark passes — bounded
    // state, explicitly weaker than global dedup (a re-arrival after
    // eviction re-emits; the batch pass catches those)
    val ms = MemoryStream[(Timestamp, Long)](63, spark, None)
    val dedup = ms.toDF().toDF("ts", "doc_id")
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = dedup.writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def ev(offSec: Long, id: Long) = (new Timestamp(t0 + offSec * 1000), id)
      // in-batch dup (doc 1 twice) + distinct doc 2
      ms.addData(ev(0, 1L), ev(5, 1L), ev(10, 2L))
      q.processAllAvailable()
      // cross-batch dup within the watermark: state still holds doc 1
      ms.addData(ev(20, 1L))
      q.processAllAvailable()
      val early = spark.table("dedup_mem").collect()
        .map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap
      assert(early === Map(1L -> 1, 2L -> 1), s"got $early")
      val stateBefore = q.lastProgress.stateOperators.head.numRowsTotal
      // watermark sails past doc 1's expiry (20 s + 60 s delay): its state
      // row is evicted, so a much-later re-arrival legitimately re-emits
      ms.addData(ev(600, 3L))
      q.processAllAvailable()
      ms.addData(ev(620, 1L))
      q.processAllAvailable()
      val late = spark.table("dedup_mem").collect()
        .map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap
      assert(late === Map(1L -> 2, 2L -> 1, 3L -> 1), s"got $late")
      assert(q.lastProgress.stateOperators.head.numRowsTotal < stateBefore + 2,
        "expired dedup state must not accumulate")
    } finally q.stop()
  }

  test("streaming as-of equals the batch reference on random streams and batch splits") {
    // randomized events over few users and a narrow time range, delivered
    // in random order across a random number of micro-batches, then
    // watermark-advanced: the emitted matches must equal a direct batch
    // reference computed with the as-of tie policy — cross-batch
    // buffering and ordering can't depend on where batch boundaries fall
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import StreamingWindows.AsOfEv
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evGen = Gen.zip(Gen.chooseNum(1L, 2L), Gen.chooseNum(0L, 20L),
      Gen.oneOf("click", "purchase"))
    val caseGen = Gen.zip(Gen.listOfN(16, evGen), Gen.chooseNum(1, 4))
    val cases = (0 until 4).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(7L + i)))
    try cases.zipWithIndex.foreach { case ((raw, nBatches), caseNo) =>
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val events = raw.zipWithIndex.map { case ((uid, sec, typ), i) =>
        AsOfEv(uid, new Timestamp(t0 + sec * 1000), typ, i.toLong)
      }
      val expected = events.filter(_.event_type == "purchase").flatMap { p =>
        val clicks = events.filter(c => c.event_type == "click" &&
          c.user_id == p.user_id && c.ts.getTime / 1000 <= p.ts.getTime / 1000)
        if (clicks.isEmpty) None
        else {
          val best = clicks.maxBy(c => (c.ts.getTime / 1000, c.event_id))
          Some((p.user_id, p.event_id, best.event_id,
            p.ts.getTime / 1000 - best.ts.getTime / 1000))
        }
      }.toSet

      val ms = MemoryStream[AsOfEv](100 + caseNo, spark, None)
      val q = StreamingWindows.asofTws(ms.toDS(), watermark = "10 minutes")
        .writeStream.format("memory").queryName(s"asof_prop_$caseNo")
        .outputMode("append").start()
      try {
        events.grouped(math.max(1, events.length / nBatches)).foreach { b =>
          ms.addData(b: _*); q.processAllAvailable()
        }
        // two sentinel batches push the watermark far past every event
        ms.addData(AsOfEv(99L, new Timestamp(t0 + 10_000_000), "view", 900L))
        q.processAllAvailable()
        ms.addData(AsOfEv(99L, new Timestamp(t0 + 10_001_000), "view", 901L))
        q.processAllAvailable()
        val got = spark.table(s"asof_prop_$caseNo").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got === expected,
          s"case $caseNo (batches=$nBatches): events=$events")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming nearest as-of equals the batch nearest reference on random streams") {
    // the tolerance-bounded nearest twin: random few-user, narrow-range
    // streams over random micro-batch splits must equal the batch pick
    // rule (abs-gap argmin, ties backward, backward ties largest id,
    // forward ties smallest id, signed gap) — cross-batch buffering, the
    // pending-purchase wait (a decision may need a click from a LATER
    // batch), and click-window eviction can't change answers
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import StreamingWindows.AsOfEv
    val tol = 4L
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evGen = Gen.zip(Gen.chooseNum(1L, 2L), Gen.chooseNum(0L, 20L),
      Gen.oneOf("click", "purchase"))
    val caseGen = Gen.zip(Gen.listOfN(16, evGen), Gen.chooseNum(1, 4))
    val cases = (0 until 4).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(31L + i)))
    try cases.zipWithIndex.foreach { case ((raw, nBatches), caseNo) =>
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val events = raw.zipWithIndex.map { case ((uid, sec, typ), i) =>
        AsOfEv(uid, new Timestamp(t0 + sec * 1000), typ, i.toLong)
      }
      def sec(e: AsOfEv) = e.ts.getTime / 1000
      val expected = events.filter(_.event_type == "purchase").flatMap { p =>
        val cs = events.filter(c => c.event_type == "click" && c.user_id == p.user_id)
        val back = cs.filter(c => sec(c) <= sec(p) && sec(p) - sec(c) <= tol)
          .sortBy(c => (sec(c), c.event_id)).lastOption
        val fwd = cs.filter(c => sec(c) > sec(p) && sec(c) - sec(p) <= tol)
          .sortBy(c => (sec(c), c.event_id)).headOption
        val chosen = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (sec(p) - sec(b) <= sec(f) - sec(p)) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
        chosen.map(c => (p.user_id, p.event_id, c.event_id, sec(p) - sec(c)))
      }.toSet

      val ms = MemoryStream[AsOfEv](200 + caseNo, spark, None)
      val q = StreamingWindows.asofNearestTws(ms.toDS(),
          tolerance = java.time.Duration.ofSeconds(tol), watermark = "10 minutes")
        .writeStream.format("memory").queryName(s"asof_near_prop_$caseNo")
        .outputMode("append").start()
      try {
        events.grouped(math.max(1, events.length / nBatches)).foreach { b =>
          ms.addData(b: _*); q.processAllAvailable()
        }
        // sentinels push the watermark past every decision point
        ms.addData(AsOfEv(99L, new Timestamp(t0 + 10_000_000), "view", 900L))
        q.processAllAvailable()
        ms.addData(AsOfEv(99L, new Timestamp(t0 + 10_001_000), "view", 901L))
        q.processAllAvailable()
        val got = spark.table(s"asof_near_prop_$caseNo").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got === expected,
          s"case $caseNo (batches=$nBatches): events=$events")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming nearest as-of: forward wait, equal-gap tie, beyond-tolerance drop") {
    // deterministic edges: a purchase must WAIT for a possibly-nearer
    // future click (decision at watermark > s+tol), equal gaps resolve
    // backward, beyond-tolerance purchases drop, forward gap is negative
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingWindows.AsOfEv
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def ev(uid: Long, s: Long, t: String, id: Long) =
        AsOfEv(uid, new Timestamp(t0 + s * 1000), t, id)
      val ms = MemoryStream[AsOfEv](210, spark, None)
      val q = StreamingWindows.asofNearestTws(ms.toDS(),
          tolerance = java.time.Duration.ofSeconds(5), watermark = "0 seconds")
        .writeStream.format("memory").queryName("asof_near_edge_mem")
        .outputMode("append").start()
      try {
        // batch 1: purchase @10 with click @7 (back gap 3) — NOT decidable
        // yet (needs watermark past 15); nothing may emit
        ms.addData(ev(1, 7, "click", 1), ev(1, 10, "purchase", 2))
        q.processAllAvailable()
        assert(spark.table("asof_near_edge_mem").count() == 0,
          "purchase decided before its forward window closed")
        // batch 2: click @12 (fwd gap 2 < back gap 3) arrives LATER but
        // must win; purchase @30 equal gaps (clicks @28,@32) → backward;
        // purchase @50 nearest click @44 (gap 6 > tol) → dropped
        ms.addData(ev(1, 12, "click", 3),
          ev(1, 28, "click", 4), ev(1, 30, "purchase", 5), ev(1, 32, "click", 6),
          ev(1, 44, "click", 7), ev(1, 50, "purchase", 8))
        q.processAllAvailable()
        // sentinels close every decision window
        ms.addData(ev(99, 10000, "view", 900)); q.processAllAvailable()
        ms.addData(ev(99, 10001, "view", 901)); q.processAllAvailable()
        val got = spark.table("asof_near_edge_mem").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got === Set((2L, 3L, -2L), (5L, 4L, 2L)),
          s"got $got")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming as-of never finalizes the watermark's still-open second") {
    // a mid-second watermark (70_200 ms → horizon sec 70) must NOT flush
    // sec-70 events: a same-second click at 70_900 ms is still admissible
    // (ts >= watermark) and is the purchase's true match under the batch
    // tie policy. With a <=-horizon flush the purchase would mis-match
    // the older click at sec 50.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingWindows.AsOfEv
      val ms = MemoryStream[AsOfEv](64, spark, None)
      val q = StreamingWindows.asofTws(ms.toDS(), watermark = "0 seconds")
        .writeStream.format("memory").queryName("asof_midsec_mem")
        .outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        ms.addData(
          AsOfEv(1L, new Timestamp(t0 + 50_000), "click", 1L),
          AsOfEv(1L, new Timestamp(t0 + 70_200), "purchase", 10L))
        q.processAllAvailable() // watermark 70_200: sec 70 still open
        ms.addData(AsOfEv(1L, new Timestamp(t0 + 70_900), "click", 2L))
        q.processAllAvailable()
        ms.addData(AsOfEv(2L, new Timestamp(t0 + 600_000), "view", 90L))
        q.processAllAvailable()
        ms.addData(AsOfEv(2L, new Timestamp(t0 + 601_000), "view", 91L))
        q.processAllAvailable()
        val rows = spark.table("asof_midsec_mem").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(rows === Set((1L, 10L, 2L, 0L)),
          s"purchase must match the same-second click, got $rows")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming as-of continuity TTL: expiry un-matches only beyond-TTL purchases") {
    // the TTL is EVENT-time (merge_asof tolerance shape — Spark's native
    // TTLConfig is processing-time and rejected in TimeMode.EventTime, and
    // a wall-clock expiry would be replay-nondeterministic): with a 100 s
    // tolerance the gap-70 purchase matches, the gap-150 one does not, and
    // once the watermark outlives the click by the TTL the continuity
    // value itself is cleared from the store (bounded state under churn,
    // proven through the state data source)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_ttl").toString
    def lastClickRows(): Long =
      spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "lastClick")
        .load().count()
    try {
      import StreamingWindows.AsOfEv
      val ms = MemoryStream[AsOfEv](66, spark, None)
      val q = StreamingWindows.asofTws(ms.toDS(), watermark = "0 seconds",
          continuityTtl = Some(java.time.Duration.ofSeconds(100)))
        .writeStream.format("memory").queryName("asof_ttl_mem")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        def ev(uid: Long, offSec: Long, typ: String, id: Long) =
          AsOfEv(uid, new Timestamp(t0 + offSec * 1000), typ, id)
        def flushVia(offSec: Long, id: Long): Unit = {
          // two view batches push the watermark past the buffered events
          ms.addData(ev(9L, offSec, "view", id)); q.processAllAvailable()
          ms.addData(ev(9L, offSec + 1, "view", id + 1)); q.processAllAvailable()
        }
        // click@50 finalizes first; purchase@120 flushes in a LATER
        // micro-batch (horizon 140) and still matches through the
        // continuity value — gap 70 <= TTL 100
        ms.addData(ev(1L, 50, "click", 1L), ev(1L, 120, "purchase", 10L))
        q.processAllAvailable()
        flushVia(140, 900L)
        val got1 = spark.table("asof_ttl_mem").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got1 === Set((10L, 1L, 70L)),
          s"within-TTL purchase must match cross-flush, got $got1")
        assert(lastClickRows() === 1L,
          "continuity value still live while the watermark is within TTL")
        // purchase@200: gap 150 > TTL → no hit; and once the watermark
        // outlives the click by the TTL the value is cleared (the cleanup
        // timer armed at click.sec + TTL fires even with nothing buffered)
        ms.addData(ev(1L, 200, "purchase", 11L))
        q.processAllAvailable()
        flushVia(210, 902L)
        val got2 = spark.table("asof_ttl_mem").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got2 === got1,
          s"beyond-TTL purchase must not match, got $got2")
        assert(lastClickRows() === 0L,
          "expired continuity value must be cleared from the store")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming nearest as-of recovers exactly-once from a mid-stream kill") {
    // VERDICT r8 item 4: the three-store NearestAsOfProcessor (ordering
    // buffer, undecided purchases, sliding click window) lacked a restart
    // proof. The kill lands at a DELIBERATELY racy point — data enqueued,
    // processAllAvailable NOT called — so the cut batch may process on
    // either side of the restart; and the in-flight purchase's decision
    // point (watermark past s + tol) only arrives AFTER the restart, so a
    // correct answer REQUIRES the buffered purchase, its backward click,
    // and the undecided-store contents to survive the checkpoint.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingWindows.AsOfEv
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def ev(uid: Long, s: Long, t: String, id: Long) =
        AsOfEv(uid, new Timestamp(t0 + s * 1000), t, id)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_asofn_kill").toString
      val ms = MemoryStream[AsOfEv](305, spark, None)
      val sink = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      def start() = StreamingWindows.asofNearestTws(ms.toDS(),
          tolerance = java.time.Duration.ofSeconds(5), watermark = "10 seconds")
        .writeStream.option("checkpointLocation", ckpt).outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          sink.synchronized { sink ++= rows }
          ()
        }.start()
      val q1 = start()
      try {
        // purchase 199 decided backward (click 99, gap 1); purchase 200
        // still OPEN at the kill: its back candidate is click 100 (gap 2)
        // but a nearer forward click arrives in the cut batch
        ms.addData(ev(1, 1, "click", 99), ev(1, 2, "purchase", 199),
          ev(1, 10, "click", 100), ev(1, 12, "purchase", 200))
        q1.processAllAvailable()
        // the racy enqueue: forward click @13 (fwd gap 1 beats back gap 2)
        // and a beyond-tolerance purchase @30 — then kill without waiting
        ms.addData(ev(1, 13, "click", 101), ev(1, 30, "purchase", 201))
      } finally q1.stop()
      val q2 = start()
      try {
        // advance the watermark well past every decision point
        ms.addData(ev(2, 600, "view", 90)); q2.processAllAvailable()
        ms.addData(ev(2, 601, "view", 91)); q2.processAllAvailable()
        ms.addData(ev(2, 602, "view", 92)); q2.processAllAvailable()
      } finally q2.stop()
      // sink delivery is at-least-once under foreachBatch replay; STATE is
      // exactly-once, so replays regenerate identical rows — compact to a set
      val got = sink.synchronized(sink.toSet)
      assert(got == Set((1L, 199L, 99L, 1L), (1L, 200L, 101L, -1L)),
        s"state must continue exactly-once across the kill: $got")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming nearest as-of state is bounded: clicks evict past the 2-tolerance window") {
    // state-data-source audit of the nearest processor's three stores:
    // buffer drains at flush, decided purchases leave pend, and the click
    // window holds only the trailing 2*tol seconds — churned users go to
    // zero rows once the cleanup timer fires
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_asofn_state").toString
    def stateRows(varName: String): Long =
      spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", varName)
        .load().count()
    try {
      import StreamingWindows.AsOfEv
      val ms = MemoryStream[AsOfEv](220, spark, None)
      val q = StreamingWindows.asofNearestTws(ms.toDS(),
          tolerance = java.time.Duration.ofSeconds(5), watermark = "30 seconds")
        .writeStream.format("memory").queryName("asofn_bound_mem")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        def ev(uid: Long, offSec: Long, typ: String, id: Long) =
          AsOfEv(uid, new Timestamp(t0 + offSec * 1000), typ, id)
        ms.addData((1 to 20).map(i =>
          ev(1, 50 + i, if (i % 2 == 0) "click" else "purchase", i.toLong)): _*)
        q.processAllAvailable()
        assert(stateRows("buf") === 20L,
          "every in-flight event holds exactly one buffered list element")
        // push the watermark far past every decision point and the click
        // window (cleanup timer needs one extra advance to fire)
        ms.addData(ev(2, 600, "view", 90)); q.processAllAvailable()
        ms.addData(ev(2, 601, "view", 91)); q.processAllAvailable()
        ms.addData(ev(2, 602, "view", 92)); q.processAllAvailable()
        assert(stateRows("buf") === 0L, "the flush must evict the entire buffer")
        assert(stateRows("pend") === 0L, "every decidable purchase must leave pend")
        assert(stateRows("clicks") === 0L,
          "the click window must fully evict once the watermark outruns 2*tol")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("sub-second as-of durations are rejected, not silently coarsened to 1s") {
    // the processors match at second granularity; a Duration.ofMillis(500)
    // used to clamp to 1 s via math.max — diverging from the caller's bound
    // with no signal (ADVICE r8)
    intercept[IllegalArgumentException](
      new StreamingWindows.NearestAsOfProcessor(java.time.Duration.ofMillis(500)))
    intercept[IllegalArgumentException](
      new StreamingWindows.AsOfProcessor(Some(java.time.Duration.ofMillis(500))))
    // zero/negative still rejected
    intercept[IllegalArgumentException](
      new StreamingWindows.NearestAsOfProcessor(java.time.Duration.ZERO))
  }

  test("streaming as-of state is bounded: the buffer drains to O(1) per user at flush") {
    // audited through the state DATA SOURCE (offline state inspection —
    // the ops tool for "why is my state store huge"): per-element list
    // rows before the flush, zero after, one latest-click value surviving
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_state").toString
    def stateRows(varName: String): Long =
      spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", varName)
        .load().count()
    try {
      import StreamingWindows.AsOfEv
      val ms = MemoryStream[AsOfEv](62, spark, None)
      val q = StreamingWindows.asofTws(ms.toDS(), watermark = "30 seconds")
        .writeStream.format("memory").queryName("asof_bound_mem")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        def ev(uid: Long, offSec: Long, typ: String, id: Long) =
          AsOfEv(uid, new Timestamp(t0 + offSec * 1000), typ, id)
        ms.addData((1 to 20).map(i =>
          ev(1, 50 + i, if (i % 2 == 0) "click" else "purchase", i.toLong)): _*)
        q.processAllAvailable()
        assert(stateRows("buf") === 20L,
          "every in-flight event holds exactly one buffered list element")
        // watermark sails past every buffered event (one-batch lag; the
        // advancing events are views, which the processor never buffers)
        ms.addData(ev(2, 600, "view", 90))
        q.processAllAvailable()
        ms.addData(ev(2, 601, "view", 91))
        q.processAllAvailable()
        assert(stateRows("buf") === 0L,
          "the flush must evict the entire buffer")
        assert(stateRows("lastClick") === 1L,
          "only the O(1) latest-click value survives per user")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming as-of: out-of-order buffering, same-second tie, cross-flush click state") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import StreamingWindows.AsOfEv
      val ms = MemoryStream[AsOfEv](61, spark, None)
      // 30 s delay so batch 1's flush timer (armed at +100 s) provably
      // cannot fire from batch 1 alone (watermark stays <= +70 s) — the
      // no-premature-emission assert is then independent of Spark's
      // no-data-batch scheduling
      val hits = StreamingWindows.asofTws(ms.toDS(), watermark = "30 seconds")
      val q = hits.writeStream.format("memory").queryName("asof_tws_mem")
        .outputMode("append").start()
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
        def ev(uid: Long, offSec: Long, typ: String, id: Long) =
          AsOfEv(uid, new Timestamp(t0 + offSec * 1000), typ, id)
        // batch 1, deliberately OUT of event-time order: the purchase at
        // +70 arrives before its matching click at +50 — an on-arrival
        // matcher would mis-match; the buffer-until-watermark design must
        // not. Same-second pair at +100: click id2 vs purchase id10 →
        // non-strict match, gap 0. A view event must be ignored.
        ms.addData(
          ev(1, 100, "purchase", 10), ev(1, 70, "purchase", 11),
          ev(1, 50, "click", 1), ev(1, 100, "click", 2),
          ev(1, 60, "view", 99))
        q.processAllAvailable()
        assert(spark.table("asof_tws_mem").count() === 0,
          "nothing may emit before the watermark passes the buffered events")
        // two watermark-advancing batches (watermark applies one batch
        // late; >= +570 s after both): user-1's timer fires, flushing all
        // four buffered events in event-time order
        ms.addData(ev(2, 600, "click", 20))
        q.processAllAvailable()
        ms.addData(ev(2, 601, "click", 21))
        q.processAllAvailable()
        val flush1 = spark.table("asof_tws_mem").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(flush1 === Set((1L, 11L, 1L, 20L), (1L, 10L, 2L, 0L)),
          s"got $flush1")
        // a purchase long after the flush must still see the persisted
        // latest click (id2 @ +100) — as-of continuity across flushes
        ms.addData(ev(1, 650, "purchase", 12))
        q.processAllAvailable()
        ms.addData(ev(2, 1200, "click", 22))
        q.processAllAvailable()
        ms.addData(ev(2, 1201, "click", 23))
        q.processAllAvailable()
        val all = spark.table("asof_tws_mem").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(all === flush1 + ((1L, 12L, 2L, 550L)), s"got $all")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
