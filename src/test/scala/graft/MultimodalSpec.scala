package graft

import graft.functions.MediaCodecs
import graft.operators.Multimodal

class MultimodalSpec extends GraftSpec {

  // ---------------------------------------------------------------- codecs

  test("BMP/WAV/PPM roundtrip: decoded samples equal the source bytes") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 3, 4, 5, 63, 64, 257)) {
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      val want = data.map(_ & 0xff)
      for ((bytes, fmt) <- Seq((MediaCodecs.toBmp(data), "bmp"),
                               (MediaCodecs.toWav(data), "wav"),
                               (MediaCodecs.toPpm(data), "ppm"))) {
        val d = MediaCodecs.decode(bytes)
        assert(d.format == fmt)
        assert(d.samples.toSeq == want.toSeq, s"$fmt n=$n samples differ")
        assert(d.width * d.height == n || (fmt == "wav" && d.width == n))
      }
    }
  }

  test("BMP parser: hand-built golden bytes, bottom-up rows, stride padding") {
    // 2x2 24bpp BMP, built by hand: image rows (top-down) are
    //   [10, 20]
    //   [30, 40]
    // stored BOTTOM-UP with stride pad4(6)=8 (2 pad bytes per row)
    import java.nio.{ByteBuffer, ByteOrder}
    val stride = 8
    val b = ByteBuffer.allocate(54 + 2 * stride).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + 2 * stride).putInt(0).putInt(54)
    b.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(2 * stride).putInt(0).putInt(0).putInt(0).putInt(0)
    def px(v: Int) = { b.put(v.toByte).put(v.toByte).put(v.toByte) }
    px(30); px(40); b.put(0.toByte).put(0.toByte)  // file row 0 = BOTTOM image row
    px(10); px(20); b.put(0.toByte).put(0.toByte)  // file row 1 = TOP image row
    val d = MediaCodecs.parseBmp(b.array())
    assert((d.width, d.height) == (2, 2))
    assert(d.samples.toSeq == Seq(10, 20, 30, 40), "rows must come out top-down")

    // same image stored TOP-DOWN (negative height)
    val t = ByteBuffer.allocate(54 + 2 * stride).order(ByteOrder.LITTLE_ENDIAN)
    t.put('B'.toByte).put('M'.toByte).putInt(54 + 2 * stride).putInt(0).putInt(54)
    t.putInt(40).putInt(2).putInt(-2).putShort(1).putShort(24)
      .putInt(0).putInt(2 * stride).putInt(0).putInt(0).putInt(0).putInt(0)
    def px2(v: Int) = { t.put(v.toByte).put(v.toByte).put(v.toByte) }
    px2(10); px2(20); t.put(0.toByte).put(0.toByte)
    px2(30); px2(40); t.put(0.toByte).put(0.toByte)
    assert(MediaCodecs.parseBmp(t.array()).samples.toSeq == Seq(10, 20, 30, 40))

    // distinct RGB channels → integer mean
    val c = MediaCodecs.toBmp(Array[Byte](1))
    c(54) = 10; c(55) = 20; c(56) = 31  // b,g,r → (31+20+10)/3 = 20
    assert(MediaCodecs.parseBmp(c).samples.toSeq == Seq(20))
  }

  test("WAV parser: skips unknown chunks, honors odd-size word padding") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.US_ASCII
    // RIFF with an unknown 3-byte 'junk' chunk (padded to 4) BEFORE fmt/data
    val samples = Seq(-5, 0, 300)
    val n = samples.length
    val junkPayload = 3
    val size = 4 + (8 + junkPayload + 1) + (8 + 16) + (8 + 2 * n)
    val b = ByteBuffer.allocate(8 + size).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(US_ASCII)).putInt(size).put("WAVE".getBytes(US_ASCII))
    b.put("junk".getBytes(US_ASCII)).putInt(junkPayload)
      .put(Array[Byte](1, 2, 3)).put(0.toByte)  // odd size → 1 pad byte
    b.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes(US_ASCII)).putInt(2 * n)
    samples.foreach(v => b.putShort(v.toShort))
    val d = MediaCodecs.parseWav(b.array())
    assert(d.format == "wav" && d.width == n)
    assert(d.samples.toSeq == samples, "signed 16-bit samples must decode exactly")
  }

  test("PPM parser: whitespace variants and # comments in the header") {
    import java.nio.charset.StandardCharsets.US_ASCII
    val header = "P6 # comment right after magic\n 2\t1 # dims done\n255\n".getBytes(US_ASCII)
    val body = Array[Byte](5, 5, 5, 9, 9, 9)
    val d = MediaCodecs.parsePpm(header ++ body)
    assert((d.width, d.height) == (2, 1))
    assert(d.samples.toSeq == Seq(5, 9))
  }

  test("decoders reject malformed input loudly") {
    intercept[IllegalArgumentException](MediaCodecs.decode(Array[Byte]('X', 'Y', 1, 2)))
    // truncated BMP: header promises more pixel data than the buffer holds
    val bmp = MediaCodecs.toBmp(Array[Byte](1, 2, 3, 4))
    intercept[IllegalArgumentException](MediaCodecs.parseBmp(bmp.dropRight(3)))
    // WAV data chunk overrunning the buffer
    val wav = MediaCodecs.toWav(Array[Byte](1, 2, 3, 4))
    intercept[IllegalArgumentException](MediaCodecs.parseWav(wav.dropRight(2)))
    // PPM missing sample bytes
    val ppm = MediaCodecs.toPpm(Array[Byte](1, 2))
    intercept[IllegalArgumentException](MediaCodecs.parsePpm(ppm.dropRight(1)))
    // non-PCM WAV must be refused, not misparsed
    val bad = MediaCodecs.toWav(Array[Byte](1))
    bad(20) = 3  // audioFormat: 1 (PCM) → 3 (IEEE float)
    intercept[IllegalArgumentException](MediaCodecs.parseWav(bad))
  }

  test("codec bounds are overflow- and offset-hardened") {
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV chunk declaring a size near Int.MaxValue: Int arithmetic would
    // wrap the bound check negative and attempt a multi-GB decode — must be
    // a clean reject, not an OOM or raw IndexOutOfBounds
    val wav = MediaCodecs.toWav(Array[Byte](1, 2, 3))
    ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 4)  // data chunk size field
    val e1 = intercept[IllegalArgumentException](MediaCodecs.parseWav(wav))
    assert(e1.getMessage.contains("overruns"), e1.getMessage)

    // BMP dataOffset: negative → would index before the buffer; inside the
    // header region → would silently decode header bytes as pixels
    for (off <- Seq(-8, 0, 20, 53)) {
      val bmp = MediaCodecs.toBmp(Array[Byte](1, 2, 3, 4))
      ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN).putInt(10, off)
      val e = intercept[IllegalArgumentException](MediaCodecs.parseBmp(bmp))
      assert(e.getMessage.contains("offset"), s"dataOffset=$off: ${e.getMessage}")
    }
  }

  test("RGB containers: channel ORDER is pinned (BMP is B,G,R; PPM is R,G,B)") {
    val data = Array[Byte](0, 1, 100.toByte, 255.toByte, 37)
    val want = data.map(_ & 0xff).map(MediaCodecs.rgbOf)
    val (wr, wg, wb) = (want.map(_._1.toLong).sum, want.map(_._2.toLong).sum,
      want.map(_._3.toLong).sum)
    for (bytes <- Seq(MediaCodecs.toBmpRgb(data), MediaCodecs.toPpmRgb(data))) {
      val d = MediaCodecs.decodeRgb(bytes)
      assert(d.nPx == data.length)
      assert((d.sumR, d.sumG, d.sumB) == ((wr, wg, wb)),
        s"${d.format}: channel sums swizzled")
    }
    // hand-built 1-pixel proofs with FULLY distinct channels: a swap of any
    // two offsets in either parser changes the triple
    val bmp = MediaCodecs.toBmp(Array[Byte](1))
    bmp(54) = 3; bmp(55) = 2; bmp(56) = 1 // file order B=3, G=2, R=1
    val db = MediaCodecs.decodeRgb(bmp)
    assert((db.sumR, db.sumG, db.sumB) == ((1L, 2L, 3L)), "BMP must read B,G,R")
    val ppm = MediaCodecs.toPpm(Array[Byte](1))
    val base = ppm.length - 3
    ppm(base) = 1; ppm(base + 1) = 2; ppm(base + 2) = 3 // file order R=1, G=2, B=3
    val dp = MediaCodecs.decodeRgb(ppm)
    assert((dp.sumR, dp.sumG, dp.sumB) == ((1L, 2L, 3L)), "PPM must read R,G,B")
    // gray parse is unchanged by the walk refactor: distinct channels → mean
    assert(MediaCodecs.parseBmp(bmp).samples.toSeq == Seq(2))
    assert(MediaCodecs.parsePpm(ppm).samples.toSeq == Seq(2))
  }

  // ------------------------------------------------- real-world sniffing

  test("sniff: PNG/JPEG/MP3 headers parse back the planted metadata") {
    val data = "hello media world".getBytes("UTF-8")
    val png = MediaCodecs.sniff(MediaCodecs.toPng(data, 640, 480))
    assert(png == MediaCodecs.SniffedMeta("png", 640, 480, 0, 0, 0L, data.length + 57L))
    val jpg = MediaCodecs.sniff(MediaCodecs.toJpeg(data, 123, 45))
    assert(jpg == MediaCodecs.SniffedMeta("jpeg", 123, 45, 0, 0, 0L, data.length + 55L))
    // bitrate idx 9 = 128 kbps, sr idx 1 = 48000; 21 bytes -> 1 ms
    val mp3 = MediaCodecs.sniff(MediaCodecs.toMp3(data, 9, 1))
    assert(mp3 == MediaCodecs.SniffedMeta("mp3", 0, 0, 48000, 128,
      (data.length + 4L) * 8 / 128, data.length + 4L))
  }

  test("sniff: GIF dims are little-endian; FLAC sample rate survives the 20-bit packing") {
    val data = "payload".getBytes("UTF-8")
    // 640 = 0x0280: an endianness slip reads 0x8002 = 32770 — unmissable
    val gif = MediaCodecs.sniff(MediaCodecs.toGif(data, 640, 480))
    assert(gif == MediaCodecs.SniffedMeta("gif", 640, 480, 0, 0, 0L, data.length + 14L))
    // 44100 = 0xAC44 straddles all three packed bytes; 90000 samples
    val flac = MediaCodecs.sniff(MediaCodecs.toFlac(data, 44100, 90000L))
    assert(flac == MediaCodecs.SniffedMeta("flac", 0, 0, 44100, 0,
      90000L * 1000 / 44100, data.length + 42L))
    // a >32-bit total-sample count exercises the 36-bit split across the
    // nibble byte and the following u32
    val big = MediaCodecs.sniff(MediaCodecs.toFlac(data, 48000, (1L << 33) + 5))
    assert(big.sampleRate == 48000 && big.durationMs == ((1L << 33) + 5) * 1000 / 48000)
  }

  test("sniff: truncated GIF/FLAC throw; FLAC without leading STREAMINFO throws") {
    val gif = MediaCodecs.toGif("abc".getBytes("UTF-8"), 2, 2)
    intercept[IllegalArgumentException](MediaCodecs.sniff(gif.take(10)))
    val flac = MediaCodecs.toFlac("abc".getBytes("UTF-8"), 44100, 10L)
    intercept[IllegalArgumentException](MediaCodecs.sniff(flac.take(30)))
    val wrongFirst = flac.clone(); wrongFirst(4) = 0x84.toByte // type 4 first
    intercept[IllegalArgumentException](MediaCodecs.sniff(wrongFirst))
  }

  test("sniff: JPEG walk skips foreign APP segments and reads SOF height-first") {
    // splice an extra APP1 (Exif-style) segment between SOI and the rest;
    // the marker walk must skip it by declared length and still find SOF0
    val base = MediaCodecs.toJpeg("x".getBytes("UTF-8"), 31, 97)
    val app1 = Array(0xFF, 0xE1, 0x00, 0x06, 0x45, 0x78, 0x69, 0x66).map(_.toByte)
    val spliced = base.take(2) ++ app1 ++ base.drop(2)
    val m = MediaCodecs.sniff(spliced)
    assert(m.format == "jpeg" && m.width == 31 && m.height == 97,
      s"got $m — height/width swapped or walk broken")
  }

  test("sniff: unknown signatures quarantine as a decision, malformed known formats throw") {
    // utf-8 text can never start with a known signature byte
    assert(MediaCodecs.sniff("plain text".getBytes("UTF-8")).format == "unknown")
    assert(MediaCodecs.sniff(Array[Byte]()).format == "unknown")
    // truncated PNG: signature present, IHDR missing
    val png = MediaCodecs.toPng("abc".getBytes("UTF-8"), 2, 2)
    intercept[IllegalArgumentException](MediaCodecs.sniff(png.take(20)))
    // JPEG with SOS before any SOF
    val noSof = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02).map(_.toByte)
    intercept[IllegalArgumentException](MediaCodecs.sniff(noSof))
    // MP3 sync with reserved bitrate index 15
    val badMp3 = Array(0xFF, 0xFB, 0xF0, 0x00).map(_.toByte)
    intercept[IllegalArgumentException](MediaCodecs.sniff(badMp3))
  }

  test("quarantine: corrupted subset rejected, everything else decodes") {
    val out = Multimodal.quarantine(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0); val status = r.getString(2)
      val want = if (id % 17 == 0) "quarantined" else "ok"
      assert(status == want, s"doc $id: $status, want $want")
    }
    assert(out.exists(_.getString(2) == "quarantined"), "corrupt rows must exist at sf0.001")
  }

  // ------------------------------------------------------------- pipeline

  test("mediaFeatures decodes real containers back to exact text-byte stats") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val out = Multimodal.mediaFeatures(spark, sf0001).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val bytes = docs(id).map(_ & 0xff)
      val expectMime = (id % 3) match {
        case 0 => "image/bmp"; case 1 => "audio/wav"; case _ => "image/ppm"
      }
      assert(r.getString(1) == expectMime)
      assert(r.getLong(2) == bytes.length, s"doc $id n_samples")
      assert(r.getLong(3) == bytes.map(_.toLong).sum, s"doc $id sample_sum")
      assert(r.getInt(5) == bytes.max, s"doc $id sample_max")
    }
  }

  test("frame sampling: slice count matches ceil(len/64) and frames reassemble") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf0001)
      .filter("meta.mime = 'video/mp4'")
      .select($"doc_id",
        org.apache.spark.sql.functions.length($"payload").cast("long").as("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val frames = Multimodal.frameSample(spark, sf0001)
      .groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(frames.keySet == media.keySet)
    frames.foreach { case (id, n) =>
      assert(n == (media(id) + 63) / 64, s"doc $id: $n frames for ${media(id)} bytes")
    }
  }

  test("aHash: identical images collide, a 1-byte edit stays within hamming 3") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 != 1).take(6)
    // plant: an exact payload copy and a 1-byte edit of base(0); ids chosen
    // to stay in the image classes (% 3 != 1)
    val (srcId, srcText) = base(0)
    val edited = srcText.updated(srcText.length / 2, 'z')
    val planted = base ++ Seq((90000L, srcText), (90002L, edited))
    val docs = planted.toSeq.toDF("doc_id", "text")
    // CORPUS-FAITHFUL default: real planted pairs found, no fabricated ids
    val pairs = Multimodal.imageNearDupOf(docs, sentinels = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == srcId && p._2 == 90000L && p._3 == 0),
      s"exact payload copy not found at hamming 0: ${pairs.toSeq}")
    assert(pairs.exists(p => (p._1, p._2) == (srcId, 90002L) ||
                             (p._1, p._2) == (90000L, 90002L)),
      s"1-byte edit must land within hamming 3 of its source: ${pairs.toSeq}")
    assert(pairs.forall(p => p._1 < Multimodal.MirrorOffset &&
                             p._2 < Multimodal.MirrorOffset),
      s"corpus-faithful output must not contain sentinel ids: ${pairs.toSeq}")
    // losslessness at spec scale (every bucket under the star cap):
    // banded candidates + verify == brute-force hamming <= 3 over all
    // pairs, checked for BOTH media universes (faithful + sentinel gate)
    def brute(media: org.apache.spark.sql.DataFrame) = {
      val hs = Multimodal.hashesOfMedia(media).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      (for {
        (a, la, ha) <- hs; (b, lb, hb) <- hs if a < b
        d = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
        if d <= 3
      } yield (a, b, d)).toSet
    }
    val bruteFaithful = brute(Multimodal.eligibleMedia(docs))
    assert(pairs.toSet == bruteFaithful,
      s"banded join diverges from brute force: ${pairs.toSet.diff(bruteFaithful)} / ${bruteFaithful.diff(pairs.toSet)}")
    val gatePairs = Multimodal.imageNearDupOf(docs, sentinels = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bruteGate = brute(Multimodal.mirroredMedia(docs))
    assert(gatePairs == bruteGate,
      s"gate-variant banded join diverges: ${gatePairs.diff(bruteGate)} / ${bruteGate.diff(gatePairs)}")
    // the gate fixture really plants its twin: 90000 % 10 == 0
    assert(gatePairs.exists(_._2 == 90000L + Multimodal.MirrorOffset),
      s"sentinel twin pair missing from gate variant: $gatePairs")
  }

  test("content dedup sees through container formats; payload digest cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ids 90000 (% 3 = 0 → BMP) and 90002 (% 3 = 2 → PPM) wrap the SAME
    // pixels in different containers; 90003 (% 3 = 0) is a control
    val docs = Seq(
      (90000L, "same pixels here"), (90002L, "same pixels here"),
      (90003L, "entirely different content")).toDF("doc_id", "text")
    // CORPUS-FAITHFUL default: the natural cross-container pair
    // {90000 bmp, 90002 ppm} is found with no fabricated members
    val groups = Multimodal.contentDedupOf(docs, sentinels = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(groups.toSeq == Seq((90000L, 2L, 2L, 1)),
      s"expected one cross-format group kept at 90000: ${groups.toSeq}")
    // gate variant: 90000 % 10 == 0, so mirroredMedia adds its PPM twin at
    // 1000090000 — the group becomes {90000 bmp, 90002 ppm, twin ppm}
    val gateGroups = Multimodal.contentDedupOf(docs, sentinels = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(gateGroups.toSeq == Seq((90000L, 3L, 2L, 1)),
      s"gate variant must include the sentinel twin: ${gateGroups.toSeq}")
    // the structural claim: the CONTAINER digests of the pair differ, so
    // payload-keyed exact dedup misses exactly what content dedup finds
    val b = MediaCodecs.toBmp("same pixels here".getBytes("UTF-8"))
    val p = MediaCodecs.toPpm("same pixels here".getBytes("UTF-8"))
    assert(!java.util.Arrays.equals(b, p), "containers must differ on disk")
  }
}
