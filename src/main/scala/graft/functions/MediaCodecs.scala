package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real pure-JVM media codecs for the multimodal pipeline (SURVEY.md §2c).
  *
  * The container ships no image/audio libraries, so the formats here are
  * ones a header+samples parser can handle with zero codec dependencies:
  *
  *   - BMP  (Windows bitmap, uncompressed 24bpp, BITMAPINFOHEADER) —
  *     exercises binary little-endian headers, 4-byte row stride padding,
  *     and bottom-up vs top-down row order (negative height);
  *   - WAV  (RIFF PCM, 16-bit mono) — exercises chunked container walking
  *     (unknown chunks must be skipped, odd-sized chunks are word-padded);
  *   - PPM  (P6 portable pixmap) — exercises ASCII headers with arbitrary
  *     whitespace and `#` comments followed by raw binary samples.
  *
  * These are REAL decoders: they dispatch on magic bytes (not trusted
  * metadata), validate declared sizes against the buffer, and reject
  * malformed input with a message — the same contract a libjpeg/ffmpeg
  * swap-in would satisfy. Encoders produce spec-conformant files so the
  * decode path is proven by roundtrip AND by hand-built golden bytes in
  * MultimodalSpec; the driver oracle closes the loop end-to-end (features
  * of decode(encode(text)) hash-match DuckDB's direct byte statistics).
  */
object MediaCodecs {

  /** One decoded media object: `samples` is the per-pixel gray level
    * (images, integer mean of R,G,B) or the per-frame amplitude (audio).
    * `width`/`height` are pixels for images and (nSamples, 1) for audio. */
  final case class Decoded(format: String, width: Int, height: Int, samples: Array[Int])

  // ===================================================================== BMP

  private def pad4(n: Int): Int = (n + 3) & ~3

  /** Encode bytes as a single-row 24bpp BMP (one gray pixel per byte).
    * Single-row keeps the byte↔pixel mapping exact (no tail padding pixels)
    * while still exercising the row-stride padding rule (3·w → mult of 4). */
  def toBmp(data: Array[Byte]): Array[Byte] = {
    require(data.nonEmpty, "empty payload")
    val w = data.length
    val stride = pad4(3 * w)
    val fileSize = 54 + stride
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(1).putShort(1).putShort(24)
      .putInt(0).putInt(stride).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < w) { val v = data(i); b.put(v).put(v).put(v); i += 1 }
    b.array()
  }

  /** Shared BMP header walk: validates everything, then hands each pixel's
    * (r, g, b) to `f` in row-major TOP-DOWN order, regardless of whether
    * the file stores rows bottom-up (positive height) or top-down
    * (negative). Returns (width, height). Both the gray decode and the
    * per-channel decode build on this so the validation lives once. */
  private def walkBmp24(bytes: Array[Byte])(f: (Int, Int, Int) => Unit): (Int, Int) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val hdrSize = b.getInt(14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    // dataOffset is attacker-controlled: a negative value would index before
    // the buffer, and a value inside the header region would silently decode
    // header bytes as pixels. Long arithmetic so a huge hdrSize can't wrap.
    require(dataOffset >= 14L + hdrSize && dataOffset <= bytes.length,
      s"BMP pixel data offset $dataOffset outside [${14L + hdrSize}, ${bytes.length}]")
    val w = b.getInt(18)
    val hRaw = b.getInt(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = b.getShort(26)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    require(planes == 1, s"BMP planes=$planes")
    require(bpp == 24, s"only 24bpp BMP supported, got $bpp")
    require(compression == 0, s"only uncompressed BMP supported, got $compression")
    require(w > 0 && h > 0, s"bad BMP dims ${w}x$hRaw")
    val stride = pad4(3 * w)
    require(bytes.length >= dataOffset + stride.toLong * h,
      s"BMP truncated: need ${dataOffset + stride.toLong * h}, have ${bytes.length}")
    var row = 0
    while (row < h) {
      // file row index for image row `row` (top-down output order)
      val fileRow = if (topDown) row else h - 1 - row
      val base = dataOffset + fileRow * stride
      var x = 0
      while (x < w) {
        val o = base + 3 * x
        // 24bpp BMP stores pixels little-endian-ish as B, G, R
        f(bytes(o + 2) & 0xff, bytes(o + 1) & 0xff, bytes(o) & 0xff)
        x += 1
      }
      row += 1
    }
    (w, h)
  }

  /** Parse an uncompressed 24bpp BMP (BITMAPINFOHEADER). Handles bottom-up
    * (positive height — the common case: last row in the file is the top
    * image row) and top-down (negative height) storage, and per-row 4-byte
    * stride padding. Samples are row-major top-down gray = (r+g+b)/3. */
  def parseBmp(bytes: Array[Byte]): Decoded = {
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    val (w, h) = walkBmp24(bytes) { (r, g, b) => out += (r + g + b) / 3 }
    Decoded("bmp", w, h, out.result())
  }

  // ===================================================================== WAV

  /** Encode bytes as 16-bit PCM mono WAV at 8 kHz, one sample per byte
    * (amplitude = unsigned byte value, so stats match the source bytes). */
  def toWav(data: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    require(data.nonEmpty, "empty payload")
    val n = data.length
    val b = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + 2 * n)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    b.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(2 * n)
    var i = 0
    while (i < n) { b.putShort((data(i) & 0xff).toShort); i += 1 }
    b.array()
  }

  /** Parse a RIFF/WAVE container: walk chunks (skipping unknown ones, with
    * RIFF's odd-size word padding), require PCM 16-bit, return the signed
    * Int16 samples of the first channel. */
  def parseWav(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, StandardCharsets.US_ASCII) == "WAVE", "not a WAV")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = -1; var bits = -1; var sampleRate = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val id = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
      val size = b.getInt(pos + 4)
      // Long arithmetic: a declared size near Int.MaxValue would wrap the
      // Int sum negative and sail past this check into a huge allocation.
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"WAV chunk '$id' overruns buffer (size=$size at $pos)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmt = b.getShort(pos + 8)
          require(fmt == 1, s"only PCM WAV supported, got format $fmt")
          channels = b.getShort(pos + 10)
          sampleRate = b.getInt(pos + 12)
          bits = b.getShort(pos + 22)
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => // unknown chunk (LIST, fact, …): skip
      }
      pos += 8 + size + (size & 1) // RIFF pads odd-sized chunks to word boundary
    }
    require(channels > 0 && dataOff >= 0, "WAV missing fmt or data chunk")
    require(bits == 16, s"only 16-bit WAV supported, got $bits")
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    val out = new Array[Int](nFrames)
    var i = 0
    while (i < nFrames) { out(i) = b.getShort(dataOff + i * frameBytes).toInt; i += 1 }
    Decoded("wav", nFrames, 1, out)
  }

  // ===================================================================== PPM

  /** Encode bytes as a single-row binary PPM (P6), one gray pixel per byte. */
  def toPpm(data: Array[Byte]): Array[Byte] = {
    require(data.nonEmpty, "empty payload")
    val header = s"P6\n${data.length} 1\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * data.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < data.length) {
      val v = data(i); val o = header.length + 3 * i
      out(o) = v; out(o + 1) = v; out(o + 2) = v
      i += 1
    }
    out
  }

  /** Shared P6 header walk: ASCII header tokens separated by arbitrary
    * whitespace, `#` comments running to end-of-line, maxval ≤ 255, then a
    * SINGLE whitespace byte and raw RGB samples, handed to `f` as
    * (r, g, b) per pixel. Returns (width, height). */
  private def walkPpm(bytes: Array[Byte])(f: (Int, Int, Int) => Unit): (Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def nextToken(): Int = {
      // skip whitespace and comments
      var done = false
      while (!done) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else done = true
      }
      var v = 0
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"PPM: expected integer at byte $pos")
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextToken(); val h = nextToken(); val maxval = nextToken()
    require(w > 0 && h > 0, s"bad PPM dims ${w}x$h")
    require(maxval > 0 && maxval <= 255, s"only 1-byte PPM samples supported (maxval=$maxval)")
    require(pos < bytes.length && isWs(bytes(pos)), "PPM: missing whitespace after maxval")
    pos += 1 // exactly one whitespace byte before binary data, per spec
    require(bytes.length >= pos + 3L * w * h,
      s"PPM truncated: need ${pos + 3L * w * h}, have ${bytes.length}")
    var i = 0
    while (i < w * h) {
      val o = pos + 3 * i
      // P6 stores pixels as R, G, B (opposite of BMP's B, G, R)
      f(bytes(o) & 0xff, bytes(o + 1) & 0xff, bytes(o + 2) & 0xff)
      i += 1
    }
    (w, h)
  }

  /** Parse a binary PPM (P6); samples are gray = (r+g+b)/3. */
  def parsePpm(bytes: Array[Byte]): Decoded = {
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    val (w, h) = walkPpm(bytes) { (r, g, b) => out += (r + g + b) / 3 }
    Decoded("ppm", w, h, out.result())
  }

  // ================================================================ channels

  /** Per-channel sums from a decoded image — the channel-ORDER proof
    * surface: BMP stores B,G,R and PPM stores R,G,B, so any swizzle bug
    * swaps these sums and the cross-engine oracle catches it (the RGB
    * encoders below write three DIFFERENT functions of the source byte per
    * channel, unlike the gray encoders where a swap would be invisible). */
  final case class DecodedRgb(format: String, nPx: Int,
                              sumR: Long, sumG: Long, sumB: Long)

  /** Channel transforms for the RGB containers: r = v, g = 255 − v,
    * b = 7·v mod 256 — three distinct, SQL-expressible functions of the
    * source byte, so per-channel means are independently oracle-checkable
    * and channel order is pinned. */
  @inline def rgbOf(v: Int): (Int, Int, Int) = (v, 255 - v, (7 * v) % 256)

  /** Encode bytes as a single-row 24bpp BMP with per-channel transforms
    * ([[rgbOf]]) — same container rules as [[toBmp]], distinct channels. */
  def toBmpRgb(data: Array[Byte]): Array[Byte] = {
    require(data.nonEmpty, "empty payload")
    val w = data.length
    val stride = pad4(3 * w)
    val fileSize = 54 + stride
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(1).putShort(1).putShort(24)
      .putInt(0).putInt(stride).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < w) {
      val (r, g, bl) = rgbOf(data(i) & 0xff)
      b.put(bl.toByte).put(g.toByte).put(r.toByte) // BMP pixel order: B, G, R
      i += 1
    }
    b.array()
  }

  /** Encode bytes as a single-row P6 PPM with per-channel transforms. */
  def toPpmRgb(data: Array[Byte]): Array[Byte] = {
    require(data.nonEmpty, "empty payload")
    val header = s"P6\n${data.length} 1\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * data.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < data.length) {
      val (r, g, b) = rgbOf(data(i) & 0xff)
      val o = header.length + 3 * i
      out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte // R, G, B
      i += 1
    }
    out
  }

  /** Decode per-channel sums, dispatching on magic bytes (images only —
    * WAV has no channels in this corpus). */
  def decodeRgb(bytes: Array[Byte]): DecodedRgb = {
    require(bytes.length >= 2, s"payload too short to sniff (${bytes.length} bytes)")
    var sr = 0L; var sg = 0L; var sb = 0L; var n = 0
    val acc = (r: Int, g: Int, b: Int) => { sr += r; sg += g; sb += b; n += 1 }
    if (bytes(0) == 'B' && bytes(1) == 'M') {
      walkBmp24(bytes)(acc); DecodedRgb("bmp", n, sr, sg, sb)
    } else if (bytes(0) == 'P' && bytes(1) == '6') {
      walkPpm(bytes)(acc); DecodedRgb("ppm", n, sr, sg, sb)
    } else throw new IllegalArgumentException(
      s"unrecognized image magic: 0x${(bytes(0) & 0xff).toHexString}${(bytes(1) & 0xff).toHexString}")
  }

  // ================================================================ dispatch

  /** Decode by sniffing magic bytes — the payload's actual format decides,
    * never caller-supplied metadata (a corrupt-mime row must fail loudly at
    * the parser, not silently misparse). */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 2, s"payload too short to sniff (${bytes.length} bytes)")
    if (bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
    else if (bytes.length >= 4 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF") parseWav(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '6') parsePpm(bytes)
    else throw new IllegalArgumentException(
      s"unrecognized media magic: 0x${(bytes(0) & 0xff).toHexString}${(bytes(1) & 0xff).toHexString}")
  }

  // ============================== real-world metadata sniffing (no decode)
  // A production multimodal pipeline meets JPEG / PNG / MP3 long before it
  // meets BMP; full pure-JVM decoders for those are out of proportion for
  // this container (libjpeg/ffmpeg territory), but the METADATA a curation
  // job actually filters on — dimensions, sample rate, duration — lives in
  // the first few hundred header bytes and parses with plain byte math.
  // The encoders below emit structurally true headers (real signatures,
  // real chunk/segment/frame-header layouts, PNG CRCs) around an opaque
  // payload; `sniff` reads ONLY headers, never sample data. Swapping in a
  // real library later changes nothing downstream of SniffedMeta.

  /** Header-derived metadata: width/height for images (0 for audio),
    * sampleRate/bitrateKbps/durationMs for audio (0 for images); format
    * "unknown" (all zeros) when no known signature matches — the
    * quarantine route, a DECISION not an exception, because unknown
    * formats are data in an ingest job, not bugs. */
  final case class SniffedMeta(format: String, width: Int, height: Int,
                               sampleRate: Int, bitrateKbps: Int,
                               durationMs: Long, nBytes: Long)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Wrap bytes in a structurally-true PNG: signature, IHDR (8-bit RGB,
    * real CRC), one IDAT carrying `data` verbatim (NOT zlib — the image
    * data is opaque payload here; headers are what sniffing reads), IEND.
    * Total size = 57 + data.length. */
  def toPng(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(57 + data.length).order(ByteOrder.BIG_ENDIAN)
    b.put(PngSig)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    b.putInt(13).put("IHDR".getBytes(StandardCharsets.US_ASCII)).put(ihdr)
      .putInt(crc32("IHDR".getBytes(StandardCharsets.US_ASCII), ihdr))
    b.putInt(data.length).put("IDAT".getBytes(StandardCharsets.US_ASCII)).put(data)
      .putInt(crc32("IDAT".getBytes(StandardCharsets.US_ASCII), data))
    b.putInt(0).put("IEND".getBytes(StandardCharsets.US_ASCII))
      .putInt(crc32("IEND".getBytes(StandardCharsets.US_ASCII)))
    b.array()
  }

  /** Wrap bytes in a structurally-true JPEG: SOI, APP0/JFIF, SOF0
    * (baseline, 3 components, height BEFORE width per spec), minimal SOS,
    * `data` as the opaque entropy stream, EOI.
    * Total size = 55 + data.length. */
  def toJpeg(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(55 + data.length).order(ByteOrder.BIG_ENDIAN)
    b.putShort(0xFFD8.toShort)                                  // SOI
    b.putShort(0xFFE0.toShort).putShort(16.toShort)             // APP0, len 16
      .put("JFIF".getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
      .put(1.toByte).put(1.toByte).put(0.toByte)                // v1.1, units 0
      .putShort(1.toShort).putShort(1.toShort)                  // density 1×1
      .put(0.toByte).put(0.toByte)                              // no thumbnail
    b.putShort(0xFFC0.toShort).putShort(17.toShort)             // SOF0, len 17
      .put(8.toByte)                                            // precision
      .putShort(h.toShort).putShort(w.toShort)                  // HEIGHT, width
      .put(3.toByte)                                            // 3 components
      .put(1.toByte).put(0x22.toByte).put(0.toByte)             // Y  2×2 q0
      .put(2.toByte).put(0x11.toByte).put(1.toByte)             // Cb 1×1 q1
      .put(3.toByte).put(0x11.toByte).put(1.toByte)             // Cr 1×1 q1
    b.putShort(0xFFDA.toShort).putShort(12.toShort)             // SOS, len 12
      .put(3.toByte)
      .put(1.toByte).put(0.toByte).put(2.toByte).put(0x11.toByte)
      .put(3.toByte).put(0x11.toByte)
      .put(0.toByte).put(63.toByte).put(0.toByte)               // spectral sel
    b.put(data)                                                 // entropy data
    b.putShort(0xFFD9.toShort)                                  // EOI
    b.array()
  }

  /** MPEG-1 Layer III bitrate table (kbps), index 1–14 valid. */
  private[graft] val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample-rate table (Hz), index 0–2 valid. */
  private[graft] val Mp3SampleRates = Array(44100, 48000, 32000)

  /** Prefix bytes with a real MPEG-1 Layer III frame header carrying the
    * given bitrate (index 1–14) and sample rate (index 0–2).
    * Total size = 4 + data.length. */
  def toMp3(data: Array[Byte], bitrateIdx: Int, srIdx: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrate index $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"sample-rate index $srIdx")
    val out = new Array[Byte](4 + data.length)
    out(0) = 0xFF.toByte           // frame sync (8 of 11 bits)
    out(1) = 0xFB.toByte           // sync|MPEG-1|Layer III|no CRC
    out(2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
    out(3) = 0.toByte              // stereo, no extras
    System.arraycopy(data, 0, out, 4, data.length)
    out
  }

  /** Wrap bytes in a structurally-true GIF89a: signature, Logical Screen
    * Descriptor with LITTLE-endian dims (GIF is the one LE format in this
    * sniffer — an endianness slip that happens to pass PNG/JPEG breaks
    * here), no global color table, `data` as opaque blocks, 0x3B trailer.
    * Total size = 14 + data.length. */
  def toGif(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(14 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes(StandardCharsets.US_ASCII))
    b.putShort(w.toShort).putShort(h.toShort)       // LSD dims, LE
    b.put(0.toByte).put(0.toByte).put(0.toByte)     // no GCT, bg 0, aspect 0
    b.put(data)
    b.put(0x3B.toByte)                              // trailer
    b.array()
  }

  /** Wrap bytes in a structurally-true FLAC: "fLaC" signature + mandatory
    * first STREAMINFO metadata block (34 bytes) carrying the given sample
    * rate (20 bits), stereo (3-bit channels−1), 16-bit samples (5-bit
    * bps−1) and total sample count (36 bits) — the exact bit packing the
    * spec mandates, so the sniffer must do sub-byte math to read it back.
    * Total size = 42 + data.length. */
  def toFlac(data: Array[Byte], sampleRate: Int, totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sample rate $sampleRate")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"total samples $totalSamples")
    val b = ByteBuffer.allocate(42 + data.length).order(ByteOrder.BIG_ENDIAN)
    b.put("fLaC".getBytes(StandardCharsets.US_ASCII))
    b.put(0x80.toByte)                              // last-block | type 0
    b.put(0.toByte).put(0.toByte).put(34.toByte)    // block length 34, u24 BE
    b.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
    b.put(0.toByte).put(0.toByte).put(0.toByte)     // min framesize (unknown)
    b.put(0.toByte).put(0.toByte).put(0.toByte)     // max framesize (unknown)
    // 20-bit sample rate | 3-bit channels-1 (stereo=001) | 5-bit bps-1
    // (16→01111) | 36-bit total samples, packed MSB-first across 8 bytes
    b.put((sampleRate >> 12).toByte)
    b.put((sampleRate >> 4).toByte)
    b.put((((sampleRate & 0xF) << 4) | (1 << 1) | ((16 - 1) >> 4)).toByte)
    b.put(((((16 - 1) & 0xF) << 4) | ((totalSamples >> 32).toInt & 0xF)).toByte)
    b.putInt((totalSamples & 0xFFFFFFFFL).toInt)
    b.put(new Array[Byte](16))                      // MD5 of raw audio: zeros
    b.put(data)
    b.array()
  }

  /** Header-only metadata sniff: dispatch on real-world signatures and
    * read the metadata fields out of the headers — PNG IHDR dims (IHDR is
    * mandated first chunk), JPEG SOFn dims via a marker-segment walk
    * (APPn/anything skipped by declared length until SOF0/1/2; stop at
    * SOS), GIF Logical-Screen-Descriptor dims (little-endian), FLAC
    * STREAMINFO sample rate / duration via the spec's sub-byte packing
    * (20-bit rate, 36-bit sample count), MP3 frame-header
    * bitrate/sample-rate with duration estimated as bytes·8/bitrate the
    * way every tag-less MP3 probe does. Unknown signatures → format
    * "unknown", zeros — route to quarantine downstream. Malformed KNOWN
    * formats (truncated header, bad reserved bits) throw like the full
    * decoders do. */
  def sniff(bytes: Array[Byte]): SniffedMeta = {
    val n = bytes.length.toLong
    def be16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def be32(i: Int): Int =
      ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def ascii(i: Int, len: Int): String =
      if (bytes.length >= i + len) new String(bytes, i, len, StandardCharsets.US_ASCII) else ""
    if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) {
      require(bytes.length >= 33, s"PNG truncated before IHDR ($n bytes)")
      require(new String(bytes, 12, 4, StandardCharsets.US_ASCII) == "IHDR",
        "PNG first chunk is not IHDR")
      SniffedMeta("png", be32(16), be32(20), 0, 0, 0L, n)
    } else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFF &&
               (bytes(1) & 0xff) == 0xD8) {
      var p = 2
      while (p + 3 < bytes.length) {
        require((bytes(p) & 0xff) == 0xFF, s"JPEG marker expected at $p")
        val m = bytes(p + 1) & 0xff
        if (m == 0xC0 || m == 0xC1 || m == 0xC2) {
          require(p + 8 < bytes.length, "JPEG SOF truncated")
          return SniffedMeta("jpeg", be16(p + 7), be16(p + 5), 0, 0, 0L, n)
        }
        if (m == 0xDA || m == 0xD9)
          throw new IllegalArgumentException("JPEG has no SOF before SOS/EOI")
        p += 2 + be16(p + 2)
      }
      throw new IllegalArgumentException("JPEG truncated before SOF")
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xFF &&
               (bytes(1) & 0xe0) == 0xE0) {
      val version = (bytes(1) >> 3) & 3
      val layer = (bytes(1) >> 1) & 3
      require(version == 3 && layer == 1,
        s"unsupported MPEG version/layer bits $version/$layer")
      val bi = (bytes(2) >> 4) & 0xf
      val si = (bytes(2) >> 2) & 3
      require(bi >= 1 && bi <= 14, s"invalid MP3 bitrate index $bi")
      require(si <= 2, s"invalid MP3 sample-rate index $si")
      val kbps = Mp3Bitrates(bi)
      SniffedMeta("mp3", 0, 0, Mp3SampleRates(si), kbps, n * 8 / kbps, n)
    } else if (ascii(0, 6) == "GIF87a" || ascii(0, 6) == "GIF89a") {
      require(bytes.length >= 13, s"GIF truncated before screen descriptor ($n bytes)")
      SniffedMeta("gif", le16(6), le16(8), 0, 0, 0L, n)
    } else if (ascii(0, 4) == "fLaC") {
      require(bytes.length >= 42, s"FLAC truncated before STREAMINFO ($n bytes)")
      require((bytes(4) & 0x7f) == 0, "FLAC first metadata block is not STREAMINFO")
      val sr = ((bytes(18) & 0xff) << 12) | ((bytes(19) & 0xff) << 4) |
        ((bytes(20) & 0xff) >> 4)
      require(sr > 0, "FLAC sample rate 0 is invalid in STREAMINFO")
      val totalSamples = ((bytes(21) & 0xF).toLong << 32) |
        ((be32(22).toLong) & 0xFFFFFFFFL)
      SniffedMeta("flac", 0, 0, sr, 0, totalSamples * 1000L / sr, n)
    } else SniffedMeta("unknown", 0, 0, 0, 0, 0L, n)
  }
}
