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
}
