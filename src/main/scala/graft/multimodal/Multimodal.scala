package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded per-image record produced by [[Multimodal.decodeImages]]. */
final case class DecodedImage(
    id: Long, n_bytes: Int, width: Int, height: Int, mean_luma: Double)

/** Decoded per-clip record produced by [[Multimodal.decodeAudio]]. */
final case class DecodedAudio(
    id: Long, n_bytes: Int, sample_rate: Int, n_channels: Int,
    n_samples: Int, mean_amp: Double)

/** Decoded per-video record produced by [[Multimodal.decodeVideos]]. */
final case class DecodedVideo(
    id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int,
    mean_luma: Double)

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `BINARY` columns with typed metadata structs.
  *
  * Decode is REAL for: PPM P6/P3, 24bpp BMP, QOI and RIFF/WAVE PCM
  * (hand-rolled byte parsers — [[ppmDecoder]], [[bmpDecoder]],
  * [[qoiDecoder]], [[wavDecoder]]); PNG/JPEG/GIF via the JDK's own
  * `javax.imageio` codec ([[imageIoDecoder]], [[resizeHalfDecoder]]);
  * G.711 μ-law audio via `javax.sound.sampled` ([[auUlawDecoder]]);
  * and uncompressed VIDEO via the hand-rolled YUV4MPEG2 parser
  * ([[y4mDecoder]] — header tags, per-frame markers, planar raster).
  * No deterministic stand-ins remain: metadata ([[imageMeta]]) sniffs
  * the container from magic bytes and decodes dims for real, and frame
  * features ([[sampleFrames]]) come from the decoded Y planes. The
  * only ceiling is formats with neither a JDK codec nor a feasible
  * hand parser (compressed video, perceptual audio codecs); the
  * decoder slots below are exactly where a JNI/ffmpeg decoder plugs
  * in. Everything around the decoders is real, tested Spark plumbing:
  *  - binary payload columns + `STRUCT` metadata (schema),
  *  - batched partition-wise decode via `mapPartitions` (one decoder
  *    instance per partition, streamed row iterator — the Scala analogue
  *    of `mapInPandas` batch shape),
  *  - frame sampling as a flatMap generator, so one video row fans out
  *    to its sampled-frame rows inside the distributed plan.
  */
object Multimodal {

  /** Payload synthesis for tests/demo corpora: utf8 bytes of a column. */
  def payload(c: Column): Column = c.cast("binary")

  /** REAL image metadata: the container format sniffed from the
    * payload's MAGIC BYTES (never trusted side metadata), dimensions
    * decoded from those bytes by the JDK codec ([[imageIoDecoder]]).
    * Unknown magic and undecodable payloads fail loudly — a metadata
    * row never agrees with a corrupt payload by accident.
    */
  def imageMeta(bytes: Array[Byte]): (String, Int, Int) = {
    require(bytes.length >= 4, s"payload too short to sniff: ${bytes.length} bytes")
    def at(i: Int): Int = bytes(i) & 0xff
    val fmt =
      if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
      else if (at(0) == 'B' && at(1) == 'M') "bmp"
      else if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') "gif"
      else throw new IllegalArgumentException(
        s"unrecognized image magic: ${bytes.take(4).map(b => f"${b & 0xff}%02x").mkString}")
    val (w, h, _) = imageIoDecoder(bytes)
    (fmt, w, h)
  }

  /** Resize planning on metadata: scale the longer side down to
    * `maxSide`, preserving aspect ratio with integer floor — pure
    * metadata math, runs without touching payload bytes.
    */
  def resizedMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val longSide = greatest(w, h)
    val scale = when(longSide > maxSide, lit(maxSide) / longSide).otherwise(lit(1.0))
    struct(
      greatest(floor(w * scale), lit(1)).cast("int").as("width"),
      greatest(floor(h * scale), lit(1)).cast("int").as("height"))
  }

  /** REAL frame sampling over Y4M payloads: decode the planar raster
    * ([[y4mFrameStats]]) and emit one row per SAMPLED frame — stride
    * `every`, starting at frame 0 — with the frame's mean luma
    * computed from its Y plane (exact long sum, one double division,
    * so the generator's closed-form oracle matches bit-for-bit). One
    * payload row fans out to ceil(n_frames/every) frame rows inside
    * the distributed plan; a compressed-format codec plugs into the
    * same shape via [[decodeVideos]]' decoder slot.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   every: Int): DataFrame = {
    require(every >= 1, s"every must be positive, got $every")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (w, h, sums) = y4mFrameStats(bytes)
        Iterator.range(0, sums.length, every).map { f =>
          (id, f, sums(f).toDouble / (w.toLong * h))
        }
      })
      .toDF(idCol, "frame", "mean_luma")
  }

  /** REAL image decode: parse a PPM payload (binary `P6` or plain-ASCII
    * `P3`, per the Netpbm spec) directly from its bytes — magic, `#`
    * comments, width/height/maxval header, then pixel samples (raw bytes
    * for P6, ASCII integers for P3). Returns (width, height, mean sample
    * value) with dimensions taken from the ACTUAL payload bytes. Plug
    * into [[decodeImages]] as the `decoder`.
    */
  def ppmDecoder(bytes: Array[Byte]): (Int, Int, Double) = {
    var i = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      while (i < bytes.length &&
          (isWs(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else i += 1
      }
    }
    def token(): String = {
      skipWsAndComments()
      val s = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      require(i > s, "truncated PPM header")
      new String(bytes, s, i - s, "US-ASCII")
    }
    val magic = token()
    val w = token().toInt
    val h = token().toInt
    token().toInt // maxval (parsed for validity; luma reports raw samples)
    // Reject bad dimensions loudly: a negative parsed dim (or a w*h*3
    // that overflows Int) would make n negative, silently skipping both
    // the truncation check and the sum loop and returning garbage.
    require(w > 0 && h > 0, s"bad PPM dimensions: ${w}x$h")
    val nL = w.toLong * h * 3
    require(nL <= Int.MaxValue, s"PPM raster too large: ${w}x$h")
    val n = nL.toInt
    magic match {
      case "P6" =>
        i += 1 // exactly ONE whitespace byte separates maxval from raster
        require(bytes.length - i >= n, s"P6 raster truncated: ${bytes.length - i} < $n")
        var sum = 0L
        var k = 0
        while (k < n) { sum += bytes(i + k) & 0xff; k += 1 }
        (w, h, sum.toDouble / n) // n ≥ 3: dims are require'd positive
      case "P3" =>
        var sum = 0L
        var k = 0
        while (k < n) { sum += token().toLong; k += 1 }
        (w, h, sum.toDouble / n)
      case other => throw new IllegalArgumentException(s"not a PPM payload: $other")
    }
  }

  /** REAL image decode #2: parse a Windows BMP payload (BITMAPINFOHEADER,
    * 24 bits per pixel, uncompressed — the overwhelmingly common .bmp on
    * disk) directly from its bytes: 'BM' magic, little-endian header
    * fields, then the bottom-up raster whose rows are padded to 4-byte
    * boundaries. Returns (width, height, mean pixel sample value) with
    * the mean taken over the B/G/R samples only — padding bytes are
    * skipped, which is what makes this a parse and not a byte average.
    * Unsupported variants (palette bpp, compression, top-down negative
    * height) fail loudly. Plug into [[decodeImages]] as the `decoder`.
    */
  def bmpDecoder(bytes: Array[Byte]): (Int, Int, Double) = {
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    require(bytes.length >= 54, "truncated BMP header")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP payload")
    val dataOffset = le32(10)
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"bad BMP data offset $dataOffset")
    require(le32(14) >= 40, s"unsupported BMP header size ${le32(14)}")
    val w = le32(18)
    val h = le32(22) // negative = top-down variant, not supported here
    require(w > 0 && h > 0, s"bad BMP dimensions: ${w}x$h")
    require(le16(26) == 1, s"bad BMP plane count ${le16(26)}")
    require(le16(28) == 24, s"only 24bpp BMP supported, got ${le16(28)}")
    require(le32(30) == 0, "only uncompressed BMP supported")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val nL = w.toLong * h * 3
    require(nL <= Int.MaxValue, s"BMP raster too large: ${w}x$h")
    require(bytes.length.toLong >= dataOffset.toLong + rowSize.toLong * h,
      s"BMP raster truncated: ${bytes.length - dataOffset} < ${rowSize.toLong * h}")
    var sum = 0L
    var r = 0
    while (r < h) {
      val base = dataOffset + r * rowSize
      var p = 0
      while (p < w * 3) { sum += bytes(base + p) & 0xff; p += 1 }
      r += 1
    }
    (w, h, sum.toDouble / nL)
  }

  /** Hex of one byte-valued column (0..255), lowercase 2 digits. */
  private def hexByte(b: Column): Column = lpad(lower(hex(b.cast("int"))), 2, "0")
  private def le16hex(v: Column): Column =
    concat(hexByte(pmod(v, lit(256))), hexByte(pmod(shiftright(v, 8), lit(256))))
  private def le32hex(v: Column): Column =
    concat(hexByte(pmod(v, lit(256))), hexByte(pmod(shiftright(v, 8), lit(256))),
      hexByte(pmod(shiftright(v, 16), lit(256))), hexByte(pmod(shiftright(v, 24), lit(256))))

  /** Synthesized 24bpp BMP payload column — a REAL image file any viewer
    * would open (file header, BITMAPINFOHEADER, padded raster), built as
    * a hex string and `unhex`ed to binary so arbitrary byte values work
    * through pure column expressions. Pixel sample k (in stored order,
    * padding excluded) is `(id*7 + k*13) % 256` — the same generator as
    * [[ppmPayload]], so oracles recompute the decoded mean without
    * parsing bytes.
    */
  def bmpPayload(id: Column, w: Column, h: Column): Column = {
    val pad = pmod(lit(4) - pmod(w * 3, lit(4)), lit(4))
    val rowSize = w * 3 + pad
    val imageSize = rowSize * h
    val header = concat(
      lit("424d"), le32hex(lit(54) + imageSize), lit("00000000"), le32hex(lit(54)),
      le32hex(lit(40)), le32hex(w), le32hex(h), le16hex(lit(1)), le16hex(lit(24)),
      le32hex(lit(0)), le32hex(imageSize),
      le32hex(lit(0)), le32hex(lit(0)), le32hex(lit(0)), le32hex(lit(0)))
    val padHex = element_at(array(lit(""), lit("00"), lit("0000"), lit("000000")), pad + 1)
    val raster = concat_ws("", transform(sequence(lit(0), h - 1), r =>
      concat(concat_ws("", transform(sequence(lit(0), w * 3 - 1), p =>
        hexByte(pmod(id * 7 + (r * (w * 3) + p) * 13, lit(256))))), padHex)))
    unhex(concat(header, raster))
  }

  /** Synthesized canonical WAV payload column — a REAL audio file any
    * player would open: 44-byte RIFF/WAVE header (little-endian fields,
    * PCM format tag, mono, 16 bits per sample) followed by `n` signed
    * 16-bit samples. Sample k is the sign-extension of
    * `(id*31 + k*17) % 65536`, so oracles recompute the decoded mean
    * from the generator's closed form without parsing bytes.
    */
  def wavPayload(id: Column, n: Column, rate: Column): Column = {
    val dataSize = n * 2
    val header = concat(
      lit("52494646"), le32hex(lit(36) + dataSize), lit("57415645"), // RIFF <sz> WAVE
      lit("666d7420"), le32hex(lit(16)),                             // "fmt " 16
      le16hex(lit(1)), le16hex(lit(1)),                              // PCM, mono
      le32hex(rate), le32hex(rate * 2),                              // rate, byte rate
      le16hex(lit(2)), le16hex(lit(16)),                             // block align, bits
      lit("64617461"), le32hex(dataSize))                            // "data" <sz>
    val samples = concat_ws("", transform(sequence(lit(0), n - 1),
      k => le16hex(pmod(id * 31 + k * 17, lit(65536)))))
    unhex(concat(header, samples))
  }

  /** REAL audio decode: parse a WAV payload directly from its bytes per
    * the RIFF spec — 'RIFF'/'WAVE' magic, then a CHUNK WALK (chunks in
    * any order, unknown chunks skipped, odd sizes padded to even) to the
    * `fmt ` chunk (validated: PCM format tag, 16 bits per sample) and the
    * `data` chunk. Returns (sampleRate, channels, frames, mean sample
    * value) with the mean over every sign-extended 16-bit sample and
    * frames = samples per channel. Unsupported variants (compressed
    * formats, non-16-bit) and truncated payloads fail loudly. Plug into
    * [[decodeAudio]] as the `decoder`.
    */
  def wavDecoder(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val (rate, channels, dataOff, nSamples) = wavDataSection(bytes)
    def le16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    var sum = 0L
    var k = 0
    while (k < nSamples) { sum += le16(dataOff + 2 * k).toShort.toLong; k += 1 }
    val mean = if (nSamples == 0) 0.0 else sum.toDouble / nSamples
    (rate, channels, nSamples / channels, mean)
  }

  /** RIFF chunk walk shared by [[wavDecoder]] and [[audioSignHash56]]:
    * validate magic, walk chunks in any order (unknown chunks skipped,
    * odd sizes padded to even), parse `fmt ` (PCM, 16-bit only) and
    * locate `data`. Returns (sampleRate, channels, dataOffset,
    * nSamples). Truncated/unsupported payloads fail loudly.
    */
  private def wavDataSection(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    require(bytes.length >= 12, "truncated WAV header")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV payload")
    var i = 12
    var rate = -1; var channels = -1; var dataOff = -1; var dataLen = -1
    while (i + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(i)
      val size = le32(i + 4)
      require(size >= 0 && i + 8 + size <= bytes.length,
        s"truncated WAV chunk '$id': ${bytes.length - i - 8} < $size")
      id match {
        case "fmt " =>
          require(size >= 16, s"short fmt chunk: $size")
          require(le16(i + 8) == 1, s"only PCM WAV supported, got format tag ${le16(i + 8)}")
          channels = le16(i + 10)
          rate = le32(i + 12)
          require(channels > 0, s"bad WAV channel count $channels")
          require(rate > 0, s"bad WAV sample rate $rate")
          require(le16(i + 22) == 16, s"only 16-bit PCM supported, got ${le16(i + 22)}")
        case "data" =>
          dataOff = i + 8; dataLen = size
        case _ => () // unknown chunk (LIST, fact, …): skip
      }
      i += 8 + size + (size & 1) // RIFF chunks are padded to even length
    }
    require(rate > 0, "missing WAV fmt chunk")
    require(dataOff >= 0, "missing WAV data chunk")
    require(dataLen % (2 * channels) == 0,
      s"WAV data size $dataLen not aligned to ${2 * channels}-byte frames")
    (rate, channels, dataOff, dataLen / 2)
  }

  /** Batched partition-wise audio decode — the audio twin of
    * [[decodeImages]]: one decoder instance per PARTITION, streamed row
    * iterator, typed output. Input must have (idCol LONG, binCol BINARY).
    */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String,
                  decoder: Array[Byte] => (Int, Int, Int, Double) = wavDecoder): Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode = decoder
        rows.map { case (id, bytes) =>
          val (rate, channels, frames, mean) = decode(bytes)
          DecodedAudio(id, bytes.length, rate, channels, frames, mean)
        }
      }
  }

  /** Synthesized plain-PPM (P3, pure ASCII) payload column — a REAL
    * image file any Netpbm tool would open, generated per row so decode
    * tests and oracles have actual bytes to parse. Pixel sample k is
    * `(id*7 + k*13) % 256`.
    */
  def ppmPayload(id: Column, w: Column, h: Column): Column =
    concat(lit("P3\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n"),
      concat_ws(" ", transform(sequence(lit(0), w * h * lit(3) - 1),
        k => ((id * 7 + k * 13) % 256).cast("string"))))

  /** Column-form P3 header parse: width/height extracted from the
    * payload BYTES by regex (expressible identically in any engine —
    * the oracle runs the same pattern), plus the byte length.
    */
  def ppmHeaderMeta(payload: Column): Column = {
    val hdr = "^P3\\n(\\d+) (\\d+)\\n"
    struct(
      length(payload.cast("binary")).cast("int").as("n_bytes"),
      regexp_extract(payload, hdr, 1).cast("int").as("width"),
      regexp_extract(payload, hdr, 2).cast("int").as("height"))
  }

  /** Column-form P3 mean sample value: parse the raster line's ASCII
    * integers and average them — one exact long sum and one exact
    * double division, so both engines agree bit-for-bit.
    */
  def ppmMeanLuma(payload: Column, width: Column, height: Column): Column = {
    val samples = transform(split(element_at(split(payload, "\n"), 4), " "),
      x => x.cast("long"))
    aggregate(samples, lit(0L), (acc, x) => acc + x).cast("double") /
      (width * height * lit(3))
  }

  /** REAL compressed-image encode (QOI, the "Quite OK Image" format —
    * public spec, qoiformat.org): pixels in, a spec-valid .qoi file out,
    * exercising the full op set a compliant encoder uses — RUN for
    * repeats, INDEX for hash-table hits, DIFF/LUMA for small deltas,
    * RGB literals otherwise. Used to synthesize real compressed payloads
    * for decode tests/queries; any compliant decoder opens the output.
    * `pixels` are packed 0xRRGGBB ints (alpha fixed at 255), row-major.
    */
  def qoiEncode(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h, "bad QOI encode input")
    val out = new java.io.ByteArrayOutputStream(64 + pixels.length)
    def u32be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    u32be(w); u32be(h); out.write(3); out.write(0) // RGB, sRGB
    val index = new Array[Int](64) // packed 0xAARRGGBB, zero = uninitialized
    var prev = 0xff000000 // (0,0,0,255)
    var run = 0
    def hash(p: Int): Int = {
      val r = (p >>> 16) & 0xff; val g = (p >>> 8) & 0xff; val b = p & 0xff
      (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
    }
    var k = 0
    while (k < pixels.length) {
      val px = 0xff000000 | (pixels(k) & 0xffffff)
      if (px == prev) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val ih = hash(px)
        if (index(ih) == px) out.write(ih) // QOI_OP_INDEX (top bits 00)
        else {
          index(ih) = px
          val dr = ((px >>> 16) & 0xff) - ((prev >>> 16) & 0xff)
          val dg = ((px >>> 8) & 0xff) - ((prev >>> 8) & 0xff)
          val db = (px & 0xff) - (prev & 0xff)
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)) // DIFF
          else if (dg >= -32 && dg <= 31 &&
                   dr - dg >= -8 && dr - dg <= 7 && db - dg >= -8 && db - dg <= 7) {
            out.write(0x80 | (dg + 32))                                    // LUMA
            out.write(((dr - dg + 8) << 4) | (db - dg + 8))
          } else {
            out.write(0xfe)                                                // RGB
            out.write((px >>> 16) & 0xff); out.write((px >>> 8) & 0xff); out.write(px & 0xff)
          }
        }
        prev = px
      }
      k += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    (0 until 7).foreach(_ => out.write(0)); out.write(1) // end marker
    out.toByteArray
  }

  /** REAL compressed-image decode #3: parse a QOI payload byte-by-byte
    * per the public spec — magic, big-endian dims, then the chunk stream
    * (RGB/RGBA literals, 64-entry hash-table INDEX, DIFF, LUMA, RUN with
    * wraparound arithmetic) to the 8-byte end marker. Handles 3- and
    * 4-channel files from ANY compliant encoder, not just [[qoiEncode]].
    * Returns (width, height, mean over the R,G,B samples — alpha
    * excluded). Truncated streams, bad magic, and pixel overruns fail
    * loudly. Plug into [[decodeImages]] as the `decoder`.
    */
  def qoiDecoder(bytes: Array[Byte]): (Int, Int, Double) = {
    def u8(i: Int) = bytes(i) & 0xff
    require(bytes.length >= 22, "truncated QOI header") // 14 header + 8 end marker
    require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' && bytes(3) == 'f',
      "not a QOI payload")
    def u32be(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val w = u32be(4)
    val h = u32be(8)
    require(w > 0 && h > 0, s"bad QOI dimensions: ${w}x$h")
    val channels = u8(12)
    require(channels == 3 || channels == 4, s"bad QOI channel count $channels")
    val nL = w.toLong * h
    require(nL <= Int.MaxValue / 4, s"QOI raster too large: ${w}x$h")
    val n = nL.toInt
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var sum = 0L
    var produced = 0
    var i = 14
    val end = bytes.length - 8
    def emit(count: Int): Unit = {
      require(produced + count <= n, s"QOI pixel overrun at $produced + $count > $n")
      sum += (r + g + b).toLong * count
      produced += count
    }
    def keep(): Unit =
      index(((r * 3 + g * 5 + b * 7 + a * 11) % 64 + 64) % 64) =
        (a << 24) | (r << 16) | (g << 8) | b
    while (produced < n) {
      require(i < end, s"QOI chunk stream truncated at pixel $produced/$n")
      val op = u8(i)
      if (op == 0xfe) { // RGB
        require(i + 3 < end, "truncated QOI_OP_RGB")
        r = u8(i + 1); g = u8(i + 2); b = u8(i + 3); i += 4; keep(); emit(1)
      } else if (op == 0xff) { // RGBA
        require(i + 4 < end, "truncated QOI_OP_RGBA")
        r = u8(i + 1); g = u8(i + 2); b = u8(i + 3); a = u8(i + 4); i += 5; keep(); emit(1)
      } else (op >> 6) match {
        case 0 => // INDEX
          val px = index(op & 0x3f)
          a = (px >>> 24) & 0xff; r = (px >>> 16) & 0xff
          g = (px >>> 8) & 0xff; b = px & 0xff
          i += 1; emit(1)
        case 1 => // DIFF (wraparound, bias 2)
          r = (r + ((op >> 4) & 3) - 2) & 0xff
          g = (g + ((op >> 2) & 3) - 2) & 0xff
          b = (b + (op & 3) - 2) & 0xff
          i += 1; keep(); emit(1)
        case 2 => // LUMA (bias 32 / 8)
          require(i + 1 < end, "truncated QOI_OP_LUMA")
          val dg = (op & 0x3f) - 32
          val b2 = u8(i + 1)
          r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (b2 & 0xf) - 8) & 0xff
          i += 2; keep(); emit(1)
        case _ => // RUN (bias -1; 0xfe/0xff taken by RGB/RGBA above)
          i += 1; emit((op & 0x3f) + 1)
      }
    }
    (w, h, sum.toDouble / (nL * 3))
  }

  /** Deterministic QOI payload for tests/queries: pixel k's channels are
    * `(id*7 + (k/4)*13) % 256`, `(id*11 + (k/4)*17) % 256`,
    * `(id*13 + (k/4)*19) % 256` — groups of 4 equal pixels force RUN
    * ops, the +13/+17/+19 group steps mostly fit LUMA, wraps fall back
    * to RGB, and recurrences hit INDEX, so a round trip crosses the
    * whole op set. Oracles recompute the decoded mean from this closed
    * form without touching QOI.
    */
  def qoiPayload(id: Long, w: Int, h: Int): Array[Byte] =
    qoiEncode(w, h, testPixels(id, w, h))

  /** The deterministic test raster shared by the QOI/PNG/JPEG payload
    * generators: pixel k of image `id` has
    * r=(id·7+(k/4)·13)%256, g=(id·11+(k/4)·17)%256, b=(id·13+(k/4)·19)%256
    * — a pure closed form a SQL oracle can recompute without any codec.
    */
  def testPixels(id: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val j = k / 4
      val r = ((id * 7 + j * 13) % 256).toInt
      val g = ((id * 11 + j * 17) % 256).toInt
      val b = ((id * 13 + j * 19) % 256).toInt
      (r << 16) | (g << 8) | b
    }

  /** Exact mean RGB sample of [[testPixels]] (Long-sum then ONE double
    * division — the same value the SQL closed form computes).
    */
  def testPixelsMean(id: Long, w: Int, h: Int): Double = {
    var sum = 0L
    testPixels(id, w, h).foreach { p =>
      sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    sum.toDouble / (w.toLong * h * 3)
  }

  private def toBuffered(w: Int, h: Int, pixels: Array[Int]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var k = 0
    while (k < pixels.length) { img.setRGB(k % w, k / w, pixels(k)); k += 1 }
    img
  }

  private def imageIoBytes(fmt: String, w: Int, h: Int,
                           pixels: Array[Int]): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    // in-memory stream cache: the default disk-backed ImageIO cache
    // creates a temp FILE per encode/decode — measured 3x slower
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBuffered(w, h, pixels), fmt, bos)
    bos.toByteArray
  }

  /** REAL PNG payload — encoded by the JDK's own codec
    * (`javax.imageio`, part of java.desktop; no external library).
    * PNG is lossless, so decode(encode(px)) == px and the SQL oracle's
    * closed-form pixel stats verify the full codec round trip.
    */
  def pngPayload(id: Long, w: Int, h: Int): Array[Byte] =
    imageIoBytes("png", w, h, testPixels(id, w, h))

  /** REAL JPEG payload (JDK codec). JPEG is LOSSY: decoded pixels are
    * approximations, so oracle checks are exact on dimensions and
    * BOUNDED on pixel stats (the q86 pattern).
    */
  def jpegPayload(id: Long, w: Int, h: Int): Array[Byte] =
    imageIoBytes("jpg", w, h, testPixels(id, w, h))

  /** REAL BMP payload via the JDK codec (BI_RGB — uncompressed,
    * lossless): the second container of q48's mixed-format corpus,
    * exercising [[imageMeta]]'s magic-byte sniff against a format whose
    * header layout shares nothing with PNG's.
    */
  def bmpIoPayload(id: Long, w: Int, h: Int): Array[Byte] =
    imageIoBytes("bmp", w, h, testPixels(id, w, h))

  /** Decode ANY ImageIO-supported payload (PNG, JPEG, GIF, BMP) with
    * the JDK codec: (width, height, mean RGB sample). The mean folds as
    * a Long sum over samples with ONE double division at the end —
    * exact, so lossless formats reproduce the generator's closed form
    * bit-for-bit. Rejects undecodable bytes loudly (contract shared
    * with [[ppmDecoder]]).
    */
  def imageIoDecoder(bytes: Array[Byte]): (Int, Int, Double) = {
    System.setProperty("java.awt.headless", "true")
    // in-memory stream cache: the default disk-backed ImageIO cache
    // creates a temp FILE per encode/decode — measured 3x slower
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sum.toDouble / (w.toLong * h * 3))
  }

  /** REAL COMPRESSED audio: a Sun AU container of G.711 μ-law codes
    * (8-bit logarithmically companded — a genuine lossy speech codec,
    * encoding 1). Sample k of stream `id` is the code
    * `(id·37 + k·11 + 7) % 256` — closed form for the oracle.
    */
  def auUlawPayload(id: Long, n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(n)
    d.writeInt(1) /* 8-bit μ-law */; d.writeInt(8000); d.writeInt(1)
    var k = 0
    while (k < n) { d.write(((id * 37 + k * 11 + 7) % 256).toInt); k += 1 }
    bos.toByteArray
  }

  /** Decode μ-law AU with the JDK's own codec (`javax.sound.sampled`,
    * java.desktop — no external library): the codec expands each 8-bit
    * code to a 16-bit linear sample. The JDK expansion equals exactly
    * 4× the textbook G.711 form — with u = 255−c, e = (u/16)%8,
    * m = u%16: lin = 4·sign·((2m+33)·2^e − 33) — verified over all 256
    * codes, so a SQL oracle mirrors it arithmetically. Returns (rate,
    * channels, frames, mean linear sample) like [[wavDecoder]]; the
    * mean folds as a Long sum + ONE division (exact).
    */
  def auUlawDecoder(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ULAW,
      s"not a μ-law payload: ${fmt.getEncoding}")
    val target = new javax.sound.sampled.AudioFormat(
      fmt.getSampleRate, 16, fmt.getChannels, true, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
    val buf = pcm.readAllBytes()
    val n = buf.length / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += (((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort).toLong
      i += 1
    }
    (fmt.getSampleRate.toInt, fmt.getChannels, n / fmt.getChannels,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** A-law sibling of [[auUlawPayload]]: AU encoding 27, sample k of
    * stream `id` is the code `(id·53 + k·19 + 3) % 256`.
    */
  def auAlawPayload(id: Long, n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(n)
    d.writeInt(27) /* 8-bit A-law */; d.writeInt(8000); d.writeInt(1)
    var k = 0
    while (k < n) { d.write(((id * 53 + k * 19 + 3) % 256).toInt); k += 1 }
    bos.toByteArray
  }

  /** Decode A-law AU with the JDK codec. The JDK expansion equals
    * exactly 8× the textbook G.711 A-law form with the sign bit
    * meaning POSITIVE — with u = c⊕0x55, e = (u/16)%8, m = u%16,
    * mag = (e=0 ? 2m+1 : (2m+33)·2^(e−1)):
    * lin = (u≥128 ? +8 : −8)·mag — verified over all 256 codes.
    * Same return shape as [[auUlawDecoder]].
    */
  def auAlawDecoder(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ALAW,
      s"not an A-law payload: ${fmt.getEncoding}")
    val target = new javax.sound.sampled.AudioFormat(
      fmt.getSampleRate, 16, fmt.getChannels, true, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
    val buf = pcm.readAllBytes()
    val n = buf.length / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += (((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort).toLong
      i += 1
    }
    (fmt.getSampleRate.toInt, fmt.getChannels, n / fmt.getChannels,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** REAL image resize: decode any ImageIO payload and 2:1 nearest-
    * neighbor downscale (output pixel (x,y) = source pixel (2x, 2y);
    * output dims = ceil(dim/2)) — the thumbnailing step of an image
    * pipeline, as pure integer index arithmetic a SQL oracle can
    * mirror on the generator's closed-form raster. Returns the
    * downscaled (width, height, mean RGB sample); the mean folds as a
    * Long sum + ONE division (exact for lossless inputs).
    */
  def resizeHalfDecoder(bytes: Array[Byte]): (Int, Int, Double) = {
    System.setProperty("java.awt.headless", "true")
    // in-memory stream cache: the default disk-backed ImageIO cache
    // creates a temp FILE per encode/decode — measured 3x slower
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image payload")
    val w2 = (img.getWidth + 1) / 2
    val h2 = (img.getHeight + 1) / 2
    var sum = 0L
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val p = img.getRGB(2 * x, 2 * y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    (w2, h2, sum.toDouble / (w2.toLong * h2 * 3))
  }

  /** Pixel raster for the image NEAR-DUP corpus: variants v ∈ [0, 16)
    * of a shared group raster g differ only where `k % 16 == v` gets a
    * +64 luma bump before the mod — a handful of scattered pixels, so
    * same-group variants sit a few dHash bits apart while distinct
    * groups land ~half the hash away (the planted-near-dup geometry
    * the q44 SimHash corpus uses, here in PIXEL space). Closed form,
    * so an engine without the codec recomputes it exactly.
    */
  def variantPixels(g: Long, v: Int, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val bump = if (k % 16 == v) 64L else 0L
      val r = ((g * 7 + k * 13 + bump) % 256).toInt
      val gg = ((g * 11 + k * 17 + bump) % 256).toInt
      val b = ((g * 13 + k * 19 + bump) % 256).toInt
      (r << 16) | (gg << 8) | b
    }

  /** REAL PNG payload of [[variantPixels]] (JDK codec, lossless). */
  def variantPngPayload(g: Long, v: Int, w: Int, h: Int): Array[Byte] =
    imageIoBytes("png", w, h, variantPixels(g, v, w, h))

  /** 56-bit difference hash over the DECODED raster: for each of the 8
    * rows, 7 adjacent-pixel luma comparisons — bit y·7+x set iff
    * lum(x+1, y) > lum(x, y), luma = r+g+b (an exact small-int sum, no
    * grayscale rounding to disagree about). 56 bits keeps every shift
    * inside a signed long; the classic 8×8-resize step is dropped
    * because the corpus is generated at hash resolution already — a
    * production variant would front-load [[resizeHalfDecoder]]'s
    * nearest-neighbor sampling. PNG being lossless, the hash of the
    * decoded bytes equals the closed-form hash of the generator —
    * which is exactly what the oracle gate checks.
    */
  def dhash56(bytes: Array[Byte]): Long = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image payload")
    require(img.getWidth >= 8 && img.getHeight >= 8,
      s"dhash56 needs an 8x8+ raster, got ${img.getWidth}x${img.getHeight}")
    def lum(x: Int, y: Int): Int = {
      val p = img.getRGB(x, y)
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (lum(x + 1, y) > lum(x, y)) hash |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** PCM stream for the AUDIO near-dup corpus — [[variantPixels]]'s
    * geometry in sample space: variants v ∈ [0, 128) of a shared group
    * stream g differ only where `k % 128 == v` gets a +512 bump before
    * the mod — a sprinkle of perturbed samples whose energy nudges flip
    * at most a bit or two of the sign hash. Cross-group decorrelation
    * comes from a per-(g, frame) murmur-style offset into the
    * 65536-wide triangle domain ([[frameOffset]]) — frame f of group g
    * ramps from that offset in steps of 17. The mixing must be
    * GENUINELY non-algebraic: a plain `g·c` offset only phase-shifts
    * one global sawtooth (energy pattern group-invariant), a
    * group-dependent affine step leaves ~120 distinct comparison
    * patterns, and even a quadratic mod-prime mix has twin pairs
    * (2Δ ≡ −1 mod p) with near-identical offset sequences — all three
    * collide catastrophically across a few hundred groups. Emitted as
    * a REAL canonical WAV (RIFF header + 16-bit LE PCM —
    * [[wavDecoder]] round-trips it); everything is closed form so an
    * engine without the codec recomputes the decoded stream exactly.
    */
  def variantWavBytes(g: Long, v: Int, n: Int, rate: Int): Array[Byte] = {
    val flen = math.max(1, n / 60)
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(rate).putInt(rate * 2)              // rate, byte rate
      .putShort(2).putShort(16)                   // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var k = 0
    while (k < n) {
      val f = k / flen
      val j = k - f * flen
      val bump = if (k % 128 == v) 512L else 0L
      buf.putShort(((frameOffset(g, f) + j * 17L + bump) % 65536L).toShort)
      k += 1
    }
    buf.array()
  }

  /** Murmur-style (g, frame) → [0, 65536) mix: two 31-bit
    * multiply-mod rounds with xorshift folds. Every intermediate stays
    * below 2^62 (operands clamped to 2^31 first), so BOTH engines
    * compute it in exact integer arithmetic — no 64-bit wraparound for
    * DuckDB's BIGINT to raise on.
    */
  def frameOffset(g: Long, f: Int): Long = {
    val M31 = 2147483648L
    var h = (g * 60 + f + 1) % M31
    h = h * 2654435761L % M31
    h ^= h >> 15
    h = h * 1540483477L % M31
    h ^= h >> 13
    h % 65536L
  }

  /** 56-bit energy sign hash over the DECODED PCM — the audio twin of
    * [[dhash56]]: the stream splits into 60 equal frames laid out as 4
    * rows × 15, each frame's energy is Σ|sample| (an exact long — no
    * float power to disagree about), and bit r·14+c is set iff
    * E(r·15+c+1) > E(r·15+c) — adjacent-frame comparisons, robust to
    * uniform gain changes the way dHash is robust to brightness. 56
    * bits keeps every shift inside a signed long and reuses q217's
    * 4×14 banding geometry unchanged. PCM being uncompressed, the
    * decoded-byte hash equals the generator's closed form — exactly
    * what the oracle recomputes, so a parser or framing bug
    * desynchronizes loudly.
    */
  def audioSignHash56(bytes: Array[Byte]): Long = {
    val (_, _, dataOff, nSamples) = wavDataSection(bytes)
    require(nSamples > 0 && nSamples % 60 == 0,
      s"audioSignHash56 needs a multiple of 60 samples, got $nSamples")
    val flen = nSamples / 60
    def le16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val e = new Array[Long](60)
    var f = 0
    while (f < 60) {
      var s = 0L
      var k = f * flen
      val end = k + flen
      while (k < end) {
        s += math.abs(le16(dataOff + 2 * k).toShort.toLong)
        k += 1
      }
      e(f) = s
      f += 1
    }
    var hash = 0L
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 14) {
        if (e(r * 15 + c + 1) > e(r * 15 + c)) hash |= 1L << (r * 14 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Banded-LSH near-dup pairs over a 56-bit perceptual-hash table —
    * the candidate geometry shared by the image (q217), audio (q224)
    * and cross-modal (q230) dedup queries: 4 bands × 14 bits, a
    * bucket-skew cap (a bucket hotter than `maxBucket` carries no
    * blocking signal and would k² the join), then exact
    * `bit_count(xor)` ≤ `maxHamming` verification on candidates only.
    * Emits (id_a, id_b, hamming), id_a < id_b, each pair once however
    * many bands it shares.
    */
  def bandedHammingPairs(h: DataFrame, idCol: String, hashCol: String,
                         maxBucket: Int, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kept = h.select(col(idCol).as("id"), col(hashCol).as("hsh"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("chunk", expr("shiftright(hsh, b * 14) & 16383"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("b", "chunk")))
      .where(col("bsz") <= maxBucket)
    kept.as("a")
      .join(kept.as("b2"),
        col("a.b") === col("b2.b") && col("a.chunk") === col("b2.chunk") &&
          col("a.id") < col("b2.id"))
      .select(col("a.id").as("id_a"), col("b2.id").as("id_b"),
        col("a.hsh").as("ha"), col("b2.hsh").as("hb"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Banded perceptual-hash INDEX: (band, chunk, id, hsh) — one row
    * per (vector, band) under the same 4 × 14-bit geometry as
    * [[bandedHammingPairs]]. This is the stored-corpus artifact a
    * streaming admission path probes: 4 rows × 16 bytes per item, so a
    * billion-item corpus indexes in ~64 GB — partition by (band,
    * chunk) and the probe is a pruned equi-join.
    */
  def bandedIndex(h: DataFrame, idCol: String, hashCol: String): DataFrame =
    h.select(col(idCol).as("id"), col(hashCol).as("hsh"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("chunk", expr("shiftright(hsh, band * 14) & 16383"))
      .select("band", "chunk", "id", "hsh")

  /** Partition-wise audio-fingerprint decode: (id, ahash LONG) — the
    * audio twin of [[decodeDHashes]].
    */
  def decodeAudioHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode: Array[Byte] => Long = audioSignHash56
        rows.map { case (id, bytes) => (id, decode(bytes)) }
      }
      .toDF("id", "ahash")
  }

  /** Partition-wise dHash decode: (id, dhash LONG) — the codec path is
    * the one legitimate mapPartitions home (decoder context per
    * partition, one row per image).
    */
  def decodeDHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode: Array[Byte] => Long = dhash56
        rows.map { case (id, bytes) => (id, decode(bytes)) }
      }
      .toDF("id", "dhash")
  }

  /** Batched partition-wise decode: the Scala analogue of `mapInPandas`.
    * The decoder runs once per row but is instantiated once per
    * PARTITION (closure setup outside the iterator) — where a real codec
    * would allocate its native context. Input must have (idCol LONG,
    * binCol BINARY); output is a typed Dataset with a stable schema.
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String,
                   decoder: Array[Byte] => (Int, Int, Double) = imageIoDecoder): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup happens here (native context, etc.)
        val decode = decoder
        rows.map { case (id, bytes) =>
          val (w, h, luma) = decode(bytes)
          DecodedImage(id, bytes.length, w, h, luma)
        }
      }
  }

  /** Synthesized YUV4MPEG2 (.y4m) payload — a REAL video file any
    * Y4M-aware tool (ffmpeg, mplayer, mjpegtools) would open: the
    * stream header with W/H/F/I/A/C tags, then per frame a `FRAME`
    * marker followed by the raw planar 4:2:0 raster (Y then U then V).
    * Luma byte k of frame f is `(id*7 + f*31 + k*13) % 256` — the
    * closed form an engine without the codec can recompute exactly;
    * chroma bytes use different multipliers so a decoder that mis-sizes
    * the planes desynchronizes loudly instead of agreeing by accident.
    * `w`/`h` must be even (4:2:0 subsamples both axes).
    */
  def y4mPayload(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"C420 needs positive even dims, got ${w}x$h")
    require(frames > 0, s"frames must be positive, got $frames")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames * (marker.length + ySize + 2 * cSize))
    out.write(header)
    var f = 0
    while (f < frames) {
      out.write(marker)
      var k = 0
      while (k < ySize) { out.write(((id * 7 + f * 31 + k * 13) % 256).toInt); k += 1 }
      k = 0
      while (k < cSize) { out.write(((id * 11 + f * 17 + k * 7) % 256).toInt); k += 1 }
      k = 0
      while (k < cSize) { out.write(((id * 13 + f * 19 + k * 5) % 256).toInt); k += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Planted-variant Y4M generator for perceptual VIDEO near-dup: the
    * luma raster is keyed by the GROUP id `g` (so a group's variants
    * share one base clip), and variant `v` bumps every 128th global
    * luma position (index f*ySize+k across frames) by +16 before the
    * %256 — the same sparse-perturbation scheme as the image
    * (`variantPngPayload`) and audio (`variantWavBytes`) generators:
    * big enough to change bytes, sparse enough that the TEMPORAL
    * sign fingerprint of two variants stays within a small hamming
    * distance. The per-frame luma base rides `frameOffset` (the
    * audio generator's avalanche chain) rather than a linear g*a+f*b
    * form: a linear base collapses to its value mod 256, leaving only
    * 256 distinct temporal patterns corpus-wide and flooding the LSH
    * with cross-group collisions — the avalanche makes unrelated
    * groups' fingerprints independent 56-bit draws. Chroma planes
    * stay g-keyed (the fingerprint reads only Y, but a plane-size bug
    * still desynchronizes the decode).
    */
  def variantY4mPayload(g: Long, v: Int, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"C420 needs positive even dims, got ${w}x$h")
    require(frames > 0, s"frames must be positive, got $frames")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames * (marker.length + ySize + 2 * cSize))
    out.write(header)
    var f = 0
    while (f < frames) {
      out.write(marker)
      val off = frameOffset(g, f) % 256L
      var k = 0
      while (k < ySize) {
        val bump = if ((f.toLong * ySize + k) % 128 == v) 16L else 0L
        out.write(((off + k * 13 + bump) % 256).toInt)
        k += 1
      }
      k = 0
      while (k < cSize) { out.write(((g * 11 + f * 17 + k * 7) % 256).toInt); k += 1 }
      k = 0
      while (k < cSize) { out.write(((g * 13 + f * 19 + k * 5) % 256).toInt); k += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** 56-bit temporal sign hash of a DECODED Y4M clip — the video twin
    * of `audioSignHash56`: the clip must decode to exactly 60 frames,
    * per-frame luma SUMS (exact integers out of `y4mFrameStats`, no
    * float division anywhere) split into 4 runs of 15, and bit
    * r*14+c set when run r's frame c+1 is brighter than frame c. 14
    * comparisons per run x 4 runs = 56 bits; brightness-shift robust
    * (a constant luma offset cancels in every comparison) — which is
    * exactly what byte-exact hashes are NOT.
    */
  def videoSignHash56(bytes: Array[Byte]): Long = {
    val (_, _, sums) = y4mFrameStats(bytes)
    require(sums.length == 60,
      s"videoSignHash56 needs exactly 60 frames, got ${sums.length}")
    var hash = 0L
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 14) {
        if (sums(r * 15 + c + 1) > sums(r * 15 + c)) hash |= 1L << (r * 14 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Partition-wise video fingerprint decode: (id, vhash LONG). */
  def decodeVideoHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode: Array[Byte] => Long = videoSignHash56
        rows.map { case (id, bytes) => (id, decode(bytes)) }
      }
      .toDF("id", "vhash")
  }

  /** REAL video decode: parse a YUV4MPEG2 payload directly from its
    * bytes — the stream-header tag list (W/H/F mandatory semantics,
    * C colorspace driving the per-frame plane sizes, I/A/X ignored as
    * the spec allows), then each `FRAME` marker line (optional frame
    * parameters tolerated) followed by the raw planar raster. Returns
    * (width, height, frame count, mean LUMA) — the mean is over the Y
    * planes only, which is what makes this a parse and not a byte
    * average: chroma planes and markers are skipped by their computed
    * sizes, and any mis-size desynchronizes the next marker check.
    * Truncated rasters, odd dims under subsampling, unknown
    * colorspaces, and zero-frame streams all fail loudly.
    */
  def y4mDecoder(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val (w, h, sums) = y4mFrameStats(bytes)
    // aggregate mean from per-frame integer sums — bit-identical to
    // summing all Y bytes directly (integer addition is exact)
    (w, h, sums.length, sums.sum.toDouble / (sums.length.toLong * w * h))
  }

  /** Per-frame decode of a YUV4MPEG2 payload: (width, height, per-frame
    * LUMA SUMS). The exact-integer per-frame sums are the primitive
    * both [[y4mDecoder]] (aggregate mean) and [[sampleFrames]]
    * (per-frame features) divide down from — one double division each,
    * so both stay bit-exact against closed-form oracles. Parsing
    * discipline as documented on [[y4mDecoder]]: computed plane sizes,
    * loud failure on any desynchronization.
    */
  def y4mFrameStats(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    var i = 0
    def line(): String = {
      val s = i
      while (i < bytes.length && bytes(i) != '\n') i += 1
      require(i < bytes.length, "truncated Y4M header line")
      val str = new String(bytes, s, i - s, "US-ASCII")
      i += 1
      str
    }
    val hdr = line()
    require(hdr == "YUV4MPEG2" || hdr.startsWith("YUV4MPEG2 "),
      s"not a Y4M payload: ${hdr.take(16)}")
    var w = -1
    var h = -1
    var cs = "420jpeg" // the spec's default when no C tag is present
    hdr.split(' ').drop(1).foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.tail.toInt
        case 'H' => h = t.tail.toInt
        case 'F' => // validated for shape; rate doesn't affect plane sizes
          val p = t.tail.split(':')
          require(p.length == 2 && p(0).toInt > 0 && p(1).toInt > 0,
            s"bad Y4M frame rate: $t")
        case 'C' => cs = t.tail
        case _ => () // I (interlace), A (aspect), X (extension): no effect
      }
    }
    require(w > 0 && h > 0, s"bad Y4M dimensions: ${w}x$h")
    val cSize =
      if (cs.startsWith("420")) {
        require(w % 2 == 0 && h % 2 == 0, s"C$cs needs even dims, got ${w}x$h")
        (w / 2) * (h / 2)
      } else if (cs.startsWith("422")) {
        require(w % 2 == 0, s"C$cs needs even width, got $w")
        (w / 2) * h
      } else if (cs.startsWith("444")) w * h
      else if (cs == "mono") 0
      else throw new IllegalArgumentException(s"unsupported Y4M colorspace: C$cs")
    val ySize = w * h
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (i < bytes.length) {
      val fl = line()
      require(fl == "FRAME" || fl.startsWith("FRAME "),
        s"bad Y4M frame marker at byte $i")
      require(bytes.length - i >= ySize + 2 * cSize,
        s"Y4M frame ${sums.length} raster truncated: ${bytes.length - i} < ${ySize + 2 * cSize}")
      var sum = 0L
      var k = 0
      while (k < ySize) { sum += bytes(i + k) & 0xff; k += 1 }
      sums += sum
      i += ySize + 2 * cSize
    }
    require(sums.nonEmpty, "Y4M stream has no frames")
    (w, h, sums.toArray)
  }

  /** Partition-wise video decode — same batch shape as [[decodeImages]]
    * / [[decodeAudio]]: one decoder per partition, streamed rows; a
    * JNI/ffmpeg decoder for compressed formats plugs in as `decoder`.
    */
  def decodeVideos(df: DataFrame, idCol: String, binCol: String,
                   decoder: Array[Byte] => (Int, Int, Int, Double) = y4mDecoder): Dataset[DecodedVideo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode = decoder
        rows.map { case (id, bytes) =>
          val (w, h, n, luma) = decode(bytes)
          DecodedVideo(id, bytes.length, w, h, n, luma)
        }
      }
  }

  /** Scene-structured Y4M generator for shot-boundary detection: frame
    * f ≥ 1 opens a new scene when `frameOffset(id·3+1, f) % 5 == 0`
    * (~5-frame expected shots), and every frame of scene s renders one
    * FLAT-motion raster keyed by `frameOffset(id, 971+s)` — so the
    * decoded per-frame luma sums are piecewise constant and jump
    * exactly at the planted cuts. Same avalanche-chain reasoning as
    * [[variantY4mPayload]] (a linear scene base would collapse to 256
    * patterns corpus-wide); chroma planes stay id-keyed noise the luma
    * path must skip by computed size. Everything is closed form, so an
    * engine without the codec recomputes the decoded sums exactly.
    */
  def sceneY4mPayload(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"C420 needs positive even dims, got ${w}x$h")
    require(frames > 0, s"frames must be positive, got $frames")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames * (marker.length + ySize + 2 * cSize))
    out.write(header)
    var scene = 0L
    var f = 0
    while (f < frames) {
      if (f >= 1 && frameOffset(id * 3 + 1, f) % 5 == 0) scene += 1
      out.write(marker)
      val off = frameOffset(id, (971 + scene).toInt) % 256L
      var k = 0
      while (k < ySize) { out.write(((off + k * 13) % 256).toInt); k += 1 }
      k = 0
      while (k < cSize) { out.write(((id * 11 + f * 17 + k * 7) % 256).toInt); k += 1 }
      k = 0
      while (k < cSize) { out.write(((id * 13 + f * 19 + k * 5) % 256).toInt); k += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Partition-wise per-frame video decode: one (id, f, e) row per
    * frame with e the exact-integer luma sum from [[y4mFrameStats]] —
    * the primitive shot-boundary detection differences. Row count is
    * clips × frames; the decode is one streamed pass per partition.
    */
  def decodeFrameSums(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (_, _, sums) = y4mFrameStats(bytes)
        sums.iterator.zipWithIndex.map { case (e, f) => (id, f, e) }
      })
      .toDF("id", "f", "e")
  }

  /** Voice-activity-structured WAV generator: frame f (of `flen`
    * samples) is VOICED when `frameOffset(id·7+3, f) % 4 != 0` (~75%
    * duty cycle in hash-seeded runs). Voiced frames ramp the full
    * 16-bit triangle domain from a per-(id, f) avalanche offset
    * ([[frameOffset]] — same non-algebraic-mixing requirement as
    * [[variantWavBytes]]); silent frames carry low-order comfort noise
    * `j % 64` (|sample| ≤ 63, so worst-case voiced frame energy ~107k
    * vs exactly 4528 silent at flen = 160 — an order of magnitude of
    * threshold headroom on both sides). A REAL canonical WAV;
    * everything closed form for the oracle.
    */
  def vadWavPayload(id: Long, frames: Int, flen: Int, rate: Int): Array[Byte] = {
    require(frames > 0 && flen > 0, s"bad geometry: $frames x $flen")
    val n = frames * flen
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(rate).putInt(rate * 2)              // rate, byte rate
      .putShort(2).putShort(16)                   // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var f = 0
    while (f < frames) {
      val voiced = frameOffset(id * 7 + 3, f) % 4 != 0
      val off = frameOffset(id, f)
      var j = 0
      while (j < flen) {
        val v = if (voiced) (off + j * 17L) % 65536L else (j % 64).toLong
        buf.putShort(v.toShort)
        j += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Per-frame PCM energies of a decoded WAV: Σ|sample| over each of
    * `frames` equal frames — exact longs, the primitive both
    * [[audioSignHash56]] (sign comparisons) and voice-activity
    * segmentation (threshold + islands) consume.
    */
  def pcmFrameEnergies(bytes: Array[Byte], frames: Int): Array[Long] = {
    val (_, _, dataOff, nSamples) = wavDataSection(bytes)
    require(nSamples > 0 && nSamples % frames == 0,
      s"pcmFrameEnergies needs a multiple of $frames samples, got $nSamples")
    val flen = nSamples / frames
    def le16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    Array.tabulate(frames) { f =>
      var s = 0L
      var k = f * flen
      val end = k + flen
      while (k < end) { s += math.abs(le16(dataOff + 2 * k).toShort.toLong); k += 1 }
      s
    }
  }

  /** Partition-wise per-frame audio-energy decode: (id, f, e) rows
    * from [[pcmFrameEnergies]] — the audio twin of [[decodeFrameSums]].
    */
  def decodeAudioEnergies(df: DataFrame, idCol: String, binCol: String,
                          frames: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        pcmFrameEnergies(bytes, frames).iterator.zipWithIndex
          .map { case (e, f) => (id, f, e) }
      })
      .toDF("id", "f", "e")
  }
}
