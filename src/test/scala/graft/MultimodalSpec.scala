package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val media = Seq(
    (1L, "a tiny fake image payload"),
    (2L, ""),
    (3L, "another payload with more bytes in it than the first one")
  ).toDF("id", "raw").select(col("id"), Multimodal.payload(col("raw")).as("bin"))

  test("imageMeta sniffs the container from magic bytes, dims from the real decode") {
    val png = Multimodal.pngPayload(5L, 7, 3)
    val bmp = Multimodal.bmpIoPayload(6L, 2, 9)
    assert(Multimodal.imageMeta(png) === ("png", 7, 3))
    assert(Multimodal.imageMeta(bmp) === ("bmp", 2, 9))
    // the sniff reads MAGIC, not an extension or side channel: garbage
    // and too-short payloads fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.imageMeta("not an image payload".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.imageMeta(Array[Byte](1, 2))
    }
    // a JPEG magic with an undecodable body must not yield meta
    intercept[Exception] {
      Multimodal.imageMeta(Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte))
    }
  }

  test("resize planning halves the long side to maxSide, keeps aspect, floors at 1") {
    val m = Seq((1L, 64, 32), (2L, 10, 20), (3L, 1, 100)).toDF("id", "width", "height")
      .select(col("id"), struct(col("width"), col("height")).as("meta"))
    val rs = m.select(col("id"), Multimodal.resizedMeta(col("meta"), 32).as("r"))
      .select("id", "r.width", "r.height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rs(1L) === (32, 16))   // 64×32 → 32×16
    assert(rs(2L) === (10, 20))   // already within bound — untouched
    assert(rs(3L) === (1, 32))    // 1×100 → floor(0.32)=0 clamped to 1 × 32
  }

  test("frame sampling decodes per-frame luma from the Y4M raster, stride sampling") {
    val vids = Seq(
      (1L, Multimodal.y4mPayload(1L, 4, 2, 5)),
      (2L, Multimodal.y4mPayload(2L, 2, 2, 1))
    ).toDF("id", "bin")
    val rows = Multimodal.sampleFrames(vids, "id", "bin", every = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(0, 2, 4),
      "stride 2 over 5 frames samples 0, 2, 4")
    assert(rows.filter(_._1 == 2L).map(_._2).toSeq === Seq(0))
    // the feature is the frame's REAL mean luma: generator closed form
    // for id=1, frame 2, over the 4x2 Y plane
    val expect = (0 until 8).map(k => (1 * 7 + 2 * 31 + k * 13) % 256)
      .sum.toDouble / 8
    assert(rows.find(r => r._1 == 1L && r._2 == 2).get._3 === expect)
  }

  test("partition-wise decode: typed output, JDK codec default, custom decoder plugs in") {
    val imgs = Seq(
      (1L, Multimodal.pngPayload(1L, 3, 2)),
      (2L, Multimodal.bmpIoPayload(2L, 4, 4))
    ).toDF("id", "bin")
    val decoded = Multimodal.decodeImages(imgs, "id", "bin")
      .collect().map(d => d.id -> d).toMap
    assert(decoded(1L).width === 3 && decoded(1L).height === 2)
    assert(decoded(2L).width === 4 && decoded(2L).height === 4)
    // both containers are lossless: decoded mean equals the
    // generator's closed form exactly
    assert(decoded(1L).mean_luma === Multimodal.testPixelsMean(1L, 3, 2))
    assert(decoded(2L).mean_luma === Multimodal.testPixelsMean(2L, 4, 4))
    // custom decoder plugs in per-partition
    val custom = Multimodal.decodeImages(imgs, "id", "bin",
      bytes => (7, 9, 1.5)).collect()
    assert(custom.forall(d => d.width === 7 && d.height === 9 && d.mean_luma === 1.5))
  }

  test("ppmDecoder parses a real binary P6 payload: dims and luma from the bytes") {
    // 2×2 P6 with a header comment and raw (non-UTF8-safe) raster bytes
    val header = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array(0, 255, 128, 7, 200, 13, 254, 1, 99, 42, 180, 220)
      .map(_.toByte)
    val (w, h, luma) = Multimodal.ppmDecoder(header ++ raster)
    assert((w, h) === (2, 2))
    val expect = raster.map(b => (b & 0xff).toDouble).sum / 12
    assert(math.abs(luma - expect) < 1e-12)
    // and through the distributed mapPartitions path
    val df = Seq((1L, header ++ raster)).toDF("id", "bin")
    val d = Multimodal.decodeImages(df, "id", "bin", Multimodal.ppmDecoder).collect()(0)
    assert((d.width, d.height) === (2, 2))
    assert(math.abs(d.mean_luma - expect) < 1e-12)
    // truncated raster must fail loudly, not decode garbage
    intercept[Exception] {
      Multimodal.ppmDecoder(header ++ raster.take(5))
    }
  }

  test("bmpDecoder round-trips bmpPayload, including 4-byte row padding") {
    // w=3 → rows pad by 3; w=4 → no pad; w=1 → pad 1: the mean must skip
    // every padding byte or it silently dilutes
    val cases = Seq((7L, 3, 2), (8L, 4, 1), (9L, 1, 5))
    val rows = cases.toDF("id", "w", "h")
      .select(col("id"), col("w"), col("h"),
        Multimodal.bmpPayload(col("id"), col("w"), col("h")).as("payload"))
      .collect()
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val bytes = r.getAs[Array[Byte]](3)
      val rowSize = ((w * 3 + 3) / 4) * 4
      assert(bytes.length === 54 + rowSize * h, s"file size for ${w}x$h")
      val (dw, dh, mean) = Multimodal.bmpDecoder(bytes)
      assert((dw, dh) === (w, h))
      val n = w * h * 3
      val want = (0 until n).map(k => ((id * 7 + k * 13) % 256).toDouble).sum / n
      assert(math.abs(mean - want) < 1e-12, s"mean for id=$id ${w}x$h")
    }
    // and through the distributed mapPartitions path
    val d = Multimodal.decodeImages(
        cases.toDF("id", "w", "h").select(col("id"),
          Multimodal.bmpPayload(col("id"), col("w"), col("h")).as("bin")),
        "id", "bin", Multimodal.bmpDecoder)
      .collect().map(x => x.id -> (x.width, x.height)).toMap
    assert(d === Map(7L -> (3, 2), 8L -> (4, 1), 9L -> (1, 5)))
  }

  test("bmpDecoder rejects non-BMP and unsupported variants loudly") {
    intercept[Exception](Multimodal.bmpDecoder(Array.empty[Byte]))
    intercept[Exception](Multimodal.bmpDecoder("P6\n2 2\n255\n".getBytes("US-ASCII")))
    val good = Seq((1L, 2, 2)).toDF("id", "w", "h")
      .select(Multimodal.bmpPayload(col("id"), col("w"), col("h")).as("p"))
      .collect()(0).getAs[Array[Byte]](0)
    // truncated raster
    intercept[IllegalArgumentException](Multimodal.bmpDecoder(good.take(60)))
    // 8bpp variant (patch the bpp field)
    val bpp8 = good.clone(); bpp8(28) = 8
    intercept[IllegalArgumentException](Multimodal.bmpDecoder(bpp8))
    // compressed variant (patch the compression field)
    val rle = good.clone(); rle(30) = 1
    intercept[IllegalArgumentException](Multimodal.bmpDecoder(rle))
  }

  test("wavDecoder round-trips wavPayload: header fields, frames, signed-sample mean") {
    val cases = Seq((5L, 1, 8000), (6L, 7, 22050), (7L, 32, 44100))
    val rows = cases.toDF("id", "n", "rate")
      .select(col("id"), col("n"), col("rate"),
        Multimodal.wavPayload(col("id"), col("n"), col("rate")).as("payload"))
      .collect()
    rows.foreach { r =>
      val (id, n, rate) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val bytes = r.getAs[Array[Byte]](3)
      assert(bytes.length === 44 + n * 2, s"file size for id=$id n=$n")
      val (dRate, dCh, dFrames, dMean) = Multimodal.wavDecoder(bytes)
      assert((dRate, dCh, dFrames) === (rate, 1, n))
      // mean of the sign-extended generator samples
      val want = (0 until n).map { k =>
        val u = ((id * 31 + k * 17) % 65536).toInt
        (if (u >= 32768) u - 65536 else u).toDouble
      }.sum / n
      assert(math.abs(dMean - want) < 1e-12, s"mean for id=$id n=$n")
    }
    // and through the distributed partition-wise path
    val d = Multimodal.decodeAudio(
        cases.toDF("id", "n", "rate").select(col("id"),
          Multimodal.wavPayload(col("id"), col("n"), col("rate")).as("bin")),
        "id", "bin")
      .collect().map(x => x.id -> (x.sample_rate, x.n_channels, x.n_samples)).toMap
    assert(d === Map(5L -> (8000, 1, 1), 6L -> (22050, 1, 7), 7L -> (44100, 1, 32)))
  }

  test("wavDecoder walks chunks: unknown chunks skipped, odd sizes padded, any order") {
    def ascii(s: String) = s.getBytes("US-ASCII")
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(16000) ++
      le32(64000) ++ le16(4) ++ le16(16)
    // samples: stereo frames (-3, 5), (100, -100) → mean = 2.0/4 = 0.5
    val data = ascii("data") ++ le32(8) ++ le16(-3 & 0xffff) ++ le16(5) ++
      le16(100) ++ le16(-100 & 0xffff)
    // odd-size unknown chunk (3 bytes + 1 pad) between fmt and data
    val junk = ascii("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0)
    val body = fmt ++ junk ++ data
    val wav = ascii("RIFF") ++ le32(4 + body.length) ++ ascii("WAVE") ++ body
    val (rate, ch, frames, mean) = Multimodal.wavDecoder(wav)
    assert((rate, ch, frames) === (16000, 2, 2))
    assert(math.abs(mean - 0.5) < 1e-12)
  }

  test("wavDecoder rejects non-WAV and unsupported variants loudly") {
    intercept[Exception](Multimodal.wavDecoder(Array.empty[Byte]))
    intercept[Exception](Multimodal.wavDecoder("BM not a wav".getBytes("US-ASCII")))
    val good = Seq((1L, 4, 8000)).toDF("id", "n", "rate")
      .select(Multimodal.wavPayload(col("id"), col("n"), col("rate")).as("p"))
      .collect()(0).getAs[Array[Byte]](0)
    // truncated data chunk
    intercept[IllegalArgumentException](Multimodal.wavDecoder(good.take(48)))
    // non-PCM format tag (offset 20 = fmt body start)
    val alaw = good.clone(); alaw(20) = 6
    intercept[IllegalArgumentException](Multimodal.wavDecoder(alaw))
    // 8-bit variant (bits-per-sample at offset 34)
    val bits8 = good.clone(); bits8(34) = 8
    intercept[IllegalArgumentException](Multimodal.wavDecoder(bits8))
    // data size not frame-aligned: claim 3 bytes of data
    val odd = good.clone(); odd(40) = 3
    intercept[IllegalArgumentException](Multimodal.wavDecoder(odd))
  }

  test("qoiDecoder round-trips qoiEncode across the op set; compression is real") {
    val cases = Seq((3L, 9, 7), (11L, 1, 1), (255L, 8, 8), (1000000L, 5, 9))
    cases.foreach { case (id, w, h) =>
      val bytes = Multimodal.qoiPayload(id, w, h)
      val (dw, dh, mean) = Multimodal.qoiDecoder(bytes)
      assert((dw, dh) === (w, h), s"dims for id=$id")
      val want = (0 until w * h).map { k =>
        val j = k / 4
        ((id * 7 + j * 13) % 256 + (id * 11 + j * 17) % 256 +
          (id * 13 + j * 19) % 256).toDouble
      }.sum / (w * h * 3)
      assert(math.abs(mean - want) < 1e-12, s"mean for id=$id ${w}x$h")
    }
    // groups of 4 equal pixels must make RUN ops fire: the stream must
    // be smaller than one literal RGB chunk per pixel
    val big = Multimodal.qoiPayload(3L, 8, 8)
    assert(big.length < 14 + 8 + 64 * 4, s"no compression happened: ${big.length} bytes")
    // and through the distributed partition-wise path
    import org.apache.spark.sql.functions.col
    val df = Seq((3L, Multimodal.qoiPayload(3L, 9, 7))).toDF("id", "bin")
    val d = Multimodal.decodeImages(df, "id", "bin", Multimodal.qoiDecoder).collect()(0)
    assert((d.width, d.height) === (9, 7))
  }

  test("qoiDecoder handles hand-built RGBA/INDEX/DIFF/RUN chunks from a foreign encoder") {
    def u32be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val header = "qoif".getBytes("US-ASCII") ++ u32be(2) ++ u32be(3) ++ Array(4.toByte, 0.toByte)
    val chunks = Array[Byte](
      0xfe.toByte, 10, 20, 30,              // RGB   (10,20,30)    px 0
      (0x40 | (3 << 4) | (3 << 2) | 3).toByte, // DIFF +1+1+1 → (11,21,31) px 1
      0xff.toByte, 10, 20, 30, 100.toByte,  // RGBA  (10,20,30,100) px 2
      ((10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64).toByte, // INDEX → (10,20,30,255) px 3
      (0xc0 | 1).toByte                     // RUN 2 → two more (10,20,30) px 4,5
    )
    val marker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    val (w, h, mean) = Multimodal.qoiDecoder(header ++ chunks ++ marker)
    assert((w, h) === (2, 3))
    val want = (60.0 + 63.0 + 60.0 + 60.0 + 60.0 + 60.0) / (6 * 3)
    assert(math.abs(mean - want) < 1e-12)
  }

  test("qoiDecoder rejects non-QOI, truncated streams, and pixel overruns loudly") {
    intercept[Exception](Multimodal.qoiDecoder(Array.empty[Byte]))
    intercept[Exception](Multimodal.qoiDecoder("RIFFxxxxWAVE".getBytes("US-ASCII") ++ new Array[Byte](10)))
    val good = Multimodal.qoiPayload(3L, 4, 4)
    intercept[IllegalArgumentException](Multimodal.qoiDecoder(good.take(good.length - 9)))
    // a run overrunning the pixel count must fail, not silently truncate
    def u32be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val tiny = "qoif".getBytes("US-ASCII") ++ u32be(1) ++ u32be(2) ++ Array(3.toByte, 0.toByte) ++
      Array[Byte](0xfe.toByte, 1, 2, 3, (0xc0 | 5).toByte) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    intercept[IllegalArgumentException](Multimodal.qoiDecoder(tiny))
  }

  test("P3 synthesis → column parse → JVM decoder all agree on the same bytes") {
    val src = Seq((3L, 4), (10L, 1)).toDF("id", "n")
    val pay = src.select(col("id"),
      Multimodal.ppmPayload(col("id"), col("n"), lit(2)).as("payload"))
    val viaCols = pay
      .withColumn("m", Multimodal.ppmHeaderMeta(col("payload")))
      .select(col("id"), col("m.width").as("w"), col("m.height").as("h"),
        Multimodal.ppmMeanLuma(col("payload"), col("m.width"), col("m.height")).as("luma"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val viaJvm = pay.collect().map { r =>
      r.getLong(0) -> Multimodal.ppmDecoder(r.getString(1).getBytes("US-ASCII"))
    }.toMap
    assert(viaCols === viaJvm)
    assert(viaCols(3L)._1 === 4 && viaCols(3L)._2 === 2)
  }

  test("imageIoDecoder: PNG round-trips losslessly, GIF decodes, garbage rejected") {
    // PNG (lossless): decoded stats equal the generator's closed form
    for (id <- Seq(0L, 7L, 123L); (w, h) <- Seq((1, 1), (5, 3), (9, 9))) {
      val (gw, gh, mean) = Multimodal.imageIoDecoder(Multimodal.pngPayload(id, w, h))
      assert((gw, gh) === (w, h))
      assert(mean === Multimodal.testPixelsMean(id, w, h), s"id=$id ${w}x$h")
    }
    // the same decoder reads GIF — ImageIO sniffs the container
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB),
      "gif", bos)
    val (gw, gh, _) = Multimodal.imageIoDecoder(bos.toByteArray)
    assert((gw, gh) === (6, 4))
    // non-image bytes fail loudly, not with fabricated dimensions
    intercept[IllegalArgumentException] {
      Multimodal.imageIoDecoder("definitely not an image".getBytes)
    }
  }

  test("auUlawDecoder: JDK expansion == 4x textbook G.711 over ALL 256 codes") {
    // one payload containing every mu-law code once; the decoded mean
    // must equal the closed-form mean — which only holds if every
    // single code expands to exactly 4x the textbook value
    val codes = Array.tabulate(256)(identity)
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(256)
    d.writeInt(1); d.writeInt(8000); d.writeInt(1)
    codes.foreach(d.write)
    def expand(c: Int): Long = {
      val u = (~c) & 0xff
      val sign = if ((u & 0x80) != 0) -1 else 1
      val e = (u >> 4) & 7; val m = u & 0xf
      4L * sign * ((((m << 1) + 33) << e) - 33)
    }
    val (rate, ch, n, mean) = Multimodal.auUlawDecoder(bos.toByteArray)
    assert((rate, ch, n) === (8000, 1, 256))
    assert(mean === codes.map(expand).sum.toDouble / 256)
    // non-audio bytes are rejected loudly, not decoded into garbage
    intercept[Exception] {
      Multimodal.auUlawDecoder("definitely not an AU stream".getBytes)
    }
  }

  test("jpeg decode: dimensions exact, mean within the calibrated bound") {
    for (id <- Seq(1L, 42L, 999L)) {
      val (w, h) = (8 + (id % 9).toInt, 8 + ((id / 9) % 9).toInt)
      val (gw, gh, mean) = Multimodal.imageIoDecoder(Multimodal.jpegPayload(id, w, h))
      assert((gw, gh) === (w, h))
      assert(math.abs(mean - Multimodal.testPixelsMean(id, w, h)) <= 4.0, s"id=$id")
    }
  }

  test("y4mDecoder round-trips y4mPayload: dims, frame count, luma from the bytes") {
    for (id <- Seq(3L, 77L); frames <- Seq(1, 3)) {
      val (w, h) = (4, 6)
      val (gw, gh, gn, luma) = Multimodal.y4mDecoder(Multimodal.y4mPayload(id, w, h, frames))
      assert((gw, gh, gn) === (w, h, frames))
      // the generator's closed form over the Y planes only
      val expected = (0 until frames).flatMap(f =>
        (0 until w * h).map(k => (id * 7 + f * 31 + k * 13) % 256)).sum.toDouble /
        (frames * w * h)
      assert(luma === expected, s"id=$id frames=$frames")
    }
  }

  test("y4mDecoder sizes chroma planes from the C tag (422, 444, mono)") {
    // hand-built foreign streams: 2x2, one frame, luma bytes all 100 —
    // if the decoder mis-sized the chroma skip it would read chroma as
    // the next marker (or run off the end) and throw, never return 100
    def stream(cTag: String, chromaBytes: Int): Array[Byte] = {
      val hdr = s"YUV4MPEG2 W2 H2 F30:1$cTag\nFRAME\n".getBytes("US-ASCII")
      hdr ++ Array.fill(4)(100.toByte) ++ Array.fill(chromaBytes)(7.toByte)
    }
    assert(Multimodal.y4mDecoder(stream(" C422", 2 * 2)) === ((2, 2, 1, 100.0)))
    assert(Multimodal.y4mDecoder(stream(" C444", 2 * 4)) === ((2, 2, 1, 100.0)))
    assert(Multimodal.y4mDecoder(stream(" Cmono", 0)) === ((2, 2, 1, 100.0)))
    // no C tag → the spec's 420 default (1 chroma byte per plane at 2x2)
    assert(Multimodal.y4mDecoder(stream("", 2)) === ((2, 2, 1, 100.0)))
    // FRAME parameters after the marker are tolerated per spec
    val withParams = ("YUV4MPEG2 W2 H2 F30:1 C444\nFRAME Xfoo\n".getBytes("US-ASCII")
      ++ Array.fill(12)(100.toByte))
    assert(Multimodal.y4mDecoder(withParams) === ((2, 2, 1, 100.0)))
  }

  test("y4mDecoder rejects malformed streams loudly") {
    val good = Multimodal.y4mPayload(5L, 4, 4, 2)
    // wrong magic
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder("YUV4MPEG3 W4 H4\nFRAME\n".getBytes ++ Array.fill(24)(0.toByte))
    }
    // truncated raster: chop the last frame's tail
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder(good.dropRight(5))
    }
    // missing dims, odd dims under 420 subsampling, unknown colorspace,
    // zero frames, garbage frame marker
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder("YUV4MPEG2 W4\nFRAME\n".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder("YUV4MPEG2 W3 H4\nFRAME\n".getBytes ++ Array.fill(18)(0.toByte))
    }
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder("YUV4MPEG2 W2 H2 C411\nFRAME\n".getBytes ++ Array.fill(6)(0.toByte))
    }
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder("YUV4MPEG2 W2 H2\n".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.y4mDecoder("YUV4MPEG2 W2 H2\nFRAM\n".getBytes ++ Array.fill(6)(0.toByte))
    }
    // the generator itself refuses odd dims (C420 is what it writes)
    intercept[IllegalArgumentException] { Multimodal.y4mPayload(1L, 3, 4, 1) }
  }

  test("dhash56 of the decoded PNG equals the closed-form hash of the generator") {
    import graft.multimodal.Multimodal
    def closedForm(g: Long, v: Int): Long = {
      def lum(k: Int): Int = {
        val bump = if (k % 16 == v) 64L else 0L
        (((g * 7 + k * 13 + bump) % 256) + ((g * 11 + k * 17 + bump) % 256) +
          ((g * 13 + k * 19 + bump) % 256)).toInt
      }
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (lum(y * 8 + x + 1) > lum(y * 8 + x)) h |= 1L << (y * 7 + x)
      h
    }
    for (g <- Seq(0L, 3L, 117L); v <- Seq(0, 2)) {
      val viaCodec = Multimodal.dhash56(Multimodal.variantPngPayload(g, v, 8, 8))
      assert(viaCodec === closedForm(g, v), s"(g=$g, v=$v)")
    }
    // same-group variants sit close; different groups sit far
    def hm(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hm(closedForm(5L, 0), closedForm(5L, 1)) <= 10)
    assert(hm(closedForm(5L, 0), closedForm(100L, 0)) >= 8)
  }

  test("dhash56 refuses rasters smaller than the hash grid") {
    import graft.multimodal.Multimodal
    intercept[IllegalArgumentException] {
      Multimodal.dhash56(Multimodal.variantPngPayload(1L, 0, 4, 4))
    }
  }
}
