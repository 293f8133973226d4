package graft

import graft.multimodal.Multimodal

class VideoHashSpec extends SparkTestBase {

  /** Closed-form twin of the generator+decoder chain: what the DuckDB
    * oracle computes, reimplemented independently of the byte path.
    */
  private def expectedHash(g: Long, v: Int): Long = {
    val ySize = 16 // the q241 geometry: 4x4 luma plane, 60 frames
    val e = Array.tabulate(60) { f =>
      val off = { // murmur-ish mix, restated independently of Multimodal
        val M = 2147483648L
        var h = (g * 60 + f + 1) % M
        h = h * 2654435761L % M
        h ^= h >> 15
        h = h * 1540483477L % M
        h ^= h >> 13
        h % 65536L % 256L
      }
      (0 until ySize).map { k =>
        val bump = if ((f.toLong * ySize + k) % 128 == v) 16L else 0L
        (off + k * 13L + bump) % 256L
      }.sum
    }
    var h = 0L
    for (r <- 0 until 4; c <- 0 until 14)
      if (e(r * 15 + c + 1) > e(r * 15 + c)) h |= 1L << (r * 14 + c)
    h
  }

  test("decoded-luma temporal hash equals the generator's closed form") {
    for (g <- Seq(0L, 1L, 7L, 123L); v <- Seq(0, 3)) {
      val bytes = Multimodal.variantY4mPayload(g, v, 4, 4, 60)
      assert(Multimodal.videoSignHash56(bytes) === expectedHash(g, v),
        s"hash mismatch for g=$g v=$v")
    }
  }

  test("variant payload is a real Y4M: y4mFrameStats round-trips geometry") {
    val (w, h, sums) = Multimodal.y4mFrameStats(
      Multimodal.variantY4mPayload(5L, 2, 4, 4, 60))
    assert((w, h, sums.length) === (4, 4, 60))
  }

  test("same-group variants sit a few bits apart; distinct groups far apart") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def hash(g: Long, v: Int) =
      Multimodal.videoSignHash56(Multimodal.variantY4mPayload(g, v, 4, 4, 60))
    val within = for (g <- 0L until 20L; v <- 1 to 3)
      yield ham(hash(g, 0), hash(g, v))
    val across = for (g <- 0L until 20L)
      yield ham(hash(g, 0), hash(g + 1, 0))
    assert(within.max <= 6, s"within-group hamming too large: ${within.max}")
    assert(across.min > 6, s"cross-group hamming too small: ${across.min}")
  }

  test("hash requires exactly 60 decoded frames") {
    val bytes = Multimodal.variantY4mPayload(1L, 0, 4, 4, 59)
    intercept[IllegalArgumentException](Multimodal.videoSignHash56(bytes))
  }
}
