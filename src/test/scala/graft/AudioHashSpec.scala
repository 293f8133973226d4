package graft

import graft.multimodal.Multimodal

class AudioHashSpec extends SparkTestBase {

  /** Closed-form twin of the generator+decoder chain: what the DuckDB
    * oracle computes, reimplemented independently of the byte path.
    */
  private def expectedHash(g: Long, v: Int, n: Int): Long = {
    val flen = n / 60
    val e = Array.tabulate(60) { f =>
      val off = { // murmur-ish mix, restated independently of Multimodal
        val M = 2147483648L
        var h = (g * 60 + f + 1) % M
        h = h * 2654435761L % M
        h ^= h >> 15
        h = h * 1540483477L % M
        h ^= h >> 13
        h % 65536L
      }
      (0 until flen).map { j =>
        val bump = if ((f * flen + j) % 128 == v) 512L else 0L
        val m = (off + j * 17L + bump) % 65536L
        math.abs(if (m >= 32768) m - 65536 else m)
      }.sum
    }
    var h = 0L
    for (r <- 0 until 4; c <- 0 until 14)
      if (e(r * 15 + c + 1) > e(r * 15 + c)) h |= 1L << (r * 14 + c)
    h
  }

  test("decoded-PCM sign hash equals the generator's closed form") {
    for (g <- Seq(0L, 1L, 7L, 123L); v <- Seq(0, 3)) {
      val n = (((g * 7) % 6).toInt + 2) * 60
      val bytes = Multimodal.variantWavBytes(g, v, n, 8000)
      assert(Multimodal.audioSignHash56(bytes) === expectedHash(g, v, n),
        s"hash mismatch for g=$g v=$v")
    }
  }

  test("variant payload is a real WAV: wavDecoder round-trips rate/frames") {
    val bytes = Multimodal.variantWavBytes(5L, 2, 240, 8000)
    val (rate, channels, frames, _) = Multimodal.wavDecoder(bytes)
    assert((rate, channels, frames) === (8000, 1, 240))
  }

  test("same-group variants sit a few bits apart; distinct groups far apart") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val within = for (g <- 0L until 20L; v <- 1 to 3) yield {
      val n = (((g * 7) % 6).toInt + 2) * 60
      ham(Multimodal.audioSignHash56(Multimodal.variantWavBytes(g, 0, n, 8000)),
        Multimodal.audioSignHash56(Multimodal.variantWavBytes(g, v, n, 8000)))
    }
    // g and g+6 always share a stream length ((g*7)%6 == g%6), so the
    // cross-group comparison is length-matched by construction
    val across = for (g <- 0L until 14L) yield {
      val n = (((g * 7) % 6).toInt + 2) * 60
      ham(Multimodal.audioSignHash56(Multimodal.variantWavBytes(g, 0, n, 8000)),
        Multimodal.audioSignHash56(Multimodal.variantWavBytes(g + 6, 0, n, 8000)))
    }
    assert(within.max <= 6, s"within-group hamming too large: ${within.max}")
    assert(across.min > 6, s"cross-group hamming too small: ${across.min}")
  }

  test("hash requires frame-aligned sample counts") {
    val bytes = Multimodal.variantWavBytes(1L, 0, 61, 8000)
    intercept[IllegalArgumentException](Multimodal.audioSignHash56(bytes))
  }
}
