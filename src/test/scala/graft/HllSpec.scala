package graft

import graft.functions.HyperLogLog
import org.apache.spark.sql.functions._

/** Fixtures for the relational HyperLogLog sketch (q148's kernel):
  * hash/rank closed forms, duplicate-insensitivity, register-MAX
  * mergeability (including idempotence — the property counter sums
  * lack), partitioning invariance, both estimator regimes, and
  * accuracy against exact distinct counts.
  */
class HllSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 1024

  test("register and rank closed forms: md5('a') = 0cc175b9c0f1b6a831c...") {
    // hex[1..4] = 0cc1 = 3265 → register 3265 % 1024 = 193;
    // hex[5..19] = 75b9c0f1b6a831c → no leading zeros, first digit 7
    // (0111) → 1 leading zero bit → rank 2
    val r = Seq("a").toDF("x")
      .select(HyperLogLog.register(col("x"), M).as("j"),
        HyperLogLog.rank(col("x")).as("rho"))
      .as[(Int, Int)].head()
    assert(r === ((193, 2)))
  }

  test("rank counts leading zero bits across hex-digit boundaries") {
    // Each hex digit contributes 4 bits; a leading-'0' run of k chars
    // contributes 4k zero bits before the first nonzero digit refines.
    val cases = Seq("08f" -> 5, // 0000 1000 → 4 zeros, rank 5
      "1ab" -> 4, //      0001 → 3 zeros, rank 4
      "2ff" -> 3, "4ff" -> 2, "8ff" -> 1, "fff" -> 1,
      "000000000000000" -> 61) // all 60 bits zero → capped
    // Drive rank() through a stub whose md5 is irrelevant: rank reads
    // hex chars 5..19, so feed synthetic strings through the SAME
    // sub-expressions instead (private path) — here we just recompute
    // the expected rank from the definition via SQL on literal hex.
    for ((hex, want) <- cases) {
      val padded = hex.padTo(15, 'f')
      val got = spark.sql(
        s"""SELECT CASE WHEN z = 15 THEN 61 ELSE 4 * z +
              CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1 WHEN d >= 2 THEN 2 ELSE 3 END + 1 END
            FROM (SELECT z, CAST(conv(CASE WHEN z = 15 THEN '0'
                    ELSE substr('$padded', z + 1, 1) END, 16, 10) AS INT) AS d
                  FROM (SELECT length(regexp_extract('$padded', '^0*', 0)) AS z))""")
        .as[Int].head()
      assert(got === want, s"hex $hex")
    }
  }

  test("duplicates are free: sketch(corpus ++ corpus) = sketch(corpus)") {
    val xs = (1 to 500).map(i => s"item$i").toDF("x")
    val once = HyperLogLog.sketch(xs, col("x"), Nil, M)
      .as[(Int, Int)].collect().sorted.toSeq
    val twice = HyperLogLog.sketch(xs.union(xs), col("x"), Nil, M)
      .as[(Int, Int)].collect().sorted.toSeq
    assert(once === twice)
  }

  test("register-wise MAX merge equals the monolithic sketch and is idempotent") {
    val xs = (1 to 2000).map(i => s"item$i").toDF("x")
    val a = HyperLogLog.sketch(xs.where(length(col("x")) % 2 === 0), col("x"), Nil, M)
    val b = HyperLogLog.sketch(xs.where(length(col("x")) % 2 === 1), col("x"), Nil, M)
    val whole = HyperLogLog.sketch(xs, col("x"), Nil, M)
      .as[(Int, Int)].collect().sorted.toSeq
    val merged = HyperLogLog.merge(a, b).as[(Int, Int)].collect().sorted.toSeq
    assert(merged === whole)
    // idempotence: re-merging a shard is harmless (at-least-once safe)
    val remerged = HyperLogLog.merge(a, b, a).as[(Int, Int)].collect().sorted.toSeq
    assert(remerged === whole)
  }

  test("sketch is partitioning-invariant") {
    val xs = (1 to 3000).map(i => s"p$i").toDF("x")
    val one = HyperLogLog.sketch(xs.repartition(1), col("x"), Nil, M)
      .as[(Int, Int)].collect().sorted.toSeq
    val many = HyperLogLog.sketch(xs.repartition(17), col("x"), Nil, M)
      .as[(Int, Int)].collect().sorted.toSeq
    assert(one === many)
  }

  test("estimate within 10% of truth in the raw-HLL regime (n >> 2.5m)") {
    val n = 20000
    val xs = (1 to n).map(i => s"raw$i").toDF("x")
    val est = HyperLogLog.estimate(HyperLogLog.sketch(xs, col("x"), Nil, M), Nil, M)
      .select("est").as[Double].head()
    assert(math.abs(est - n) <= 0.10 * n, s"est $est vs $n (rsd 3.25%)")
  }

  test("estimate within 5% of truth in the linear-counting regime (n << 2.5m)") {
    val n = 800
    val xs = (1 to n).map(i => s"lc$i").toDF("x")
    val row = HyperLogLog.estimate(HyperLogLog.sketch(xs, col("x"), Nil, M), Nil, M)
      .select("v0", "est").as[(Int, Double)].head()
    assert(row._1 > 0, "linear-counting regime must have empty registers")
    assert(math.abs(row._2 - n) <= 0.05 * n, s"est ${row._2} vs $n")
  }

  test("mid-range bias correction engages in the crossover (2.5m < raw < ~4.2m)") {
    // n = 3000 with m = 1024 lands past linear counting's handoff, in
    // the regime where the raw estimator carries the known positive
    // bias (HLL++). estimate() must return raw MINUS the interpolated
    // knot bias: recompute raw from the emitted exact (s_hi, s_lo) and
    // pin est = raw − bias(raw) through the same knot arithmetic.
    val n = 3000
    val xs = (1 to n).map(i => s"bc$i").toDF("x")
    val row = HyperLogLog.estimate(HyperLogLog.sketch(xs, col("x"), Nil, M), Nil, M)
      .select("v0", "n_present", "s_hi", "s_lo", "est")
      .as[(Int, Int, Long, Long, Double)].head()
    val (v0, _, sHi, sLo, est) = row
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * (M.toLong * M).toDouble * 2305843009213693952.0 /
      (sHi.toDouble * 140737488355328.0 + sLo.toDouble)
    val (zLo, zHi) = HyperLogLog.crossoverBounds(M).get
    assert(raw > zLo && raw < zHi,
      s"fixture must land in the correction zone ($zLo, $zHi), raw = $raw (v0 = $v0)")
    assert(est < raw, "correction must subtract a positive mid-range bias")
    assert(math.abs(est - raw) <= 0.03 * raw,
      s"bias at this raw is ~1-2% of n, got ${raw - est}")
    // corrected estimate stays inside the 4-sigma band around truth
    assert(math.abs(est - n) <= 0.13 * n, s"est $est vs $n")
  }

  test("m = 4096 crossover gets its own knot table") {
    val m = 4096
    val n = 12000 // raw ≈ 12.2k, inside (2.5m, last knot) = (10240, ~17231)
    val xs = (1 to n).map(i => s"bc4k$i").toDF("x")
    val row = HyperLogLog.estimate(HyperLogLog.sketch(xs, col("x"), Nil, m), Nil, m)
      .select("s_hi", "s_lo", "est").as[(Long, Long, Double)].head()
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * (m.toLong * m).toDouble * 2305843009213693952.0 /
      (row._1.toDouble * 140737488355328.0 + row._2.toDouble)
    val (zLo, zHi) = HyperLogLog.crossoverBounds(m).get
    assert(raw > zLo && raw < zHi,
      s"fixture must land in the m=4096 correction zone ($zLo, $zHi), raw = $raw")
    assert(row._3 < raw, "correction must subtract a positive mid-range bias")
    assert(math.abs(row._3 - n) <= 0.07 * n, s"est ${row._3} vs $n (4σ at m=4096 ≈ 6.5%)")
  }

  test("dials without a bias table keep the uncorrected raw estimator") {
    // m = 256: no knots; est in the raw regime must equal the raw
    // formula over the emitted exact split-sum words, bit for bit
    val m = 256
    val n = 4000 // >> 2.5m = 640: raw branch, far above any crossover
    val xs = (1 to n).map(i => s"nk$i").toDF("x")
    val row = HyperLogLog.estimate(HyperLogLog.sketch(xs, col("x"), Nil, m), Nil, m)
      .select("s_hi", "s_lo", "est").as[(Long, Long, Double)].head()
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * (m.toLong * m).toDouble * 2305843009213693952.0 /
      (row._1.toDouble * 140737488355328.0 + row._2.toDouble)
    assert(math.abs(row._3 - raw) <= 1e-6,
      s"m=$m must stay uncorrected: est ${row._3} vs raw $raw")
  }

  test("harmonic-sum split-long bookkeeping: single item, v0 = m - 1") {
    // One item of rank rho: S = 2^(61-rho) + (m-1)·2^61. For 'a'
    // (rho = 2): S = 2^59 + 1023·2^61. hi = S div 2^47 = 2^12 + 1023·2^14,
    // lo = 0.
    val r = HyperLogLog.estimate(
        HyperLogLog.sketch(Seq("a").toDF("x"), col("x"), Nil, M), Nil, M)
      .select("v0", "n_present", "s_hi", "s_lo").as[(Int, Int, Long, Long)].head()
    assert(r === ((M - 1, 1, 4096L + 1023L * 16384L, 0L)))
  }

  test("estimate is exact and overflow-free at the largest dial m = 65536") {
    // The round-6 2^53 split capped estimate() at m <= 1024 (lo_raw could
    // overflow a signed long past that). The 2^47 split must survive the
    // ADVERSARIAL worst case: every register present at rank 15, the
    // largest rank whose term 2^(61-15) = 2^46 still lands in the low
    // word — lo_raw = 65536·2^46 = 2^62, the maximum any input can
    // produce. ANSI mode is on in tests, so an overflow would abort.
    val m = 65536
    val regs = spark.range(m).select(col("id").cast("int").as("j"), lit(15).as("rho"))
      .groupBy("j").agg(max("rho").as("mreg"))
    val r = HyperLogLog.estimate(regs, Nil, m)
      .select("v0", "n_present", "s_hi", "s_lo", "est")
      .as[(Int, Int, Long, Long, Double)].head()
    // S = 2^62 exactly: s_hi = 2^62 div 2^47 = 2^15, s_lo = 0.
    assert((r._1, r._2, r._3, r._4) === ((0, m, 32768L, 0L)))
    // Raw regime (v0 = 0): est = alpha·m²·2^61/2^62 = alpha·m²/2.
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val want = math.round(alpha * (m.toLong * m).toDouble * 2305843009213693952.0 / math.pow(2, 62) * 1e6) / 1e6
    assert(r._5 === want)
  }

  test("grouped sketches stay independent per key") {
    val xs = ((1 to 1000).map(i => ("g1", s"a$i")) ++ (1 to 100).map(i => ("g2", s"b$i")))
      .toDF("g", "x")
    val est = HyperLogLog.estimate(
        HyperLogLog.sketch(xs, col("x"), Seq("g"), M), Seq("g"), M)
      .select("g", "est").as[(String, Double)].collect().toMap
    assert(math.abs(est("g1") - 1000) <= 100)
    assert(math.abs(est("g2") - 100) <= 15)
  }
}
