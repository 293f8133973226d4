package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. 2007) as pure relational algebra — the
  * distinct-count member of the portable-sketch family ([[CountMin]]
  * frequencies, Bloom membership): estimate |distinct items| from m
  * max-rank registers instead of shuffling every distinct key the way
  * COUNT(DISTINCT) must.
  *
  * The sketch IS a (j, mreg) table: item x lands in register
  * j(x) = first 16 md5 bits mod m, contributing rank ρ(x) = (leading
  * zero bits of the next 60 md5 bits) + 1; the register keeps the MAX
  * rank seen. A set with cardinality n fills registers with ranks
  * ~log2(n/m), and the harmonic mean across registers estimates n with
  * relative error ≈ 1.04/√m (m = 1024 → 3.25%).
  *
  * Scale shape: building is ONE hash aggregation onto at most m groups
  * per key — MAX partial-aggregates, so each partition collapses to
  * sketch size before the exchange and the shuffle moves
  * O(partitions·m) rows regardless of corpus size. Two sketches over
  * the SAME dial merge by register-wise MAX (idempotent, commutative —
  * re-delivered shards can't corrupt it, unlike a counter sum), which
  * is what makes the artifact unionable across corpus shards; q148
  * proves shard-merge ≡ monolithic under the DuckDB gate.
  *
  * Determinism: both the register index and the rank are integer
  * functions of the md5 hex string (index = hex[1..4] mod m; rank from
  * the leading-'0' run of hex[5..19] plus a CASE on the first nonzero
  * digit), so the register table hash-matches DuckDB EXACTLY. The
  * estimate keeps bit-exactness by carrying the harmonic sum
  * S = Σ_j 2^(61−M[j]) (M = 0 for empty registers) as TWO exact
  * longs (s_hi·2^47 + s_lo): S itself needs up to 72 bits, and the
  * engines' wide-int→double casts disagree in the last ulp (Java's
  * BigInteger rounds correctly; a two-halves float sum may
  * double-round), but s_hi/s_lo are exact in ANY engine and the final
  * `s_hi·2^47 + s_lo` double is one multiply-add over bit-identical
  * operands. The 2^47 split keeps EVERY partial sum under 2^63 at the
  * largest dial: low-word terms are < 2^47, so lo_raw ≤ m·2^46 ≤ 2^62
  * even at m = 65536 (high-word terms are ≤ 2^14, hi_raw ≤ 2^30) — no
  * m cap beyond [[register]]'s own. Only the small-range
  * linear-counting branch touches libm (ln) and gets round(·, 6).
  */
object HyperLogLog {

  /** Number of leading zero BITS a hex digit d (1..15) contributes. */
  private def zeroBitsInDigit(d: Column): Column =
    when(d >= 8, lit(0)).when(d >= 4, lit(1)).when(d >= 2, lit(2)).otherwise(lit(3))

  /** Empirical mid-range bias knots (mean raw estimate, mean positive
    * bias) per register dial — HLL++'s idea (Heule et al. 2013: the
    * raw estimator carries a known positive bias just past linear
    * counting's handoff), with SELF-derived tables so the constants
    * match THIS md5 register/rank chain: 300 trials per knot of the
    * exact hash above, true n swept so mean raw spans ~2.33m..4.2m.
    * Linear counting owns raw ≤ 2.5m; the residual bias between the
    * handoff and ~4.2m decays (+2.2% → +0.07% of n at m = 1024,
    * +2.3% → +0.18% at m = 4096) and is removed by piecewise-linear
    * interpolation over these knots (beyond the last knot the bias is
    * noise-level and the correction is 0). Segment slopes are
    * PRECOMPUTED Scala doubles, so both engines evaluate the same
    * two-op form b_i + (raw − r_i)·slope_i over shared literals — est
    * stays bit-identical cross-engine. Dials without a table keep the
    * uncorrected estimator.
    */
  private val biasKnots: Map[Int, IndexedSeq[(Double, Double)]] = Map(
    1024 -> Vector(
      (2388.8792407882643, 88.87924078826427),
      (2524.156876150078, 74.156876150078),
      (2662.8427236935727, 62.84272369357268),
      (2801.1330083388984, 51.133008338898435),
      (2943.5085792903565, 43.508579290356465),
      (3086.21413664023, 36.21413664023021),
      (3231.5727923437503, 31.57279234375028),
      (3377.44167183232, 27.441671832320026),
      (3520.1810764840184, 20.181076484018377),
      (3715.759022931226, 15.7590229312259),
      (3910.3227763849372, 10.322776384937242),
      (4107.874938589897, 7.874938589897283),
      (4303.10784469868, 3.10784469868031)),
    4096 -> Vector(
      (9536.644666679082, 336.64466667908164),
      (10076.843600753878, 276.8436007538785),
      (10632.255317741798, 232.25531774179763),
      (11192.90647222137, 192.90647222136977),
      (11758.507106173025, 158.50710617302502),
      (12331.370477206185, 131.37047720618466),
      (12907.739052858164, 107.73905285816363),
      (13485.20939322175, 85.20939322175036),
      (14069.270584755846, 69.27058475584636),
      (14857.045586399589, 57.0455863995885),
      (15645.272205464991, 45.2722054649912),
      (16437.013065062903, 37.01306506290348),
      (17231.033589137467, 31.03358913746706)))

  /** The (linear-counting handoff, last knot) raw-estimate bounds of
    * the corrected crossover for `m`, when a bias table exists — the
    * regime classifier q155 and HllSpec share, so the zone they pin
    * can never drift from the knots actually applied.
    */
  def crossoverBounds(m: Int): Option[(Double, Double)] =
    biasKnots.get(m).map(ks => (2.5 * m, ks.last._1))

  /** `raw` minus the interpolated mid-range bias — identity when no
    * table exists for `m`.
    */
  private def biasCorrected(raw: Column, m: Int): Column =
    biasKnots.get(m) match {
      case None => raw
      case Some(ks) =>
        var c = when(raw < lit(ks.head._1), lit(ks.head._2))
        for (i <- 0 until ks.size - 1) {
          val (r0, b0) = ks(i); val (r1, b1) = ks(i + 1)
          val slope = (b1 - b0) / (r1 - r0)
          c = c.when(raw < lit(r1), lit(b0) + (raw - lit(r0)) * lit(slope))
        }
        raw - c.otherwise(lit(0.0))
    }

  /** DuckDB SQL mirroring [[biasCorrected]] over a raw-estimate column. */
  private def biasCorrectedSql(rawSql: String, m: Int): String =
    biasKnots.get(m) match {
      case None => rawSql
      case Some(ks) =>
        val head = s"WHEN $rawSql < ${ks.head._1} THEN ${ks.head._2}"
        val segs = (0 until ks.size - 1).map { i =>
          val (r0, b0) = ks(i); val (r1, b1) = ks(i + 1)
          val slope = (b1 - b0) / (r1 - r0)
          s"WHEN $rawSql < $r1 THEN $b0 + ($rawSql - $r0) * $slope"
        }
        s"$rawSql - CASE $head ${segs.mkString(" ")} ELSE 0.0 END"
    }

  /** Register index of `item`: first 16 md5 bits mod m (m must divide
    * 65536 so the draw stays uniform — i.e. m a power of two ≤ 2^16).
    */
  def register(item: Column, m: Int): Column = {
    require(m >= 16 && (m & (m - 1)) == 0 && m <= 65536, s"m must be a power of 2 in [16, 65536], got $m")
    (conv(substring(md5(item), 1, 4), 16, 10).cast("long") % m).cast("int")
  }

  /** Rank of `item`: leading-zero bits of md5 hex chars 5..19 (60
    * bits) + 1, capped at 61 when all 60 bits are zero (probability
    * 2^-60 — present for totality, not reachability).
    */
  def rank(item: Column): Column = {
    val h = substring(md5(item), 5, 15)
    val z = length(regexp_extract(h, "^0*", 0))
    val d = conv(when(z === 15, lit("0")).otherwise(h.substr(z + lit(1), lit(1))), 16, 10)
      .cast("int")
    when(z === 15, lit(61)).otherwise(z * 4 + zeroBitsInDigit(d) + 1)
  }

  /** Build one sketch per `keys` group: (keys..., j, mreg) with one row
    * per NON-EMPTY register — at most m per group. Duplicates are free
    * (MAX is idempotent), so the input needs no distinct.
    */
  def sketch(items: DataFrame, item: Column, keys: Seq[String], m: Int): DataFrame =
    items
      .select(keys.map(col) :+ register(item, m).as("j") :+ rank(item).as("rho"): _*)
      .groupBy((keys :+ "j").map(col): _*)
      .agg(max("rho").as("mreg"))

  /** Merge sketches built with the SAME (m, hash) dial by register-wise
    * MAX — exactly the sketch of the concatenated inputs, and (unlike a
    * counter sum) IDEMPOTENT: merging a shard twice is harmless, which
    * matters under at-least-once delivery.
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    val keys = sketches.head.columns.filterNot(_ == "mreg")
    sketches.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(max("mreg").as("mreg"))
  }

  /** Estimate per `keys` group from a register table: v0 (empty
    * registers), the exact harmonic sum as (s_hi, s_lo), and `est` —
    * raw HLL α_m·m²/Σ2^(−M) with Flajolet's small-range linear
    * counting m·ln(m/v0) when raw ≤ 2.5m and v0 > 0. Empty registers
    * contribute 2^0 = 1 to Σ2^(−M), i.e. 2^61 to S.
    */
  def estimate(regs: DataFrame, keys: Seq[String], m: Int): DataFrame = {
    val twoTo47 = 140737488355328L // 2^47
    // Per-register scaled term 2^(61-mreg), split so every partial sum
    // stays an exact long AT ANY register dial: ranks ≤ 14 land in the
    // high word (÷2^47, each term ≤ 2^14 → hi ≤ m·2^14 ≤ 2^30), ranks
    // > 14 in the low word (each term < 2^47 → lo ≤ m·2^46 ≤ 2^62 for
    // m ≤ 65536). High-word terms are powers of two ≥ 2^47, so the ÷
    // loses nothing and S = s_hi·2^47 + s_lo holds exactly.
    val hiTerm = expr("CASE WHEN 61 - mreg >= 47 THEN shiftleft(CAST(1 AS BIGINT), 61 - mreg - 47) ELSE CAST(0 AS BIGINT) END")
    val loTerm = expr("CASE WHEN 61 - mreg < 47 THEN shiftleft(CAST(1 AS BIGINT), 61 - mreg) ELSE CAST(0 AS BIGINT) END")
    val agg = regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_present"),
        sum(hiTerm).as("hi_raw"), sum(loTerm).as("lo_raw"))
      // empty registers: 2^61 = 2^14 · 2^47 each → high word
      .withColumn("hi_raw", col("hi_raw") + (lit(m) - col("n_present")).cast("long") * lit(16384L))
      .withColumn("s_hi", expr(s"hi_raw + lo_raw div $twoTo47")) // div: long `/` would be a DOUBLE division
      .withColumn("s_lo", col("lo_raw") % lit(twoTo47))
    val sD = col("s_hi").cast("double") * lit(twoTo47.toDouble) + col("s_lo").cast("double")
    val alpha = 0.7213 / (1.0 + 1.079 / m) // identical literal arithmetic in the SQL mirror
    val raw = lit(alpha) * lit((m.toLong * m).toDouble) * lit(2305843009213693952.0) / sD
    val v0 = lit(m) - col("n_present")
    val lc = lit(m.toDouble) * log(lit(m.toDouble) / v0.cast("double"))
    agg.select(keys.map(col) :+ v0.as("v0") :+ col("n_present") :+
      col("s_hi") :+ col("s_lo") :+
      round(when(raw <= lit(2.5 * m) && v0 > 0, lc)
        .otherwise(biasCorrected(raw, m)), 6).as("est"): _*)
  }

  /** DuckDB SQL mirroring [[sketch]]'s per-item (j, rho): emits CTEs
    * `<p>h` → `<p>r` over `from` (which must expose `itemSql` plus the
    * key columns); read (keys, j, rho) from `<p>r`. Kept beside the
    * Column form so the two hash chains can't drift apart.
    */
  def hashCtesSql(itemSql: String, fromSql: String, keyCols: String, m: Int, p: String = ""): String = s"""
      ${p}h AS (SELECT $keyCols,
                  CAST(CAST('0x' || substr(md5($itemSql), 1, 4) AS BIGINT) % $m AS INTEGER) AS j,
                  substr(md5($itemSql), 5, 15) AS hx
                FROM $fromSql),
      ${p}z AS (SELECT *, length(regexp_extract(hx, '^0*')) AS z FROM ${p}h),
      ${p}r AS (SELECT $keyCols, j,
                  CASE WHEN z = 15 THEN 61 ELSE 4 * z +
                    CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1 WHEN d >= 2 THEN 2 ELSE 3 END + 1 END AS rho
                FROM (SELECT *, CAST('0x' || CASE WHEN z = 15 THEN '0' ELSE substr(hx, z + 1, 1) END AS BIGINT) AS d
                      FROM ${p}z))"""

  /** DuckDB SQL mirroring [[estimate]] over a register CTE
    * `regsSql(keyCols, j, mreg)` — the SAME split-long harmonic sum and
    * the SAME estimate expression tree, so `est` is bit-identical
    * (round(·,6) covers only the libm ln in the linear-counting
    * branch).
    */
  def estimateSql(regsSql: String, keyCols: String, m: Int): String = {
    val t47 = "140737488355328"
    s"""SELECT $keyCols, $m - n_present AS v0, n_present, s_hi, s_lo,
         round(CASE WHEN raw <= ${2.5 * m} AND $m - n_present > 0
                    THEN $m.0 * ln($m.0 / CAST($m - n_present AS DOUBLE))
                    ELSE ${biasCorrectedSql("raw", m)} END, 6) AS est
       FROM (SELECT $keyCols, n_present, s_hi, s_lo,
                    (0.7213 / (1.0 + 1.079 / $m.0)) * ${m.toLong * m}.0 * 2305843009213693952.0
                    / (CAST(s_hi AS DOUBLE) * $t47.0 + CAST(s_lo AS DOUBLE)) AS raw
             FROM (SELECT $keyCols, n_present,
                          hi_raw + lo_raw // $t47 AS s_hi, lo_raw % $t47 AS s_lo
                   FROM (SELECT $keyCols, CAST(COUNT(*) AS INTEGER) AS n_present,
                                CAST(SUM(CASE WHEN 61 - mreg >= 47 THEN 1::BIGINT << (61 - mreg - 47) ELSE 0 END)
                                     + ($m - COUNT(*)) * 16384 AS BIGINT) AS hi_raw,
                                CAST(SUM(CASE WHEN 61 - mreg < 47 THEN 1::BIGINT << (61 - mreg) ELSE 0 END) AS BIGINT) AS lo_raw
                         FROM ($regsSql) GROUP BY $keyCols)))"""
  }
}
