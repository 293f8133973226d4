package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private histogram release with DETERMINISTIC Laplace
  * noise — the governance step between an internal counter table and a
  * number anyone outside the trust boundary may see.
  *
  * The mechanism is the textbook one (Dwork et al., "Calibrating Noise
  * to Sensitivity", TCC 2006): a count query has L1 sensitivity 1, so
  * adding Laplace(b = 1/ε) noise to each bin gives ε-DP; bins of one
  * histogram partition the rows, so one histogram costs ε by PARALLEL
  * composition, and releasing the same table at several ε dials costs
  * Σε by SEQUENTIAL composition — the accounting this operator emits
  * beside every released number.
  *
  * Determinism (the repo-wide reproducibility contract — and what lets
  * a DuckDB oracle verify a "random" mechanism): the Laplace draw is
  * inverse-CDF over a SEEDED uniform, u = (h + 0.5) / 2^48 with h the
  * first 12 md5 hex digits of seed:ε:bin — the q97 portable-hash
  * discipline. h + 0.5 and the 2^48 division are both exact in
  * doubles (48 < 53 mantissa bits), u lands strictly inside (0, 1), and
  * noise = −b·sign(u−½)·ln(1−2|u−½|) is one ln per bin on identical
  * exact inputs in both engines. NOTE: a seeded draw is a REPLAY dial
  * for pipeline testing — a production release must draw its uniform
  * from entropy the adversary cannot know, or the noise subtracts off.
  *
  * ε rides as an exact integer rational (num, den): b = den/num and
  * ε_total = Σ num/den are single IEEE divisions over exact integers —
  * no 0.1-literal drift between engines.
  *
  * Scale shape (100 TB): the true counts are one partial-aggregated
  * hash agg; the ε ladder and the accounting total are literal-sized
  * broadcasts; noise is a per-bin scalar expression. Nothing scales
  * with corpus size except the one counting scan.
  */
object DpRelease {

  private val TwoPow48 = 281474976710656L

  /** Seeded uniform in (0, 1): first 12 md5 hex digits of
    * `seed`, offset half a step so 0 and 1 are unreachable.
    */
  def seededUniform(seed: Column): Column =
    (conv(substring(md5(seed), 1, 12), 16, 10).cast("long").cast("double")
      + lit(0.5)) / lit(TwoPow48.toDouble)

  /** Inverse-CDF Laplace(scale = b) noise from a uniform in (0, 1).
    * The uniform is clamped to [1e-15, 1 − 1e-15] first: Spark's
    * `rand()` ranges [0, 1), and an exact-0 draw would make
    * log(1 − 2·|u − ½|) = log 0 = −∞ — an infinite "noisy" release.
    * The clamp caps |noise| at b·ln(1e15) ≈ 34.5·b (beyond the 1-in-
    * 10^15 tail, indistinguishable from the true distribution) and is
    * a NO-OP for [[seededUniform]], whose smallest reachable value is
    * 0.5/2^48 ≈ 1.78e-15 > 1e-15 — the replay oracle's outputs are
    * untouched.
    *
    * Accounting note: truncating the noise tail strictly converts the
    * pure ε-DP guarantee into (ε, δ)-DP with δ ≈ 2·e^{−ln 1e15} =
    * 2e-15 — outputs beyond the cap would have an unbounded likelihood
    * ratio, but a draw ever landing there has probability ≤ 2e-15 per
    * release. State the mechanism as (ε, δ=2e-15)-DP when the ledger
    * must be exact; the distinction is below any practical accounting
    * granularity.
    */
  def laplaceNoise(u: Column, b: Column): Column = {
    val uc = greatest(least(u, lit(1.0 - 1e-15)), lit(1e-15))
    val s = uc - lit(0.5)
    -b * signum(s) * log(lit(1.0) - lit(2.0) * abs(s))
  }

  /** REPLAY/TEST release: noise derives from the caller's seed STRING,
    * so two runs (or two engines — the DuckDB oracle) emit identical
    * "noise". The hazard is in the name on purpose: anyone who knows
    * the seed can subtract the noise exactly, so this variant carries
    * ZERO actual privacy — the eps_total column here is an accounting
    * REHEARSAL, not a guarantee. Production releases go through
    * [[releaseCounts]], which refuses to manufacture its own
    * randomness and makes the caller hand over an entropy column.
    *
    * One output row per (ε, bin) with the true count, the
    * deterministic noise, the noisy release (both rounded 6), and the
    * sequential-composition total ε across the ladder.
    */
  def releaseCountsSeededForReplay(counts: DataFrame, binCol: String,
                                   nCol: String, epsilons: Seq[(Int, Int)],
                                   seed: String): DataFrame =
    release(counts, binCol, nCol, epsilons,
      seededUniform(concat_ws(":", lit(seed), col("eps_num"),
        col("eps_den"), col(binCol))))

  /** PRODUCTION release: same mechanism and accounting, but the
    * per-row uniform comes from `entropy` — a column the CALLER
    * guarantees is (a) uniform on the unit interval per output row and
    * (b) drawn from randomness the adversary cannot know (e.g.
    * `rand()` with no seed — its [0, 1) endpoint is safe, because
    * [[laplaceNoise]] clamps the uniform away from 0 and 1 — or
    * hardware entropy ingested as a column). There is no
    * seed-string overload of this path by design: a release whose
    * noise can be replayed can be subtracted, and an API that accepts
    * a seed looks exactly like one that doesn't until the breach.
    */
  def releaseCounts(counts: DataFrame, binCol: String, nCol: String,
                    epsilons: Seq[(Int, Int)], entropy: Column): DataFrame =
    release(counts, binCol, nCol, epsilons, entropy)

  private def release(counts: DataFrame, binCol: String, nCol: String,
                      epsilons: Seq[(Int, Int)], u: Column): DataFrame = {
    require(epsilons.nonEmpty, "need at least one epsilon")
    val spark = counts.sparkSession
    import spark.implicits._
    val eps = epsilons.toDF("eps_num", "eps_den")
    val total = eps.agg(
      sum(col("eps_num").cast("double") / col("eps_den").cast("double"))
        .as("eps_total"))
    val b = col("eps_den").cast("double") / col("eps_num").cast("double")
    // the draw happens ONCE, in its own projection: a non-deterministic
    // entropy column evaluated twice would put one noise value in
    // `noise` and a different one inside `n_noisy` (CollapseProject
    // refuses to duplicate non-deterministic expressions, so the alias
    // is load-bearing, not cosmetic)
    counts.crossJoin(broadcast(eps)).crossJoin(broadcast(total))
      .withColumn("noise_raw", laplaceNoise(u, b))
      .select(col("eps_num"), col("eps_den"), col(binCol),
        col(nCol).cast("long").as("n_true"),
        round(col("noise_raw"), 6).as("noise"),
        round(col(nCol).cast("double") + col("noise_raw"), 6)
          .as("n_noisy"),
        col("eps_total"))
  }
}
