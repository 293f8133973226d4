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

  /** Inverse-CDF Laplace(scale = b) noise from a uniform in (0, 1). */
  def laplaceNoise(u: Column, b: Column): Column = {
    val s = u - lit(0.5)
    -b * signum(s) * log(lit(1.0) - lit(2.0) * abs(s))
  }

  /** Release `counts` (binCol, nCol) at every ε in `epsilons`
    * (num, den) pairs: one output row per (ε, bin) with the true
    * count, the deterministic noise, the noisy release (both rounded
    * 6), and the sequential-composition total ε across the ladder.
    */
  def releaseCounts(counts: DataFrame, binCol: String, nCol: String,
                    epsilons: Seq[(Int, Int)], seed: String): DataFrame = {
    require(epsilons.nonEmpty, "need at least one epsilon")
    val spark = counts.sparkSession
    import spark.implicits._
    val eps = epsilons.toDF("eps_num", "eps_den")
    val total = eps.agg(
      sum(col("eps_num").cast("double") / col("eps_den").cast("double"))
        .as("eps_total"))
    val u = seededUniform(concat_ws(":", lit(seed), col("eps_num"),
      col("eps_den"), col(binCol)))
    val b = col("eps_den").cast("double") / col("eps_num").cast("double")
    counts.crossJoin(broadcast(eps)).crossJoin(broadcast(total))
      .select(col("eps_num"), col("eps_den"), col(binCol),
        col(nCol).cast("long").as("n_true"),
        round(laplaceNoise(u, b), 6).as("noise"),
        round(col(nCol).cast("double") + laplaceNoise(u, b), 6)
          .as("n_noisy"),
        col("eps_total"))
  }
}
