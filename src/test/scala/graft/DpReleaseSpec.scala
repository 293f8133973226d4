package graft

import graft.operators.DpRelease
import org.apache.spark.sql.functions._

class DpReleaseSpec extends SparkTestBase {
  import spark.implicits._

  private def counts = Seq(("a", 100L), ("b", 250L), ("c", 7L))
    .toDF("bin", "n")

  test("inverse CDF hits the closed-form Laplace quantiles") {
    val got = Seq(0.75, 0.25, 0.5).toDF("u")
      .select(DpRelease.laplaceNoise(col("u"), lit(2.0)).as("z"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 2.0 * math.log(2)) < 1e-12) // P(Z ≤ b·ln2) = 3/4
    assert(math.abs(got(1) + 2.0 * math.log(2)) < 1e-12) // symmetric
    assert(got(2) === 0.0)                               // median
  }

  test("release is deterministic and the noise actually perturbs") {
    val r1 = DpRelease.releaseCountsSeededForReplay(counts, "bin", "n",
      Seq((1, 1)), "s").orderBy("bin").collect()
    val r2 = DpRelease.releaseCountsSeededForReplay(counts, "bin", "n",
      Seq((1, 1)), "s").orderBy("bin").collect()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.forall(r => r.getDouble(4) !== 0.0))
    // n_noisy = n_true + noise (both already rounded to 6)
    r1.foreach(r => assert(
      math.abs(r.getLong(3) + r.getDouble(4) - r.getDouble(5)) < 1e-6))
  }

  test("noise magnitude scales like b = 1/ε across a wide bin panel") {
    val many = spark.range(2000).select(
      concat(lit("bin"), col("id")).as("bin"), lit(10L).as("n"))
    def meanAbs(epsNum: Int, epsDen: Int): Double =
      DpRelease.releaseCountsSeededForReplay(many, "bin", "n", Seq((epsNum, epsDen)), "s")
        .agg(avg(abs(col("noise")))).collect().head.getDouble(0)
    val atEps1 = meanAbs(1, 1)    // E|Laplace(1)|  = 1
    val atEps01 = meanAbs(1, 10)  // E|Laplace(10)| = 10
    assert(math.abs(atEps1 - 1.0) < 0.15, s"ε=1 mean |noise| $atEps1")
    assert(math.abs(atEps01 - 10.0) < 1.5, s"ε=0.1 mean |noise| $atEps01")
  }

  test("sequential-composition total is the exact Σ num/den") {
    val got = DpRelease.releaseCountsSeededForReplay(counts, "bin", "n",
      Seq((1, 10), (1, 1), (1, 2)), "s")
    assert(got.count() === 9)
    val tot = got.select("eps_total").distinct().collect()
    assert(tot.length === 1 && tot.head.getDouble(0) === 0.1 + 1.0 + 0.5)
  }

  test("seeded uniform stays strictly inside (0, 1)") {
    val mm = spark.range(100000)
      .select(DpRelease.seededUniform(concat(lit("u"), col("id"))).as("u"))
      .agg(min("u"), max("u")).collect().head
    assert(mm.getDouble(0) > 0.0 && mm.getDouble(1) < 1.0)
  }

  test("production path takes caller entropy; noise and n_noisy share ONE draw") {
    // rand() with no seed: not replayable (the point of the production
    // API). Within a single release the emitted noise and the noisy
    // count must come from the SAME draw — a non-deterministic column
    // evaluated twice would decouple them.
    val got = DpRelease.releaseCounts(counts, "bin", "n", Seq((1, 1)), rand())
      .collect()
    got.foreach(r => assert(
      math.abs(r.getLong(3) + r.getDouble(4) - r.getDouble(5)) < 2e-6,
      s"n_noisy must reuse the same draw as noise: $r"))
    // and two releases draw DIFFERENT noise (probability of a collision
    // across three continuous draws is zero)
    val again = DpRelease.releaseCounts(counts, "bin", "n", Seq((1, 1)), rand())
      .collect()
    assert(got.map(_.getDouble(4)).toSeq !== again.map(_.getDouble(4)).toSeq,
      "unseeded entropy must not replay")
  }

  test("empty epsilon ladder is refused") {
    intercept[IllegalArgumentException] {
      DpRelease.releaseCountsSeededForReplay(counts, "bin", "n", Seq.empty, "s")
    }
  }
}
