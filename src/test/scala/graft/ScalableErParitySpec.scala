package graft

import graft.er.{ErEvaluation, ErPipeline}
import org.apache.spark.sql.functions._

/** Parity against the reference's FULL dataset goldens
  * (reference: test/ScalableEntityResolutionTest.scala, including the
  * intended goldens recorded in its commented-out tests — SURVEY.md §5).
  *
  * NB the reference's live `calculateSimilaritiesFullDataset` has two
  * defects (result never assigned; amazon norms passed for both sides —
  * ScalableEntityResolution.scala:128, SURVEY.md §3 ⚠️). The goldens
  * asserted by its tests correspond to the CORRECT google-norm formula,
  * which is what we implement.
  */
class ScalableErParitySpec extends SparkTestBase {

  private val res = "/root/reference/src/main/resources"
  private lazy val er = new ErPipeline(spark,
    s"$res/Amazon.csv", s"$res/Google.csv",
    s"$res/Amazon_Google_perfectMapping.csv", s"$res/stopwords.txt")

  test("full-dataset counts: 1363 amazon, 3226 google") {
    // reference: ScalableEntityResolutionTest.scala:49-51 (intended)
    assert(er.amazon.count() === 1363)
    assert(er.google.count() === 3226)
  }

  test("IDF dictionary has 17078 terms") {
    // reference: ScalableEntityResolutionTest.scala:53 (intended)
    assert(er.idf.count() === 17078)
  }

  test("inverted-index sizes: 111387 amazon, 77678 google (G1)") {
    // reference: ScalableEntityResolutionTest.scala:70-75 — the long weight
    // table IS the inverted index: one row per (doc, distinct token)
    assert(er.amazonWeights.count() === 111387)
    assert(er.googleWeights.count() === 77678)
  }

  test("token blocking yields 2441100 candidate pairs; golden pair sim (J2, A8, V7)") {
    // reference: ScalableEntityResolutionTest.scala:83-98
    val sims = er.scalableSimilarities.cache()
    try {
      assert(sims.count() === 2441100)
      val s = sims.where(col("id_a") === "b00005lzly" &&
          col("id_b") === "http://www.google.com/base/feeds/snippets/13823221823254120257")
        .select("sim").collect()(0).getDouble(0)
      assert(math.abs(s - 4.286548414e-06) < 1e-12)

      // threshold sweep goldens (A9/A10) — reference
      // ScalableEntityResolutionTest.scala:114-120 (intended):
      // falsepos(0.9)=22, falseneg(0.9)=1263 → truepos(0.9)=37
      val sweep = ErEvaluation.prfSweep(sims, er.gold)
        .where(col("bin") === 90).collect()(0)
      assert(sweep.getAs[Long]("fp") === 22)
      assert(sweep.getAs[Long]("fn") === 1263)
      assert(sweep.getAs[Long]("tp") === 37)

      // trueDupSims covers every gold pair, absent candidates scored 0.0
      assert(ErEvaluation.goldSimilarities(sims, er.gold).count() === 1300)
    } finally sims.unpersist()
  }
}
