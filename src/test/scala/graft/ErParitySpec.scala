package graft

import graft.er.{ErEvaluation, ErIngest, ErPipeline}
import org.apache.spark.sql.functions._

/** End-to-end parity against the reference's SMALL dataset goldens
  * (reference: test/EntityResolutionTest.scala — every distributed golden).
  * Inputs are the reference's bundled CSVs, read in place (read-only).
  */
class ErParitySpec extends SparkTestBase {

  private val res = "/root/reference/src/main/resources"
  private lazy val er = new ErPipeline(spark,
    s"$res/Amazon_small.csv", s"$res/Google_small.csv",
    s"$res/Amazon_Google_perfectMapping.csv", s"$res/stopwords.txt")

  test("ingest counts: 200 amazon, 200 google, 127 stopwords, 1300 gold") {
    // reference: EntityResolutionTest.scala:39-52
    assert(er.amazon.count() === 200)
    assert(er.google.count() === 200)
    assert(er.stopWords.size === 127)
    assert(er.gold.count() === 1300)
  }

  test("no corrupt lines in the bundled small files") {
    assert(ErIngest.corruptProductLines(spark, s"$res/Amazon_small.csv").count() === 0)
  }

  test("total token count across both catalogs = 22520") {
    // reference: EntityResolutionTest.scala:102-109 (A1: global sum)
    val n = er.amazonTokens.union(er.googleTokens)
      .agg(sum(size(col("tokens")))).collect()(0).getLong(0)
    assert(n === 22520)
  }

  test("biggest record is b000o24l3q with 1547 tokens") {
    // reference: EntityResolutionTest.scala:112-118 (A2/A3: top-1 by derived value)
    val top = er.amazonTokens
      .select(col("id"), size(col("tokens")).as("n"))
      .orderBy(col("n").desc).limit(1).collect()(0)
    assert(top.getString(0) === "b000o24l3q")
    assert(top.getInt(1) === 1547)
  }

  test("corpus = bag union of both catalogs, 400 docs") {
    // reference: EntityResolutionTest.scala:131-136 (U1)
    assert(er.corpus.count() === 400)
  }

  test("IDF dictionary has 4772 terms") {
    // reference: EntityResolutionTest.scala:138-144 (A5)
    assert(er.idf.count() === 4772)
  }

  test("TF-IDF weights of record b000hkgj8k (7-entry golden)") {
    // reference: EntityResolutionTest.scala:146-153 (V1/V2)
    val w = er.amazonWeights.where(col("id") === "b000hkgj8k")
      .select("token", "weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = Map(
      "autocad" -> 33.33333333333333, "autodesk" -> 8.333333333333332,
      "courseware" -> 66.66666666666666, "psg" -> 33.33333333333333,
      "2007" -> 3.5087719298245617, "customizing" -> 16.666666666666664,
      "interface" -> 3.0303030303030303)
    assert(w.keySet === expected.keySet)
    expected.foreach { case (t, v) => assert(math.abs(w(t) - v) < 1e-9, t) }
  }

  test("document similarity: Adobe Photoshop vs Adobe Illustrator") {
    // reference: EntityResolutionTest.scala:180-184 (V6)
    val sim = er.documentSimilarity("Adobe Photoshop", "Adobe Illustrator")
    assert(math.abs(sim - 0.0577243382163) < 1e-6)
  }

  test("naive cartesian similarity: golden pair (J1, V3-V6)") {
    // reference: EntityResolutionTest.scala:186-200 (with + without broadcast)
    val sim = er.naiveSimilarities
      .where(col("id_a") === "b000o24l3q" &&
        col("id_b") === "http://www.google.com/base/feeds/snippets/17242822440574356561")
      .select("sim").collect()(0).getDouble(0)
    assert(math.abs(sim - 0.000303171940451) < 1e-6)
  }

  test("evaluateModel: (146, 0.264332573435, 0.00123476304656)") {
    // reference: EntityResolutionTest.scala:202-209 (J3, P5, A4, A7)
    val sims = er.naiveSimilarities.cache()
    try {
      assert(sims.count() === 40000) // 200 × 200 cartesian pairs
      val (dups, avgDup, avgNonDup) = ErEvaluation.evaluateModel(sims, er.gold)
      assert(dups === 146)
      assert(math.abs(avgDup - 0.264332573435) < 1e-7)
      assert(math.abs(avgNonDup - 0.00123476304656) < 1e-7)
    } finally sims.unpersist()
  }
}
