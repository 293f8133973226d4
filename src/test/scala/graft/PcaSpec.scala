package graft

import graft.ann.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def emb(rows: Seq[Seq[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  test("covariance matches the hand-computed population matrix") {
    // x=[1,3,5], y=[2,4,6]: var x = var y = cov xy = 8/3 (perfectly correlated)
    val c = Pca.covariance(emb(Seq(Seq(1f, 2f), Seq(3f, 4f), Seq(5f, 6f))),
        "embedding", d = 2)
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val want = 8.0 / 3.0
    for (ij <- Seq((0, 0), (0, 1), (1, 0), (1, 1)))
      assert(math.abs(c(ij) - want) < 1e-9, s"C$ij = ${c(ij)}")
  }

  test("leading eigenpair of the correlated pair: [1/sqrt2, 1/sqrt2], lam 16/3") {
    val cov = Pca.covariance(emb(Seq(Seq(1f, 2f), Seq(3f, 4f), Seq(5f, 6f))),
      "embedding", d = 2)
    val got = Pca.leadingEigen(spark, cov, d = 2, iters = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq((0, 0.707107, 5.333333), (1, 0.707107, 5.333333)))
  }

  test("variance concentrated on one axis: loading [1, 0], lam = that variance") {
    val cov = Pca.covariance(emb(Seq(Seq(1f, 0f), Seq(3f, 0f), Seq(5f, 0f))),
      "embedding", d = 2)
    val got = Pca.leadingEigen(spark, cov, d = 2, iters = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq((0, 1.0, 2.666667), (1, 0.0, 2.666667)))
  }

  test("vectors shorter than d are dropped, not silently zero-padded") {
    val c = Pca.covariance(emb(Seq(Seq(1f, 2f), Seq(9f), Seq(3f, 4f), Seq(5f, 6f))),
      "embedding", d = 2)
    assert(c.select(max("n")).as[Long].head() === 3L)
  }
}
