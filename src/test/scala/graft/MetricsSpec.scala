package graft

import graft.text.Metrics

/** Hand-computed and brute-force fixtures for the exact ROC AUC
  * (q141's kernel): the Mann–Whitney identity, tie halves, and the
  * degenerate single-class guard.
  */
class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Int)]) =
    Metrics.binaryAuc(rows.toDF("score", "pos"), "score", "pos").collect()(0)

  test("perfect separation scores 1.0; inverted scores 0.0") {
    val perfect = auc(Seq((3.0, 1), (4.0, 1), (1.0, 0), (2.0, 0)))
    assert(perfect.getAs[Long]("u2") === 8)    // 2 · n_pos · n_neg
    assert(perfect.getAs[Double]("auc") === 1.0)
    val inverted = auc(Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)))
    assert(inverted.getAs[Long]("u2") === 0)
    assert(inverted.getAs[Double]("auc") === 0.0)
  }

  test("ties contribute exactly one half per pair") {
    // pos {1,2}, neg {1,2}: pairs (1,1)=½ (1,2)=0 (2,1)=1 (2,2)=½ → U=2
    val r = auc(Seq((1.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)))
    assert(r.getAs[Long]("u2") === 4)
    assert(r.getAs[Double]("auc") === 0.5)
  }

  test("all-tied scores give AUC exactly 0.5 regardless of class sizes") {
    val r = auc(Seq((7.0, 1), (7.0, 0), (7.0, 0), (7.0, 0)))
    assert(r.getAs[Long]("n_pos") === 1)
    assert(r.getAs[Long]("n_neg") === 3)
    assert(r.getAs[Double]("auc") === 0.5)
  }

  test("single-class input yields NULL auc, never an ANSI 0/0") {
    val r = auc(Seq((1.0, 1), (2.0, 1)))
    assert(r.getAs[Long]("n_neg") === 0)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("matches the brute-force pairwise definition on random scores with ties") {
    val rnd = new scala.util.Random(11)
    // coarse grid forces plenty of ties
    val rows = (1 to 200).map(_ => (rnd.nextInt(12).toDouble, rnd.nextInt(2)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val u2Expected = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val r = auc(rows)
    assert(r.getAs[Long]("u2") === u2Expected)
    assert(r.getAs[Double]("auc") ===
      u2Expected.toDouble / (2L * pos.size * neg.size))
  }
}
