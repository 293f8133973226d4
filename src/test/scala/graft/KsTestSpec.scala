package graft

import graft.operators.KsTest

class KsTestSpec extends SparkTestBase {
  import spark.implicits._

  test("identical distributions give D = 0; disjoint ones give D = 1") {
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val s = KsTest.perGroupVsRest(same, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toMap2
    assert(s("a") === ((0L, 0.0)) && s("b") === ((0L, 0.0)))

    val disj = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L)).toDF("g", "v")
    val d = KsTest.perGroupVsRest(disj, "g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(4), r.getLong(5))).toMap2
    assert(d("a") === ((1.0, 2L))) // full separation, attained at v=2
    assert(d("b") === ((1.0, 2L))) // symmetric: |0·2 − 2·2|/4 at v=2
  }

  test("hand-computed mixed case with argmax tie to the smallest value") {
    // a: {1,3}, rest: {1,2,3,4} (b ∪ c)
    // grid v ∈ {1,2,3,4}; nA=2, nB=4
    // cumA: 1,1,2,2  cumB: 1,2,3,4
    // |cumA·4 − cumB·2|: |4−2|=2, |4−4|=0, |8−6|=2, |8−8|=0 → max 2 at v=1
    val df = Seq(("a", 1L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("c", 3L), ("c", 4L)).toDF("g", "v")
    val got = KsTest.perGroupVsRest(df, "g", "v")
      .where($"g" === "a").collect().head
    assert(got.getLong(1) === 2L && got.getLong(2) === 4L)
    assert(got.getLong(3) === 2L)
    assert(got.getDouble(4) === 2.0 / 8.0)
    assert(got.getLong(5) === 1L)
  }

  test("weighted counter form ≡ raw rows expanded by multiplicity") {
    val counters = Seq(("a", 1L, 3L), ("a", 5L, 2L),
      ("b", 1L, 1L), ("b", 3L, 4L)).toDF("g", "v", "n")
    val raw = counters.collect().flatMap(r =>
      Seq.fill(r.getLong(2).toInt)((r.getString(0), r.getLong(1))))
      .toSeq.toDF("g", "v")
    val w = KsTest.perGroupVsRestWeighted(counters, "g", "v", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).sortBy(_._1).toSeq
    val e = KsTest.perGroupVsRest(raw, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(w === e)
  }

  test("a single-group relation yields no rows (no complement to test against)") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(KsTest.perGroupVsRest(df, "g", "v").count() === 0L)
  }

  private implicit class MapOps[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
