package graft

import graft.operators.KAnonymity
import org.apache.spark.sql.functions._

class KAnonymitySpec extends SparkTestBase {
  import spark.implicits._

  // (city, age_band): classes at level 0 — (a,1):3, (a,2):1, (b,1):2
  private def fixture = Seq(
    ("a", 1), ("a", 1), ("a", 1),
    ("a", 2),
    ("b", 1), ("b", 1)).toDF("city", "age")

  test("ladder levels, class minima, and at-risk rows are exact") {
    val got = KAnonymity.ladder(fixture, Seq(col("city"), col("age")), k = 2)
      .orderBy("lvl").collect()
    assert(got.length === 2)
    // level 0: 3 classes, k_min = 1, 1 row below k=2, risk 1/6
    val l0 = got(0)
    assert((l0.getInt(0), l0.getLong(1), l0.getLong(2), l0.getLong(3))
      === (0, 3L, 1L, 1L))
    assert(l0.getDouble(4) === 1.0 / 6.0 && !l0.getBoolean(5))
    // level 1 (age dropped): classes a:4, b:2 → k_min 2, anonymous
    val l1 = got(1)
    assert((l1.getInt(0), l1.getLong(1), l1.getLong(2), l1.getLong(3))
      === (1, 2L, 2L, 0L))
    assert(l1.getDouble(4) === 0.0 && l1.getBoolean(5))
  }

  test("rows with a null QI are excluded, not aliased into coarser levels") {
    val withNull = fixture.union(
      spark.sql("SELECT 'c' AS city, CAST(NULL AS INT) AS age"))
    val got = KAnonymity.ladder(withNull, Seq(col("city"), col("age")), k = 2)
      .orderBy("lvl").collect()
    // identical to the fixture result: the null-age row never counts
    assert(got.map(_.getLong(3)).toSeq === Seq(1L, 0L))
    assert(got.map(r => r.getLong(1)).toSeq === Seq(3L, 2L))
  }

  test("single-QI ladder has exactly one level") {
    val got = KAnonymity.ladder(fixture, Seq(col("city")), k = 5)
      .collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 2L) // k_min = min(4, 2)
    assert(!got.head.getBoolean(5))
  }

  test("k below 2 is refused") {
    intercept[IllegalArgumentException] {
      KAnonymity.ladder(fixture, Seq(col("city")), k = 1)
    }
  }
}
