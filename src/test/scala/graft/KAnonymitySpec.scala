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

  // sensitive diagnosis per (city) class: a is 3×flu + 1×cold,
  // b is 2×flu (homogeneous — the attack k-anonymity can't see)
  private def sensFixture = Seq(
    ("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "cold"),
    ("b", "flu"), ("b", "flu")).toDF("city", "diag")

  test("l-diversity: distinct and entropy gates, closed-form entropy") {
    val got = KAnonymity.lDiversity(sensFixture, Seq(col("city")),
        col("diag"), l = 2)
      .orderBy("qi0").collect()
    assert(got.length === 2)
    val a = got(0)
    assert((a.getString(0), a.getLong(1), a.getLong(2)) === ("a", 4L, 2L))
    // entropy = ln4 − (3·ln3 + 1·ln1)/4; exp of it ≈ 1.7548
    val expected = math.exp(math.log(4) - 3 * math.log(3) / 4)
    assert(math.abs(a.getDouble(3) - expected) < 1e-6)
    assert(a.getBoolean(4) && !a.getBoolean(5)) // 2 distinct, entropy < 2
    val b = got(1)
    assert((b.getString(0), b.getLong(1), b.getLong(2)) === ("b", 2L, 1L))
    assert(b.getDouble(3) === 1.0) // homogeneous class: exp(0)
    assert(!b.getBoolean(4) && !b.getBoolean(5))
  }

  test("l-diversity: l equal-count values sit EXACTLY on the entropy gate") {
    val eq = Seq(("a", "x"), ("a", "y"), ("a", "z")).toDF("city", "diag")
    val r = KAnonymity.lDiversity(eq, Seq(col("city")), col("diag"), l = 3)
      .collect().head
    assert(r.getDouble(3) === 3.0)                 // entropy_l = exp(ln 3)
    assert(r.getBoolean(4) && r.getBoolean(5))     // both gates pass AT l
  }

  test("l-diversity: null sensitive values are excluded") {
    val withNull = sensFixture.union(
      spark.sql("SELECT 'b' AS city, CAST(NULL AS STRING) AS diag"))
    val got = KAnonymity.lDiversity(withNull, Seq(col("city")),
        col("diag"), l = 2)
      .orderBy("qi0").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(4L, 2L))
  }
}
