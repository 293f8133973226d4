package graft

import graft.operators.Psi
import org.apache.spark.sql.functions._

class PsiSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed PSI: symmetric shift of a two-bin population") {
    // ref (0.5, 0.5) vs cur (0.25, 0.75):
    // psi = 0.25*ln(2) + 0.25*ln(1.5) = 0.274653...
    val got = Psi.fromCounters(
      Seq((0L, 50L, 25L), (1L, 50L, 75L)).toDF("b", "r", "c"), "b", "r", "c")
      .select("psi_total", "one_sided_mass").distinct().as[(Double, Long)].head()
    assert(math.abs(got._1 - (0.25 * math.log(2) + 0.25 * math.log(1.5))) < 1e-6)
    assert(got._2 === 0L)
  }

  test("identical populations score exactly zero") {
    val got = Psi.fromCounters(
      Seq((0L, 10L, 10L), (1L, 30L, 30L)).toDF("b", "r", "c"), "b", "r", "c")
      .select("psi_total").distinct().as[Double].head()
    assert(got === 0.0)
  }

  test("one-sided bins contribute no term but their mass is reported") {
    val rows = Psi.fromCounters(
      Seq((0L, 50L, 50L), (1L, 8L, 0L), (2L, 0L, 12L)).toDF("b", "r", "c"),
      "b", "r", "c")
      .orderBy("bucket")
      .select("bucket", "term_nanos", "one_sided_mass")
      .collect()
    assert(rows.map(_.getLong(2)).toSet === Set(20L))
    assert(rows(0).get(1) !== null)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }
}
