package graft

import org.apache.spark.sql.functions._

/** The catalog's q57 uses EXACT percentiles because the DuckDB oracle
  * demands bit-equality — but exact percentile buffers each group's
  * values, which stops being an option at 100 TB. This spec documents
  * and pins the scale path: `approx_percentile` (a mergeable t-digest-
  * style sketch with partial aggregation) must land within its accuracy
  * bound of the exact answer on the real data, so swapping it in at
  * scale is a calibrated decision, not a leap.
  */
class ApproxPercentileSpec extends SparkTestBase {

  test("approx_percentile tracks exact percentiles within the accuracy bound") {
    val li = Tables.read(spark, sf("sf0.01"), "lineitem")
    val acc = 10000 // default accuracy: error ≤ 1/acc of the rank space
    val rows = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50_exact"),
        expr(s"approx_percentile(l_quantity, 0.5, $acc)").as("p50_approx"),
        expr("percentile(l_extendedprice, 0.99)").as("p99_exact"),
        expr(s"approx_percentile(l_extendedprice, 0.99, $acc)").as("p99_approx"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // rank error ≤ n/acc (a handful of rows here) → tight value-space
      // tolerances on this data: quantity is a small-int range, price
      // checked relatively
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"p50 drifted for ${r.get(0)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) / r.getDouble(3) < 0.01,
        s"p99 price must be within 1% relative for ${r.get(0)}")
    }
    // and the sketch aggregates partially (map-side combine) like any agg
    val plan = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), "sketch must combine map-side")
  }
}
