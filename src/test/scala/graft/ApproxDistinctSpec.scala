package graft

import graft.text.Tokenize
import org.apache.spark.sql.functions._

/** q71's corpus report card counts exact distinct bag-of-words
  * fingerprints — correct and oracle-checkable, but exact COUNT(DISTINCT)
  * shuffles every distinct key. At 100 TB the scale path is
  * `approx_count_distinct` (HyperLogLog++: fixed-size mergeable sketch,
  * pure map-side combine). This spec calibrates it against the exact
  * answer on the real corpus at two scale factors so the swap is a
  * measured decision, and pins the plan property that makes it scale.
  */
class ApproxDistinctSpec extends SparkTestBase {

  private def fingerprints(dir: String) =
    Tables.read(spark, sf(dir), "documents")
      .select(md5(concat_ws(" ",
        array_sort(array_distinct(Tokenize.tokens(col("text"),
          queries.TextQueries.Stop))))).as("fp"))

  test("approx_count_distinct tracks the exact distinct-fingerprint count") {
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val fp = fingerprints(dir)
      val r = fp.agg(
        countDistinct(col("fp")).as("exact"),
        approx_count_distinct(col("fp"), rsd = 0.02).as("approx")
      ).collect()(0)
      val (exact, approx) = (r.getLong(0), r.getLong(1))
      assert(exact > 0)
      // rsd 0.02 → ±2% standard error; allow 3 sigma
      assert(math.abs(approx - exact).toDouble / exact <= 0.06,
        s"$dir: approx $approx vs exact $exact drifted > 6%")
    }
  }

  test("the HLL sketch combines map-side (no distinct-key shuffle)") {
    val plan = fingerprints("sf0.001")
      .agg(approx_count_distinct(col("fp")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), "sketch must partial-aggregate")
    // exact COUNT(DISTINCT) by contrast expands to a two-phase plan
    // keyed on the value itself — the shuffle the sketch avoids
  }
}
