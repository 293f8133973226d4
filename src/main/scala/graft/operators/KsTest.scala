package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov drift test, exact — the
  * distribution-level alarm a pipeline runs per slice (does THIS
  * source/segment's value distribution match the rest?): per group g,
  * D = max over v of |ECDF_g(v) − ECDF_rest(v)|.
  *
  * Exactness discipline: both ECDFs are compared by CROSS-MULTIPLIED
  * integer counts — |cumA·nB − cumB·nA| — so the argmax is pure long
  * arithmetic with no float boundary; only the final reported
  * statistic divides once. Argmax ties resolve to the smallest value.
  *
  * Scale shape: one hash agg to (group, value) counts, one to value
  * totals; the sweep windows partition BY GROUP over the DISTINCT
  * value grid — bounded by the value domain (cents of a priced
  * domain), not the corpus, which is what makes an exact KS viable at
  * 100 TB where a per-row sort would not be (the q141 AUC
  * justification). For unbounded domains, run the same comparison
  * over [[graft.functions.BucketHistogram]] sketches instead.
  */
object KsTest {

  /** Per-group KS report: (group, n_a, n_b, d_num, ks_stat, at_value)
    * where n_a = group rows, n_b = rest rows, d_num = max
    * |cumA·nB − cumB·nA|, ks_stat = d_num / (n_a·n_b), and at_value
    * the smallest value attaining the max. `valueCol` must be exact
    * (integer/cents). Groups with an empty complement (n_b = 0) are
    * dropped — the test compares against the REST, and against
    * nothing there is no test.
    */
  def perGroupVsRest(rel: DataFrame, groupCol: String, valueCol: String): DataFrame =
    perGroupVsRestWeighted(
      rel.select(col(groupCol), col(valueCol), lit(1L).as("_w")),
      groupCol, valueCol, "_w")

  /** [[perGroupVsRest]] over PRE-AGGREGATED (group, value, weight)
    * counter rows — the form a [[graft.functions.BucketHistogram]]
    * sketch or a live streaming counter state already has, so a drift
    * monitor reads KS straight off bounded state without ever
    * re-expanding to raw rows. Weights are exact integer
    * multiplicities; with every weight 1 this IS perGroupVsRest.
    */
  def perGroupVsRestWeighted(rel: DataFrame, groupCol: String,
                             valueCol: String, weightCol: String): DataFrame = {
    val vc = rel.select(col(groupCol).as("g"), col(valueCol).as("v"),
        col(weightCol).as("w"))
      .where(col("g").isNotNull && col("v").isNotNull)
    val byGv = vc.groupBy("g", "v").agg(sum(col("w")).as("n_gv"))
    val byV = vc.groupBy("v").agg(sum(col("w")).as("n_v"))
    val totals = vc.groupBy("g").agg(sum(col("w")).as("n_a"))
    val n = vc.agg(sum(col("w")).as("n_all"))
    // full grid: every group × every distinct value (absent cells = 0),
    // so both ECDFs step at every observed value
    val grid = byV.crossJoin(broadcast(totals.select("g")))
      .join(byGv, Seq("g", "v"), "left")
      .select(col("g"), col("v"), col("n_v"),
        coalesce(col("n_gv"), lit(0L)).as("n_gv"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_a", sum(col("n_gv")).over(w))
      .withColumn("cum_b", sum(col("n_v") - col("n_gv")).over(w))
      .join(broadcast(totals), "g")
      .crossJoin(broadcast(n))
      .withColumn("n_b", col("n_all") - col("n_a"))
      .where(col("n_b") > 0)
      .withColumn("dnum",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(struct(col("dnum"), (-col("v")).as("nv"))).as("best"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        col("best.dnum").as("d_num"),
        (col("best.dnum").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("ks_stat"),
        (-col("best.nv")).as("at_value"))
  }
}
