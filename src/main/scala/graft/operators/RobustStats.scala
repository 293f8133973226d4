package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) statistics over GROUPED COUNTER tables — the
  * monitoring primitive behind outlier fences that a few wild rows
  * cannot move (mean/stddev fences famously chase their own outliers;
  * median ± k·MAD does not, Hampel's classic identifier).
  *
  * Scale shape (100 TB): an exact median is inherently rank-based, but
  * it does NOT need a sort of the corpus — it needs a sort of the
  * VALUE DOMAIN. Everything here runs on a (key, value, count) counter
  * table produced by one corpus-scan hash aggregation (the q193 KS
  * discipline): the windows that locate the two middle ranks partition
  * by key and scan counter rows, so their cost is bounded by distinct
  * values per key, not rows. For genuinely unbounded real-valued
  * domains, quantize first (the q152/q198 bucket dial) — the counter
  * contract is the same.
  *
  * Interpolation matches `percentile_cont(0.5)` on the expanded
  * multiset: with n values (0-based middle rank k = (n−1) div 2), the
  * median is `lo + (hi − lo)·f` where lo/hi are the rank-k / rank-k+1
  * values and f is 0.5 for even n, 0 for odd. Counter values are exact
  * integers (cents) carried as doubles, so lo/hi are exact and the
  * interpolation is one IEEE multiply-add — bit-identical in any
  * engine, which is what lets the DuckDB oracle mirror it verbatim.
  */
object RobustStats {

  /** Exact weighted median per `keys` group over a counter table
    * `ct(keys..., vCol: numeric, cntCol: long)`: returns one row per
    * key group with `n` (total weight) and `med`. The only windows
    * partition by the keys and are counter-bounded.
    */
  def weightedMedian(ct: DataFrame, keys: Seq[String],
                     vCol: String, cntCol: String): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val cumW = part.orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = ct
      .withColumn("n", sum(col(cntCol)).over(part))
      .withColumn("cum", sum(col(cntCol)).over(cumW))
      .withColumn("k", expr("(n - 1) div 2"))
    w.groupBy((keys :+ "n").map(col): _*)
      .agg(
        min(when(col("cum") >= col("k") + 1, col(vCol))).as("lo"),
        min(when(col("cum") >= col("k") + 2, col(vCol))).as("hi"))
      .select(keys.map(col) :+ col("n") :+
        (col("lo") + (coalesce(col("hi"), col("lo")) - col("lo")) *
          when(expr("(n - 1) % 2") === 1, lit(0.5)).otherwise(lit(0.0)))
          .as("med"): _*)
  }

  /** Hampel outlier report per key over a counter table of exact
    * integer-valued doubles: (keys..., n, med, mad, n_out, out_frac),
    * where n_out counts weight with |v − med| > `k`·MAD. The corpus is
    * the counter table's problem — this function touches only counters:
    * one median, one re-group onto the (smaller) deviation domain, one
    * second median, one conditional sum. The med/mad joins move
    * key-sized tables and are broadcast.
    *
    * With MAD = 0 (over half the weight at one value) the fence
    * degenerates to "any deviation at all" — deterministic, and exactly
    * what both engines evaluate.
    */
  def madOutliers(ct: DataFrame, keys: Seq[String], vCol: String,
                  cntCol: String, k: Double = 4.4478): DataFrame = {
    // 3 consumers (median build, deviation build, fence count): cut the
    // counter's lineage once or each branch re-runs the corpus scan
    val c = ct.localCheckpoint()
    val med = weightedMedian(c, keys, vCol, cntCol)
      .withColumnRenamed("n", "n_total")
    val dev = c.join(broadcast(med), keys)
      .select(keys.map(col) :+ abs(col(vCol) - col("med")).as("dv") :+
        col(cntCol).as("cnt"): _*)
      .groupBy((keys :+ "dv").map(col): _*)
      .agg(sum("cnt").as("cnt"))
    val mad = weightedMedian(dev, keys, "dv", "cnt")
      .select(keys.map(col) :+ col("med").as("mad"): _*)
    c.join(broadcast(med), keys).join(broadcast(mad), keys)
      .groupBy((keys :+ "n_total" :+ "med" :+ "mad").map(col): _*)
      .agg(sum(when(abs(col(vCol) - col("med")) > lit(k) * col("mad"),
        col(cntCol)).otherwise(lit(0L))).as("n_out"))
      .select(keys.map(col) :+ col("n_total").as("n") :+ col("med") :+
        col("mad") :+ col("n_out") :+
        (col("n_out") / col("n_total")).as("out_frac"): _*)
  }
}
