package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union per key — total covered span of overlapping
  * intervals (device uptime from heartbeats, user active time from
  * event windows, effective coverage of crawl leases). The classic
  * sweep: order each key's intervals by start, open a new merged span
  * whenever a start exceeds the running max end of everything before
  * it, then aggregate spans.
  *
  * Scale shape: both windows partition BY KEY — per-key bounded work,
  * the one window shape that survives scale (no global ordering, no
  * corpus sort; a skewed key is bounded by its own interval count).
  * The sweep uses ROWS frames explicitly: the default RANGE frame
  * would include same-start peers in the running max and silently
  * merge spans that a tie-broken sweep keeps separate.
  *
  * Intervals are closed-closed in integer units; a span that STARTS
  * exactly at the running max end (touching) merges — document-side
  * convention, mirrored in oracles via the strict `>` test.
  */
object IntervalUnion {

  /** Merged spans per key: (key, grp, span_start, span_end). `tieCol`
    * makes the sweep order total for same-start intervals.
    */
  def mergedSpans(intervals: DataFrame, keyCol: String, startCol: String,
                  endCol: String, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col(startCol), col(tieCol))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upto = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    intervals
      .withColumn("_prev_end", max(col(endCol)).over(prev))
      .withColumn("_newg",
        when(col("_prev_end").isNull || col(startCol) > col("_prev_end"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("_newg")).over(upto))
      .groupBy(col(keyCol), col("grp"))
      .agg(min(col(startCol)).as("span_start"), max(col(endCol)).as("span_end"))
  }

  /** Per-key coverage report: (key, n_spans, covered) where covered =
    * Σ (span_end − span_start) — exact integer arithmetic.
    */
  def coverage(intervals: DataFrame, keyCol: String, startCol: String,
               endCol: String, tieCol: String): DataFrame =
    mergedSpans(intervals, keyCol, startCol, endCol, tieCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("covered"))
}
