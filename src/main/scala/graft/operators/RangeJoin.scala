package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match left rows to right rows whose timestamp
  * falls in `(left.ts − lookback, left.ts]` within the same key group —
  * "events in the last N minutes" (absent from the reference and from
  * Spark's batch built-ins; Structured Streaming has it only for
  * stream-stream joins).
  *
  * Scalable formulation: both sides bucket by `floor(ts / lookback)`;
  * every right row is cloned into its own bucket and the next one, so
  * any qualifying pair shares a bucket. The join is then a plain
  * equi-join on (key, bucket) — shuffle-partitionable, no O(n·m) range
  * scan — followed by the exact range filter. Bucket width = lookback
  * keeps the clone factor at exactly 2 regardless of data volume.
  */
object RangeJoin {

  /** Count + aggregate of right rows in the trailing window per left row.
    * @param leftPk   left primary-key column (one output row per value)
    * @param tsCol    timestamp column name (numeric, both sides)
    * @param lookback window width in `tsCol` units
    * @return left rows + `n_recent` (0 when none) + `sum_recent_value`
    *         (right `valueCol` summed, NULL when none)
    */
  def countRecent(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftPk: String, tsCol: String, valueCol: String,
                  lookback: Long): DataFrame = {
    val l = left.withColumn("_b", floor(col(tsCol) / lookback))
    val r = right
      .select((keys.map(col) :+ col(tsCol).as("_rts")) :+ col(valueCol).as("_rv"): _*)
      .withColumn("_b", explode(array(floor(col("_rts") / lookback),
        floor(col("_rts") / lookback) + 1)))
    val joined = l.join(r, keys :+ "_b", "left")
      .withColumn("_hit",
        col("_rts").isNotNull &&
          col("_rts") > col(tsCol) - lookback && col("_rts") <= col(tsCol))
    joined
      .groupBy((leftPk +: keys).map(col) :+ col(tsCol): _*)
      .agg(sum(when(col("_hit"), 1L).otherwise(0L)).as("n_recent"),
        sum(when(col("_hit"), col("_rv"))).as("sum_recent_value"))
  }
}
