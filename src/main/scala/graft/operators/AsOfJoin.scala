package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single LATEST right row with
  * `right.ts <= left.ts` in the same key group (the time-series lookup
  * join of kdb/Flink/DuckDB; absent from the reference — SURVEY.md §2.3
  * "absent" row — and from Spark's built-ins).
  *
  * Scalable formulation: UNION the two sides, then one window pass per
  * key partition carrying the last-seen right row forward
  * (`last_value(..., ignoreNulls)` over rows-unbounded-preceding). That
  * is ONE shuffle on the key and an O(n log n) per-partition sort — no
  * range-condition join, whose candidate explosion is what kills naive
  * as-of at scale. Ties: a right row AT the left timestamp matches
  * (sorts first via the side tag); equal-timestamp right rows resolve
  * to the largest `tieCol`.
  */
object AsOfJoin {

  /** @param keys    equi-join key columns (present on both sides)
    * @param tsCol   event-time column name (both sides, numeric or timestamp)
    * @param tieCol  right-side deterministic tie-break column
    * @param payload right-side columns to carry onto matched left rows
    *                (returned as `asof_<name>`, NULL when no match)
    * @param maxStaleness optional staleness bound (the pandas
    *                `merge_asof(tolerance=...)` / kdb window knob): a
    *                carried right row older than `left.ts − maxStaleness`
    *                is treated as NO match (payload NULL). Same type as
    *                `left.ts − right.ts` (numeric diff for numeric ts,
    *                interval for timestamps). Costs nothing extra — the
    *                matched right timestamp already rides the carried
    *                struct, so the bound is one map-side comparison.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, tieCol: String, payload: Seq[String],
           maxStaleness: Option[Column] = None): DataFrame = {
    // Internal column names: a payload column literally named _asof_ts
    // would produce a carried struct with duplicate field names (the
    // staleness extraction `_match._asof_ts` becomes ambiguous), and an
    // input column named like one of the union-side internals would
    // collide in the aligned select.
    require(!payload.contains("_asof_ts"),
      "asOf reserves the payload field name _asof_ts; rename that column")
    val reserved = Set("_side", "_tie", "_r", "_match")
    val colliding = (left.columns ++ right.columns).filter(reserved)
    require(colliding.isEmpty,
      s"asOf reserves column names ${reserved.mkString(", ")}; rename: ${colliding.mkString(", ")}")
    val keyCols = keys.map(col)
    val tsType = right.schema(tsCol).dataType.sql
    val l = left.withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(tieCol).dataType))
      .withColumn("_r", lit(null).cast("struct<" +
        (payload.map(p => s"$p:${right.schema(p).dataType.sql}") :+
          s"_asof_ts:$tsType").mkString(",") + ">"))
    val r = right.select(
      (keyCols :+ col(tsCol).as(tsCol)) ++ Seq(
        lit(0).as("_side"),
        col(tieCol).as("_tie"),
        struct(payload.map(col) :+ col(tsCol).as("_asof_ts"): _*).as("_r")): _*)
    // align: keep every left column + the three internals
    val lAligned = l.select(
      (left.columns.map(col) ++ Seq(col("_side"), col("_tie"), col("_r"))): _*)
    val rAligned = left.columns.foldLeft(r) { (df, c) =>
      if (keys.contains(c) || c == tsCol) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((left.columns.map(col) ++ Seq(col("_side"), col("_tie"), col("_r"))): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = lAligned.unionByName(rAligned)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val carried = maxStaleness match {
      case None => carried0
      case Some(tol) => carried0.withColumn("_match",
        when(col("_match").isNotNull &&
          col(tsCol) - col("_match._asof_ts") > tol, lit(null))
          .otherwise(col("_match")))
    }
    payload.foldLeft(carried) { (df, p) =>
        df.withColumn(s"asof_$p", col(s"_match.$p"))
      }
      .drop("_side", "_tie", "_r", "_match")
  }
}
