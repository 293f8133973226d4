package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog compaction — the CDC "latest state" view: from a stream
  * of keyed upserts and deletes, keep each key's most recent payload,
  * and drop keys whose latest operation is a delete (tombstone). This
  * is the materialization step every incremental 100 TB corpus needs
  * when its source is a change feed rather than immutable snapshots.
  *
  * Scale shape: ONE mergeable max-struct hash aggregation over the
  * changelog — map-side partials keep a single candidate row per
  * (key, partition), so the shuffle carries at most one row per key
  * per input partition. Never a row_number window (which would sort
  * every key's full history), never a self-join against max(ts).
  * Late/duplicate events are handled by the total (ts, tie) order:
  * re-running compaction over the same feed is idempotent.
  */
object Compaction {

  /** Latest surviving row per key: (keyCols..., payloadCols...,
    * ordered by (tsCol, tieCols) — the tie columns make the order
    * total, so results are deterministic under at-least-once feeds).
    * Rows matching `deletePred` act as tombstones: they win the
    * argmax like any other op, but erase the key from the output.
    */
  def latest(changelog: DataFrame, keyCols: Seq[String], tsCol: String,
             tieCols: Seq[String], payloadCols: Seq[String],
             deletePred: Column): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(payloadCols.nonEmpty, "need at least one payload column")
    val ord = struct((tsCol +: tieCols).map(col): _*)
    val carried = struct(
      (payloadCols.map(col) :+ deletePred.as("_del") :+
        col(tsCol).as("_ts")): _*)
    changelog.groupBy(keyCols.map(col): _*)
      .agg(max_by(carried, ord).as("last"))
      .where(!col("last._del"))
      .select(keyCols.map(col) ++
        payloadCols.map(p => col(s"last.$p").as(p)) :+
        col("last._ts").as(tsCol): _*)
  }
}
