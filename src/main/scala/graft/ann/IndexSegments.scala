package graft.ann

import graft.operators.VersionedState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared SEGMENT ALGEBRA of the durable index family
  * ([[IvfIndex]], [[PqIndex]], [[IvfPqIndex]]) — everything the three
  * indexes have in common once "a version" is (dial tables + one
  * `segment/` table) under a [[graft.operators.VersionedState]] commit:
  *
  *  - '''labels''': `base` (a build — full retrain + full segment),
  *    `base-compact` (a [[compact]] — dials carried, segments folded),
  *    `delta` / `delta:<id>` (a refresh — dials carried, delta
  *    segment), `tombstone` (a delete — dials carried, `tombstones/`
  *    id table instead of a segment). Any `base*` label starts a new
  *    read horizon; everything before it is dead.
  *  - '''the live relation''' ([[live]]): the union of every segment
  *    from the latest base onward, minus rows whose id is tombstoned
  *    by a LATER version — so a delete kills every earlier segment's
  *    rows for that id, and a re-add refreshed AFTER the delete
  *    survives (the delete-then-refresh ordering q272 gates and the
  *    index specs pin).
  *  - '''replay idempotence''' ([[alreadyDelivered]]): a refresh that
  *    carries a caller-supplied delta id commits under `delta:<id>`;
  *    re-delivering the same id is a NO-OP returning the already-
  *    committed version — the protocol closes the duplicate-on-replay
  *    footgun instead of documenting it. Id-less refreshes keep the
  *    additive append semantics (exactly-once delivery stays the
  *    caller's contract there). The guard's window is the current
  *    read horizon: a build GCs all prior versions, so ids delivered
  *    before a full rebuild are re-deliverable after it — by then
  *    their rows live in the rebuilt base segment, so re-delivery is
  *    the caller re-syncing, not the crash-replay this guard exists
  *    for.
  *  - '''compaction''' ([[compact]]): fold every live segment since
  *    the last base into ONE `base-compact` version (dials copied —
  *    no retrain; assignments/codes are immutable given frozen dials),
  *    physically excising tombstoned rows, then GC everything below.
  *    This bounds two things that otherwise grow one unit per refresh
  *    forever: the segment fan-out [[live]] unions, and the marker
  *    count [[graft.operators.VersionedState.committed]] reads
  *    serially on the driver. A daily-refresh index compacts on
  *    whatever cadence keeps both O(1)-ish; q271 gates
  *    `compacted ≡ pre-compaction union` hash-exact.
  *
  * Scale shape: [[live]] adds one long column and (only when
  * tombstones exist) one join against the tombstone-id table — the
  * tombstone side is bounded by deletions since the last compaction,
  * and compaction resets it to zero. [[compact]]'s cost is one read +
  * write of the live relation — the same IO a build's segment write
  * already pays, WITHOUT the retrain or the re-route.
  */
private[graft] object IndexSegments {

  /** Marker label for a refresh: `delta` (id-less, additive) or
    * `delta:<id>` (replay-guarded).
    */
  def deltaLabel(deltaId: String): String = {
    require(deltaId.length <= 200 && !deltaId.exists(c => c == '\n' || c == '\r'),
      "delta id must be ≤200 chars with no line breaks (it rides in the " +
        "commit marker)")
    if (deltaId.isEmpty) "delta" else s"delta:$deltaId"
  }

  /** The latest `base*` version — the read horizon's start. */
  def lastBase(cs: Seq[(Long, String)], stateDir: String): Long =
    cs.filter(_._2.startsWith("base")).map(_._1).maxOption.getOrElse(
      throw new IllegalStateException(
        s"$stateDir has committed versions but no base — corrupt index state"))

  /** The committed version carrying `delta:<deltaId>`, if the id was
    * already delivered on the current read horizon (None for id-less
    * calls — those are never replay-guarded).
    */
  def alreadyDelivered(spark: SparkSession, stateDir: String,
                       deltaId: String): Option[Long] =
    if (deltaId.isEmpty) None
    else VersionedState.committed(spark, stateDir)
      .collectFirst { case (n, l) if l == s"delta:$deltaId" => n }

  /** The live index relation (see object doc), or None before the
    * first commit. Segment rows must carry an `id` column — the key
    * tombstones address.
    */
  def live(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val cs = VersionedState.committed(spark, stateDir)
    if (cs.isEmpty) return None
    val base = lastBase(cs, stateDir)
    val since = cs.filter(_._1 >= base)
    val segs = since.collect { case (n, l) if !l.startsWith("tombstone") =>
      spark.read.parquet(s"${VersionedState.versionPath(stateDir, n)}/segment")
        .withColumn("_seg_v", lit(n))
    }
    val all = segs.reduce(_.unionByName(_))
    val tombs = since.collect { case (n, l) if l.startsWith("tombstone") =>
      spark.read.parquet(s"${VersionedState.versionPath(stateDir, n)}/tombstones")
        .select(col("id").as("_tomb_id"), lit(n).as("_tomb_v"))
    }
    val out =
      if (tombs.isEmpty) all
      else {
        // one id may be deleted more than once; the LATEST tombstone
        // decides which segments it kills
        val t = tombs.reduce(_.unionByName(_))
          .groupBy("_tomb_id").agg(max("_tomb_v").as("_tomb_v"))
        all.join(t, col("id") === col("_tomb_id"), "left")
          .where(col("_tomb_v").isNull || col("_seg_v") > col("_tomb_v"))
          .drop("_tomb_id", "_tomb_v")
      }
    Some(out.drop("_seg_v"))
  }

  /** Commit a tombstone version: the latest version's dial tables
    * (`dialDirs`) carried forward unchanged + a `tombstones/` table of
    * the (distinct) ids to delete. `ids`' FIRST column is the id.
    */
  def commitTombstone(ids: DataFrame, stateDir: String,
                      dialDirs: Seq[String]): Long = {
    val spark = ids.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    require(prev.nonEmpty,
      s"no committed index at $stateDir — nothing to delete from")
    val pdir = VersionedState.versionPath(stateDir, prev.get)
    val dials = dialDirs.map(d => d -> spark.read.parquet(s"$pdir/$d"))
    val tomb = ids.select(col(ids.columns.head).as("id")).distinct()
    VersionedState.commit(spark, stateDir, prev, label = "tombstone") { vdir =>
      dials.foreach { case (d, df) =>
        df.write.mode("overwrite").parquet(s"$vdir/$d")
      }
      tomb.write.mode("overwrite").parquet(s"$vdir/tombstones")
    }
  }

  /** Fold the read horizon into one `base-compact` version (see object
    * doc) and GC everything below it. A lone base with nothing to fold
    * is already compact — returned as-is, no commit.
    */
  def compact(spark: SparkSession, stateDir: String,
              dialDirs: Seq[String]): Long = {
    val cs = VersionedState.committed(spark, stateDir)
    require(cs.nonEmpty, s"no committed index at $stateDir — nothing to compact")
    val base = lastBase(cs, stateDir)
    val cur = cs.last._1
    if (cur == base) return cur
    val pdir = VersionedState.versionPath(stateDir, cur)
    val dials = dialDirs.map(d => d -> spark.read.parquet(s"$pdir/$d"))
    val folded = live(spark, stateDir).get
    val next = cur + 1
    // the folded plan lazily reads the old segments; the write inside
    // commit() materializes it BEFORE the post-marker GC deletes them
    VersionedState.commit(spark, stateDir, Some(cur), label = "base-compact",
      gcBelow = next) { vdir =>
      dials.foreach { case (d, df) =>
        df.write.mode("overwrite").parquet(s"$vdir/$d")
      }
      folded.write.mode("overwrite").parquet(s"$vdir/segment")
    }
  }
}
