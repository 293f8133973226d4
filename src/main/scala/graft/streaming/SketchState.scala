package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HyperLogLog, Kmv}

/** DURABLE cross-snapshot sketch state — the q225 contract
  * (`merge(stored, sketch(Δ)) ≡ sketch(S ∪ Δ)`) packaged as the
  * `foreachBatch` maintenance step of a streaming ingest: each
  * micro-batch's sketch is merged into a parquet state table that
  * OUTLIVES the query — kill the stream, start a new one against the
  * same directory, and maintenance resumes from what disk says, not
  * from executor memory (SketchStateSpec's restart case drives exactly
  * that). At 100 TB this is the only viable refresh shape: the state
  * table is bounded (keys × m register rows / keys × k-slot arrays),
  * the batch side touches only the delta, and history is never
  * re-scanned.
  *
  * Merge algebra makes replay safe for HLL (register MAX and
  * bottom-k-of-union are IDEMPOTENT — an at-least-once redelivery of a
  * batch is a no-op), so the state stays correct even when a restart
  * replays the last uncommitted micro-batch.
  *
  * == Commit protocol ==
  *
  * State lives in VERSIONED subdirectories with an append-only commit
  * log — never an in-place overwrite of the directory being read:
  *
  * {{{
  * stateDir/
  *   v0000000000000000001/   ← full sketch table, plain parquet
  *   v0000000000000000002/
  *   commits/1  commits/2    ← zero-byte markers; marker CREATION is
  *                             the commit point (atomic create on
  *                             HDFS; single PUT on object stores)
  * }}}
  *
  * A merge reads the highest committed version n, writes the merged
  * table to the FRESH directory v(n+1), and only then creates
  * `commits/(n+1)`. A crash anywhere before the marker leaves vn as
  * the committed state — the half-written v(n+1) is invisible to
  * `read` and simply overwritten by the next attempt. This is the
  * kill-mid-commit scenario a flat `mode("overwrite")` of the state
  * directory cannot survive (the old layout's `_SUCCESS` check would
  * read the torn directory as EMPTY state, and the next merge would
  * silently replace all accumulated history with the current delta).
  * After committing, versions older than the previous one are
  * garbage-collected, so at most two live on disk.
  *
  * All paths resolve through Hadoop `FileSystem` from the session's
  * `hadoopConfiguration` — the state directory may be local, HDFS, or
  * an object store; nothing here assumes `java.io.File` semantics.
  * Single-writer discipline is assumed (one maintenance stream per
  * state directory — the foreachBatch contract); a concurrent second
  * writer is surfaced by the marker's create-exclusive failing, not
  * silently merged.
  */
object SketchState {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versionDir(root: Path, n: Long): Path =
    new Path(root, f"v$n%019d")

  /** Highest committed version, or None if no commit has ever
    * succeeded. A state directory that exists but holds anything
    * OTHER than this module's layout (version dirs + commit log) is
    * an error to surface — e.g. a flat parquet table from the
    * pre-versioned layout, or a caller pointing at the wrong path —
    * never silently treated as empty state.
    */
  private def currentVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, stateDir)
    if (!fs.exists(root)) return None
    val foreign = fs.listStatus(root).map(_.getPath.getName).filterNot { n =>
      n == "commits" || (n.startsWith("v") && n.drop(1).forall(_.isDigit))
    }
    require(foreign.isEmpty,
      s"$stateDir exists but is not a SketchState directory " +
        s"(unexpected entries: ${foreign.sorted.mkString(", ")}) — refusing " +
        "to treat it as empty state")
    val commits = new Path(root, "commits")
    val committed =
      if (fs.exists(commits))
        fs.listStatus(commits).toSeq.flatMap(_.getPath.getName.toLongOption)
      else Nil
    // version dirs without any marker = a crashed FIRST commit; there
    // was no committed state to lose, so empty is the truth
    if (committed.isEmpty) None else Some(committed.max)
  }

  /** The stored state table, or None before the first commit. */
  def read(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentVersion(spark, stateDir).map { n =>
      spark.read.parquet(versionDir(new Path(stateDir), n).toString)
    }

  /** Write `merged` as version prev+1 and atomically commit it; GC
    * versions older than prev. `merged`'s plan may lazily read the
    * prev version — safe, because the write target is a different
    * directory (the whole point of the versioned layout).
    */
  private def commit(spark: SparkSession, stateDir: String,
                     merged: DataFrame, prev: Option[Long]): Unit = {
    val (fs, root) = fsOf(spark, stateDir)
    val next = prev.getOrElse(0L) + 1L
    // overwrite clears a half-written leftover of a crashed attempt
    // at this same version — it was never committed, nothing is lost
    merged.write.mode("overwrite").parquet(versionDir(root, next).toString)
    val commits = new Path(root, "commits")
    fs.mkdirs(commits)
    // create-exclusive IS the commit point; an existing marker means a
    // second writer committed this version — surface, don't clobber
    fs.create(new Path(commits, next.toString), false).close()
    for (p <- prev; old <- 1L until p) {
      fs.delete(new Path(commits, old.toString), false)
      fs.delete(versionDir(root, old), true)
    }
  }

  /** Merge one batch's HLL sketch into the state table at `stateDir`. */
  def mergeHllBatch(batch: DataFrame, item: Column, keys: Seq[String],
                    m: Int, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = currentVersion(spark, stateDir)
    val stored = prev.map(n =>
      spark.read.parquet(versionDir(new Path(stateDir), n).toString))
    val delta = HyperLogLog.sketch(batch, item, keys, m)
    val merged = stored.map(st => HyperLogLog.merge(st, delta)).getOrElse(delta)
    commit(spark, stateDir, merged, prev)
  }

  /** Merge one batch's bucket-histogram counters into the state table
    * at `stateDir` — the quantile member of the durable-state family.
    * UNLIKE the KMV/HLL members, counter ADDITION is not idempotent:
    * replaying a batch double-counts (SketchStateSpec pins exactly
    * that), so replay safety must come from exactly-once batch
    * delivery (a checkpointed source whose offsets commit with the
    * state write), not from the merge algebra. Use the KMV/HLL members
    * when the source is at-least-once.
    */
  def mergeHistogramBatch(batch: DataFrame, value: Column,
                          keys: Seq[String], width: Long,
                          stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = currentVersion(spark, stateDir)
    val stored = prev.map(n =>
      spark.read.parquet(versionDir(new Path(stateDir), n).toString))
    val delta = graft.functions.BucketHistogram.sketch(batch, value, keys, width)
    val merged = stored
      .map(st => graft.functions.BucketHistogram.merge(st, delta))
      .getOrElse(delta)
    commit(spark, stateDir, merged, prev)
  }

  /** Merge one batch's KMV sketch into the state table at `stateDir`. */
  def mergeKmvBatch(batch: DataFrame, item: Column, keys: Seq[String],
                    k: Int, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = currentVersion(spark, stateDir)
    val stored = prev.map(n =>
      spark.read.parquet(versionDir(new Path(stateDir), n).toString))
    val delta = Kmv.sketch(batch, item, keys, k)
    val merged = stored match {
      case None => delta
      case Some(st) =>
        // full outer: a key may exist only in history or only in Δ
        st.withColumnRenamed("kmv", "kmv_st")
          .join(delta.withColumnRenamed("kmv", "kmv_d"), keys, "full_outer")
          .select(keys.map(col) :+
            Kmv.mergeArrays(
              coalesce(col("kmv_st"), array().cast("array<bigint>")),
              coalesce(col("kmv_d"), array().cast("array<bigint>")),
              k).as("kmv"): _*)
    }
    commit(spark, stateDir, merged, prev)
  }
}
