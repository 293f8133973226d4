package graft.streaming


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

  import graft.operators.VersionedState

  /** The stored state table, or None before the first commit (the
    * foreign-directory and crashed-first-commit semantics live in
    * [[graft.operators.VersionedState.committed]]).
    */
  def read(spark: SparkSession, stateDir: String): Option[DataFrame] =
    VersionedState.currentVersion(spark, stateDir).map { n =>
      spark.read.parquet(VersionedState.versionPath(stateDir, n))
    }

  /** Write `merged` as version prev+1 and atomically commit it; GC
    * versions older than prev (two stay live). `merged`'s plan may
    * lazily read the prev version — safe, because the write target is
    * a different directory (the whole point of the versioned layout).
    */
  private def commit(spark: SparkSession, stateDir: String,
                     merged: DataFrame, prev: Option[Long]): Unit =
    VersionedState.commit(spark, stateDir, prev,
      gcBelow = prev.getOrElse(Long.MinValue)) { vdir =>
      merged.write.mode("overwrite").parquet(vdir)
    }

  /** Merge one batch's HLL sketch into the state table at `stateDir`. */
  def mergeHllBatch(batch: DataFrame, item: Column, keys: Seq[String],
                    m: Int, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    val stored = prev.map(n =>
      spark.read.parquet(VersionedState.versionPath(stateDir, n)))
    val delta = HyperLogLog.sketch(batch, item, keys, m)
    val merged = stored.map(st => HyperLogLog.merge(st, delta)).getOrElse(delta)
    commit(spark, stateDir, merged, prev)
  }

  /** Merge one batch's bucket-histogram counters into the state table
    * at `stateDir` — the quantile member of the durable-state family.
    * UNLIKE the KMV/HLL members, counter ADDITION is not idempotent:
    * replaying a batch double-counts (SketchStateSpec pins exactly
    * that for the id-less call). Passing `batchId` (Structured
    * Streaming's `foreachBatch` batch id, stringified) closes the
    * hazard for the crash-restart case: the id rides in the commit
    * marker, and a batch whose id is already committed AMONG THE LIVE
    * VERSIONS is a no-op. The guard's window is the GC retention (two
    * versions) — exactly the replay Structured Streaming can produce
    * on restart, which re-delivers only the last uncommitted batch.
    * An id-less call keeps the raw additive semantics (exactly-once
    * delivery is then the caller's job); KMV/HLL never need the id —
    * their merges are idempotent by algebra.
    */
  def mergeHistogramBatch(batch: DataFrame, value: Column,
                          keys: Seq[String], width: Long,
                          stateDir: String, batchId: String = ""): Unit = {
    val spark = batch.sparkSession
    // byte-bounded so the marker holds the id WHOLE — a truncated id
    // would make the equality guard silently never match
    graft.ann.IndexSegments.validDeltaId(batchId)
    val label = if (batchId.isEmpty) "" else s"batch:$batchId"
    val committed = VersionedState.committed(spark, stateDir)
    if (batchId.nonEmpty && committed.exists(_._2 == label))
      return // replayed batch: its counters are already in the state
    val prev = committed.lastOption.map(_._1)
    val stored = prev.map(n =>
      spark.read.parquet(VersionedState.versionPath(stateDir, n)))
    val delta = graft.functions.BucketHistogram.sketch(batch, value, keys, width)
    val merged = stored
      .map(st => graft.functions.BucketHistogram.merge(st, delta))
      .getOrElse(delta)
    VersionedState.commit(spark, stateDir, prev, label = label,
      gcBelow = prev.getOrElse(Long.MinValue)) { vdir =>
      merged.write.mode("overwrite").parquet(vdir)
    }
  }

  /** Merge one batch's KMV sketch into the state table at `stateDir`. */
  def mergeKmvBatch(batch: DataFrame, item: Column, keys: Seq[String],
                    k: Int, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    val stored = prev.map(n =>
      spark.read.parquet(VersionedState.versionPath(stateDir, n)))
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
