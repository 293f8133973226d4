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
  */
object SketchState {

  /** The stored state table, or None before the first commit. */
  def read(spark: SparkSession, stateDir: String): Option[DataFrame] =
    if (new java.io.File(stateDir, "_SUCCESS").exists)
      Some(spark.read.parquet(stateDir))
    else None

  // The read-merge-overwrite below is safe because the state is
  // driver-bounded BY CONSTRUCTION: localCheckpoint(eager) pins the
  // merged rows into block storage BEFORE overwrite truncates the
  // directory the plan was reading from.

  /** Merge one batch's HLL sketch into the state table at `stateDir`. */
  def mergeHllBatch(batch: DataFrame, item: Column, keys: Seq[String],
                    m: Int, stateDir: String): Unit = {
    val delta = HyperLogLog.sketch(batch, item, keys, m)
    val merged = read(batch.sparkSession, stateDir)
      .map(st => HyperLogLog.merge(st, delta)).getOrElse(delta)
    merged.localCheckpoint().write.mode("overwrite").parquet(stateDir)
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
    val delta = graft.functions.BucketHistogram.sketch(batch, value, keys, width)
    val merged = read(batch.sparkSession, stateDir)
      .map(st => graft.functions.BucketHistogram.merge(st, delta))
      .getOrElse(delta)
    merged.localCheckpoint().write.mode("overwrite").parquet(stateDir)
  }

  /** Merge one batch's KMV sketch into the state table at `stateDir`. */
  def mergeKmvBatch(batch: DataFrame, item: Column, keys: Seq[String],
                    k: Int, stateDir: String): Unit = {
    val delta = Kmv.sketch(batch, item, keys, k)
    val merged = read(batch.sparkSession, stateDir) match {
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
    merged.localCheckpoint().write.mode("overwrite").parquet(stateDir)
  }
}
