package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout with BOUNDED file counts —
  * the directory-pruning half of storage layout (see [[Bucketing]] for
  * the shuffle-elimination half; `PartitionPruningSpec` locks the
  * planning-time pruning in as a test).
  *
  * A naive `df.write.partitionBy(...)` has two failure modes at 100 TB:
  *
  *  - **small files**: every write task emits one file per partition
  *    value it holds — 1000 tasks × 365 dates = 365k few-MB files, and
  *    every subsequent scan pays per-file open/footer costs;
  *  - **giant files**: `repartition(partCols)` collapses each value
  *    into ONE task — one unsplittable multi-GB file per value and
  *    write parallelism capped at the value count.
  *
  * [[writePartitioned]] repartitions by (partition columns, a
  * deterministic row-hash salt < filesPerPartition): each partition
  * value spreads over at most `filesPerPartition` tasks, so each
  * directory gets at most that many files (fewer when salt groups
  * co-schedule), written in parallel, with `maxRecordsPerFile` as the
  * in-task rotation cap. The salt is value-derived (stable under task
  * retry, like SaltedJoin's).
  */
object PartitionedLayout {

  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String],
                       filesPerPartition: Int,
                       maxRecordsPerFile: Long = 0L): Unit = {
    require(partCols.nonEmpty, "at least one partition column required")
    require(filesPerPartition >= 1,
      s"filesPerPartition must be positive, got $filesPerPartition")
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(filesPerPartition))
    df.repartition(partCols.map(col) :+ salt: _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}
