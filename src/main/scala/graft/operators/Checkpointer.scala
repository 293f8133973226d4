package graft.operators

import org.apache.spark.sql.DataFrame

/** Durability dial for iterative operators (connected components,
  * Lloyd iterations, PageRank). Each mode trades speed for
  * survivability of the materialized per-iteration table:
  *
  *  - [[CheckpointMode.Local]] — `localCheckpoint()`: executor-local,
  *    non-replicated blocks. Fastest; the right call on a single-node
  *    session. On a cluster, losing ANY executor after lineage
  *    truncation kills the job unrecoverably (lineage is gone by
  *    design).
  *  - [[CheckpointMode.Reliable]] — `Dataset.checkpoint()`: writes the
  *    RDD to `sparkContext.setCheckpointDir` (typically HDFS/object
  *    storage). Survives executor loss; files are cleaned by Spark only
  *    with `spark.cleaner.referenceTracking.cleanCheckpoints=true`, else
  *    they persist until the checkpoint dir is deleted.
  *  - [[CheckpointMode.Path]] — write/re-read parquet under `dir`.
  *    Survives executor AND driver loss, is inspectable mid-run, and a
  *    restarted job can resume from the last written step. Superseded
  *    steps are deleted on `release`; the final step's files outlive the
  *    operator (the returned frame lazily reads them — don't delete
  *    `dir` before consuming the result).
  *
  * A Checkpointer instance owns one operator run: it numbers the steps
  * it writes (path mode) and tracks which frame maps to which files so
  * `release` can reclaim superseded iterations in every mode.
  */
sealed trait CheckpointMode
object CheckpointMode {
  case object Local extends CheckpointMode
  case object Reliable extends CheckpointMode
  final case class Path(dir: String) extends CheckpointMode
}

final class Checkpointer(mode: CheckpointMode, tag: String) {
  private var step = 0
  // keyed by reference identity (Dataset doesn't override equals) —
  // exactly the frames this instance returned from materialize
  private val backing = scala.collection.mutable.Map.empty[DataFrame, String]

  /** Eagerly materialize `df` per the mode and return a frame whose
    * plan reads the materialized rows (lineage truncated in all modes).
    */
  def materialize(df: DataFrame): DataFrame = mode match {
    case CheckpointMode.Local => df.localCheckpoint()
    case CheckpointMode.Reliable =>
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "CheckpointMode.Reliable needs sparkContext.setCheckpointDir(...) before the run")
      df.checkpoint()
    case CheckpointMode.Path(dir) =>
      step += 1
      val p = s"$dir/$tag-step-$step"
      df.write.mode("overwrite").parquet(p)
      val out = df.sparkSession.read.parquet(p)
      backing(out) = p
      out
  }

  /** Reclaim a superseded step: unpersist its blocks (local/reliable)
    * or delete its parquet files (path). Only frames returned by THIS
    * instance's `materialize` are eligible; anything else is a no-op.
    */
  def release(df: DataFrame): Unit = mode match {
    case CheckpointMode.Path(_) =>
      backing.remove(df).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(hp, true)
      }
    case _ => Lineage.releaseCheckpoint(df)
  }
}
