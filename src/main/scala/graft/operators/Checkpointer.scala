package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *    storage). Survives executor loss; `release` deletes a superseded
  *    step's checkpoint files directly (Spark's own cleaner only acts
  *    with `spark.cleaner.referenceTracking.cleanCheckpoints=true`, and
  *    then only at GC time).
  *  - [[CheckpointMode.Path]] — write/re-read parquet under `dir`.
  *    Survives executor AND driver loss, is inspectable mid-run, and a
  *    restarted job can resume from the last written step via
  *    [[Checkpointer.lastCompleteStep]] + [[Checkpointer#resumeAt]] —
  *    wired as `resume = true` across the whole iterative family
  *    (PageRank, connected components, k-means, k-core, label
  *    propagation, HyperBall, random walks, PQ training, both BPE
  *    trainers; ResumeSpec kills each mid-run and proves bit-identical
  *    restart). The ONE deliberate exemption is `Pca.leadingEigen`:
  *    its entire iteration state is a d-component vector — driver-sized
  *    by construction — so a restart recomputes from the (already
  *    materialized) covariance table in seconds; see its scaladoc.
  *    Superseded steps are deleted on `release`; the final step's files
  *    outlive the operator (the returned frame lazily reads them —
  *    don't delete `dir` before consuming the result).
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

object Checkpointer {

  private def stepPath(dir: String, tag: String, step: Int) =
    s"$dir/$tag-step-$step"

  /** Is the parquet commit marker present for this step? An in-flight
    * write that died mid-iteration leaves a dir WITHOUT `_SUCCESS` —
    * such steps are not resumable and get overwritten on re-run.
    */
  private def isComplete(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Path-mode resume, step lookup: the frame of a specific step iff
    * its write completed (commit marker present). Prefix steps an
    * operator never releases (id tables, adjacency) are re-read with
    * this at fixed step numbers.
    */
  def completeStep(spark: SparkSession, dir: String, tag: String,
                   step: Int): Option[DataFrame] = {
    val p = stepPath(dir, tag, step)
    if (isComplete(spark, p)) Some(spark.read.parquet(p)) else None
  }

  /** Path-mode resume, bulk step read: ONE flat multi-path scan over
    * steps `lo..hi` iff EVERY step's commit marker is present (None
    * otherwise). The per-step alternative — reading each step and
    * folding with a left-deep union — builds an O(steps)-deep plan
    * that stalls the analyzer at BPE's documented 32k-merge scale;
    * all steps of one tag share a schema, so a single reader over the
    * committed paths yields the same rows with an O(1) plan.
    */
  def completeSteps(spark: SparkSession, dir: String, tag: String,
                    lo: Int, hi: Int): Option[DataFrame] = {
    val ps = (lo to hi).map(stepPath(dir, tag, _))
    if (ps.nonEmpty && ps.forall(isComplete(spark, _)))
      Some(spark.read.parquet(ps: _*))
    else None
  }

  /** Path-mode resume, frontier discovery: the HIGHEST complete step
    * under `dir` for `tag`, with a frame reading it. Released
    * (deleted) and in-flight (uncommitted) steps are skipped; None if
    * no complete step exists. One driver-side directory listing —
    * no data is read.
    */
  def lastCompleteStep(spark: SparkSession, dir: String,
                       tag: String): Option[(Int, DataFrame)] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val pat = s"""\\Q$tag\\E-step-(\\d+)""".r
    val steps = fs.listStatus(base).toSeq.flatMap { st =>
      st.getPath.getName match {
        case pat(n) if st.isDirectory => Some(n.toInt)
        case _ => None
      }
    }
    steps.sorted(Ordering.Int.reverse)
      .find(s => isComplete(spark, stepPath(dir, tag, s)))
      .map(s => (s, spark.read.parquet(stepPath(dir, tag, s))))
  }
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

  /** Path-mode resume: re-enter an existing run at `atStep`, whose
    * frame the caller found via [[Checkpointer.lastCompleteStep]].
    * Subsequent `materialize` calls continue numbering AFTER it (an
    * uncommitted leftover of the step that was in flight when the
    * previous driver died gets overwritten), and the frame is adopted
    * into this instance's backing map so `release` can reclaim it once
    * the next iteration supersedes it.
    */
  def resumeAt(atStep: Int, frame: DataFrame): DataFrame = mode match {
    case CheckpointMode.Path(dir) =>
      step = atStep
      backing(frame) = s"$dir/$tag-step-$atStep"
      frame
    case _ =>
      throw new IllegalArgumentException(
        s"resumeAt is Path-mode only (mode is $mode)")
  }

  /** Reclaim a superseded step: unpersist its blocks (local), delete
    * its checkpoint files (reliable — Spark's reference-tracking
    * cleaner is off by default and GC-driven when on, so an iterative
    * run must reclaim its own superseded steps), or delete its parquet
    * files (path). Only frames returned by THIS instance's
    * `materialize`/`resumeAt` are eligible; anything else is a no-op.
    */
  def release(df: DataFrame): Unit = mode match {
    case CheckpointMode.Path(_) =>
      backing.remove(df).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(hp, true)
      }
    case CheckpointMode.Reliable =>
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach { r =>
        r.unpersist(blocking = false)
        r.getCheckpointFile.foreach { f =>
          val hp = new org.apache.hadoop.fs.Path(f)
          hp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(hp, true)
        }
      }
    case CheckpointMode.Local => Lineage.releaseCheckpoint(df)
  }
}
