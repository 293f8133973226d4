package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-management helpers for iterative DataFrame loops (label
  * propagation, Lloyd iterations): each converged step is materialized
  * via `localCheckpoint` so step N+1 reads N's rows instead of
  * re-deriving the whole upstream plan — and the superseded step's
  * storage must then be released explicitly, or a long run pins every
  * iteration's blocks in executor memory.
  */
object Lineage {

  /** Release the persisted RDD blocks behind a `localCheckpoint`ed
    * frame: the checkpoint materializes behind a `LogicalRDD` node, and
    * Spark never unpersists it on its own.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
