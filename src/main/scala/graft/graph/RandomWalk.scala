package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the sampling step of
  * graph-embedding pipelines (DeepWalk/node2vec): emit fixed-length
  * walks over an edge set, and the walk corpus becomes skip-gram
  * training data. "Random" is hash-seeded and fully deterministic:
  * at step t, walk w standing on node v moves to the neighbor d
  * minimizing md5("w:t:v:d") — uniform over neighbors, reproducible
  * run-to-run, and exactly mirrorable by any engine with md5 (the
  * q97 portable-hash discipline; no RNG state to ship).
  *
  * Scale shape (100 TB graph): each step is ONE equi-join of the
  * frontier (walks-sized, small) against the edge table partitioned by
  * src, followed by a mergeable min-struct hash aggregation — the
  * PageRank iteration shape; no windows over the corpus, no driver
  * collects. The frontier is localCheckpoint-ed per step so step L's
  * plan does not nest L−1 joins. Walks that hit a dead-end node simply
  * stop (inner join drops them); the emitted corpus keeps every
  * visited prefix.
  */
object RandomWalk {

  /** Walk corpus (walk_id, step, node): `walksPerNode` walks from each
    * start node, extended `steps` times. walk_id = "<start>#<w>".
    *
    * Every per-step frontier is materialized WITH its step column via
    * the checkpoint-mode dial, and the emitted corpus is the union of
    * the step frames — so no step is ever released, and Path-mode
    * `resume = true` re-enters a dead run with ONE flat multi-path
    * read of the committed steps (checkpoint step 1+t = walk step t).
    * Hash-seeded hops make the resumed tail bit-identical to an
    * uninterrupted run (ResumeSpec); the resumed call must use the
    * same (edges, starts, walksPerNode) dials.
    */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
            starts: DataFrame, startCol: String,
            walksPerNode: Int, steps: Int,
            checkpoint: graft.operators.CheckpointMode =
              graft.operators.CheckpointMode.Local,
            resume: Boolean = false): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be positive, got $walksPerNode")
    require(steps >= 1, s"steps must be positive, got $steps")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val cp = new graft.operators.Checkpointer(checkpoint, "walk")
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        for {
          (s, front) <- graft.operators.Checkpointer
            .lastCompleteStep(spark, dir, "walk")
          if s >= 1 && s <= steps + 1
          all <- graft.operators.Checkpointer
            .completeSteps(spark, dir, "walk", 1, s)
        } yield (s, front, all)
      case _ => None
    }
    var (frontier, path, done) = resumed match {
      case Some((s, front, all)) =>
        cp.resumeAt(s, front)
        (front.select("walk_id", "node"), all, s - 1)
      case None =>
        val f0 = cp.materialize(starts
          .select(explode(sequence(lit(0), lit(walksPerNode - 1))).as("w"),
            col(startCol).as("node"))
          .select(concat_ws("#", col("node"), col("w")).as("walk_id"),
            col("node"))
          .withColumn("step", lit(0)))
        (f0.select("walk_id", "node"), f0, 0)
    }
    ((done + 1) to steps).foreach { t =>
      val next = cp.materialize(frontier.join(e, col("node") === col("src"))
        .groupBy("walk_id")
        .agg(min(struct(
          md5(concat_ws(":", col("walk_id"), lit(t), col("src"), col("dst")))
            .as("h"),
          col("dst").as("d"))).as("pick"))
        .select(col("walk_id"), col("pick.d").as("node"))
        .withColumn("step", lit(t)))
      path = path.unionByName(next)
      frontier = next.select("walk_id", "node")
    }
    path.select(col("walk_id"), col("step"), col("node"))
  }

  /** Skip-gram training pairs from a walk corpus: for every walk
    * position, each co-walker within `window` steps (either side,
    * never itself) becomes a (center, context) example; aggregated to
    * pair counts — exactly the word2vec-over-walks data layout
    * (DeepWalk §4.2). The self-join keys on walk_id, so the quadratic
    * is bounded by walk length × window at any corpus size, and the
    * count is one mergeable hash aggregation.
    */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    walks.as("a")
      .join(walks.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("a.step") =!= col("b.step") &&
          abs(col("a.step") - col("b.step")) <= window)
      .groupBy(col("a.node").as("center"), col("b.node").as("context"))
      .agg(count(lit(1)).as("n"))
  }
}
