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
    */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
            starts: DataFrame, startCol: String,
            walksPerNode: Int, steps: Int): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be positive, got $walksPerNode")
    require(steps >= 1, s"steps must be positive, got $steps")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    var frontier = starts
      .select(explode(sequence(lit(0), lit(walksPerNode - 1))).as("w"),
        col(startCol).as("node"))
      .select(concat_ws("#", col("node"), col("w")).as("walk_id"), col("node"))
      .localCheckpoint(false)
    var path = frontier.withColumn("step", lit(0))
    (1 to steps).foreach { t =>
      val next = frontier.join(e, col("node") === col("src"))
        .groupBy("walk_id")
        .agg(min(struct(
          md5(concat_ws(":", col("walk_id"), lit(t), col("src"), col("dst")))
            .as("h"),
          col("dst").as("d"))).as("pick"))
        .select(col("walk_id"), col("pick.d").as("node"))
        .localCheckpoint(false)
      path = path.unionByName(next.withColumn("step", lit(t)))
      frontier = next
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
