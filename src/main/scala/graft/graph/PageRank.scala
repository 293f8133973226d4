package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the second iterative graph
  * primitive next to `Dedup.nearDupClustersConverged`'s connected
  * components: authority scoring of documents inside a near-dup /
  * citation / link graph (e.g. pick the canonical page of a dup
  * cluster by rank rather than by min id).
  *
  * Each iteration is one equi-join + one hash aggregation:
  * contribution of u→v is rank(u)/outdeg(u), and
  * rank'(v) = (1−d)/N + d·Σ contributions. Dangling nodes (no out
  * edges) keep receiving the teleport term but redistribute nothing —
  * the standard simplification, mirrored verbatim by the SQL oracle.
  * N rides a one-row broadcast (never a driver-side count); each
  * iteration's rank table is materialized (checkpoint-mode dial —
  * local blocks, reliable checkpoint, or parquet) so a deep run
  * re-reads |V| rows instead of re-deriving the whole lineage (the
  * kmeans-iteration lesson), and superseded iterations are released.
  *
  * Float determinism: per-node contribution sums are order-dependent,
  * so callers round the EMITTED rank (6 decimals) — intermediate ulps
  * are ~1e-15 relative, far below the rounding granularity.
  */
object PageRank {

  /** Ranks after `iters` rounds from a uniform start. `nodes` must
    * have one `id` column; `edges` (src, dst) are directed — pass both
    * directions for an undirected graph. Returns (id, rank).
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int,
          damping: Double = 0.85,
          checkpoint: graft.operators.CheckpointMode =
            graft.operators.CheckpointMode.Local): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    // `checkpoint` dials per-iteration durability (operators.
    // Checkpointer): Reliable/Path make a deep cluster run survive
    // executor loss after lineage truncation.
    val cp = new graft.operators.Checkpointer(checkpoint, "pagerank")
    val ids = cp.materialize(nodes.select(col(nodes.columns.head).as("id")))
    val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("n")))
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) materialized once — every iteration joins it
    val adj = cp.materialize(edges.select(col("src"), col("dst"))
      .join(deg, col("src") === col("id")).drop("id"))
    var rank = cp.materialize(ids.crossJoin(nRow)
      .select(col("id"), (lit(1.0) / col("n")).as("rank")))
    var prev: Option[DataFrame] = Some(rank)
    for (_ <- 1 to iters) {
      val contrib = adj.join(rank, adj("src") === rank("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      rank = cp.materialize(ids.join(contrib, Seq("id"), "left").crossJoin(nRow)
        .select(col("id"),
          ((lit(1.0) - damping) / col("n")
            + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
      prev.foreach(cp.release)
      prev = Some(rank)
    }
    rank
  }
}
