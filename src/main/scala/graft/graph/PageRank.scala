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
  * iteration's rank table is materialized (`localCheckpoint`) so a
  * deep run re-reads |V| rows instead of re-deriving the whole lineage
  * (the kmeans-iteration lesson).
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
          damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val ids = nodes.select(col(nodes.columns.head).as("id")).localCheckpoint()
    val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("n")))
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) materialized once — every iteration joins it
    val adj = edges.select(col("src"), col("dst"))
      .join(deg, col("src") === col("id")).drop("id")
      .localCheckpoint()
    var rank = ids.crossJoin(nRow)
      .select(col("id"), (lit(1.0) / col("n")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = adj.join(rank, adj("src") === rank("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      rank = ids.join(contrib, Seq("id"), "left").crossJoin(nRow)
        .select(col("id"),
          ((lit(1.0) - damping) / col("n")
            + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
