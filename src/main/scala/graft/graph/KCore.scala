package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the fourth graph
  * primitive (components, PageRank, triangles): repeatedly delete every
  * node with fewer than k surviving neighbors until none is left. The
  * k-core is the standard community-pruning step over a near-dup
  * graph: LSH noise edges form low-degree fringes that peel away, while
  * genuine dup families (near-cliques, every member tied to most
  * others) survive intact — a structural filter no single-pair
  * threshold can express.
  *
  * Each round is one endpoint hash-count + two semi-joins (keep edges
  * whose BOTH endpoints still qualify); all deletions of a round happen
  * simultaneously, so a cascade (removing a fringe node drops its
  * neighbor below k) takes one extra round, not one round per node.
  * Every round's edge set is materialized through the shared
  * checkpoint dial ([[graft.operators.Checkpointer]]) with superseded
  * rounds released — the connected-components durability story.
  *
  * [[kCore]] runs a PINNED number of rounds (idempotent once converged
  * — peeling a fixpoint changes nothing), which is what the SQL oracle
  * unrolls (q143, the q124-PageRank pattern); [[kCoreConverged]] adds
  * the cached convergence probe (stop when the edge count is stable)
  * for open-ended runs.
  */
object KCore {

  /** Peel `rounds` times. `pairs` are undirected deduplicated edges
    * (id_a, id_b); returns (id, core_deg) — survivors with their degree
    * inside the surviving subgraph.
    *
    * `resume = true` (Path mode only) re-enters a previous run's
    * checkpoint dir after a driver loss: step 1 = the initial edge
    * table, step 1+i = edges after peel round i. Peeling is a pure
    * function of the surviving edge set alone (no prefix table
    * needed), so the restart picks up at the highest COMMITTED edge
    * step and peels only the remaining rounds — bit-identical to the
    * uninterrupted run (ResumeSpec). Falls back to a fresh run when
    * the dir has no usable frontier.
    */
  def kCore(pairs: DataFrame, k: Int, rounds: Int,
            checkpoint: graft.operators.CheckpointMode =
              graft.operators.CheckpointMode.Local,
            resume: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val cp = new graft.operators.Checkpointer(checkpoint, "kcore")
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        graft.operators.Checkpointer
          .lastCompleteStep(pairs.sparkSession, dir, "kcore")
          .filter { case (s, _) => s >= 1 && s <= 1 + rounds }
      case _ => None
    }
    resumed match {
      case Some((s, frontier)) if s == 1 + rounds => degrees(frontier)
      case Some((s, frontier)) =>
        peel(cp, k, cp.resumeAt(s, frontier), rounds - (s - 1))
      case None =>
        peel(cp, k,
          cp.materialize(pairs.select(col("id_a").as("u"), col("id_b").as("v"))),
          rounds)
    }
  }

  /** The peel loop proper, from an arbitrary surviving edge set —
    * shared by fresh and resumed runs.
    */
  private def peel(cp: graft.operators.Checkpointer, k: Int,
                   e0: DataFrame, rounds: Int): DataFrame = {
    var e = e0
    var prev: Option[DataFrame] = Some(e)
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("core_deg") >= k).select("id")
      e = cp.materialize(e
        .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
        .select("u", "v"))
      prev.foreach(cp.release)
      prev = Some(e)
    }
    degrees(e)
  }

  /** Peel until the edge count is stable (one cached count probe per
    * round — the nearDupClustersConverged pattern), bounded by
    * `maxRounds`. Same answer as [[kCore]] with enough rounds.
    */
  def kCoreConverged(pairs: DataFrame, k: Int, maxRounds: Int = 64,
                     checkpoint: graft.operators.CheckpointMode =
                       graft.operators.CheckpointMode.Local): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val cp = new graft.operators.Checkpointer(checkpoint, "kcore")
    var e = cp.materialize(pairs.select(col("id_a").as("u"), col("id_b").as("v")))
    var prev: Option[DataFrame] = Some(e)
    var n = e.count()
    var stable = false
    var round = 0
    while (!stable && round < maxRounds) {
      round += 1
      val keep = degrees(e).where(col("core_deg") >= k).select("id")
      e = cp.materialize(e
        .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
        .select("u", "v"))
      val m = e.count()
      stable = m == n
      n = m
      prev.foreach(cp.release)
      prev = Some(e)
    }
    degrees(e)
  }

  /** Node degrees of an undirected edge list: (id, core_deg). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_deg"))
}
