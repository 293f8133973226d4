package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) over an
  * undirected pair list — the community complement to the other graph
  * primitives: min-id connected components OVER-merge through a single
  * bridge edge, and k-core filters fringes but does not partition what
  * survives; plurality label propagation finds the dense communities
  * on either side of a bridge (LabelPropSpec pins a two-clique fixture
  * that components collapse into one cluster and a k-core keeps whole).
  *
  * Determinism: every node starts labeled with its own id; each round,
  * every node SIMULTANEOUSLY adopts the plurality label among its
  * neighbors' current labels AND its own (the self-inclusive LPA
  * variant: without the self ballot, synchronous updates 2-cycle on a
  * plain edge — each endpoint adopts the other's label forever), ties
  * broken by smallest label. The winner per node is
  * `min(struct(-count, label))` — a mergeable hash aggregation, never
  * a per-node window. Isolated nodes keep their label (their only
  * ballot is their own). Labels must be (castable to) longs — the
  * dup-graph id type.
  *
  * Per round: one equi-join against the label table + two hash aggs +
  * one left join back, with the round's table materialized through the
  * shared checkpoint dial ([[graft.operators.Checkpointer]]) and
  * superseded rounds released — the iterative-family durability story.
  * [[run]] executes a PINNED round count (what the q147 oracle unrolls
  * — the q124/q143 pattern); [[runConverged]] adds the cached
  * stability probe, bounded by `maxRounds` because synchronous LPA can
  * 2-cycle on bipartite structures.
  */
object LabelProp {

  /** `rounds` synchronous label updates. `pairs` are undirected
    * deduplicated edges (id_a, id_b); `nodes` must contain every node
    * (isolated ones included). Returns (id, label).
    */
  def run(nodes: DataFrame, idCol: String, pairs: DataFrame, rounds: Int,
          checkpoint: graft.operators.CheckpointMode =
            graft.operators.CheckpointMode.Local): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val cp = new graft.operators.Checkpointer(checkpoint, "lpa")
    val edges = cp.materialize(symmetrized(pairs))
    var lab = cp.materialize(nodes.select(col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("label")))
    var prev: Option[DataFrame] = Some(lab)
    for (_ <- 1 to rounds) {
      lab = cp.materialize(step(edges, lab))
      prev.foreach(cp.release)
      prev = Some(lab)
    }
    lab
  }

  /** Propagate until no label changes (one cached count probe per
    * round), bounded by `maxRounds`. Returns (labels, rounds run) —
    * same answer as [[run]] with enough rounds when the propagation
    * converges at all.
    */
  def runConverged(nodes: DataFrame, idCol: String, pairs: DataFrame,
                   maxRounds: Int = 32,
                   checkpoint: graft.operators.CheckpointMode =
                     graft.operators.CheckpointMode.Local): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be positive, got $maxRounds")
    val cp = new graft.operators.Checkpointer(checkpoint, "lpa")
    val edges = cp.materialize(symmetrized(pairs))
    var lab = cp.materialize(nodes.select(col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("label")))
    var prev: Option[DataFrame] = Some(lab)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      round += 1
      val next = cp.materialize(step(edges, lab))
      stable = next.join(lab.select(col("id"), col("label").as("old")), "id")
        .where(col("label") =!= col("old")).isEmpty
      prev.foreach(cp.release)
      prev = Some(next)
      lab = next
    }
    (lab, round)
  }

  /** One synchronous update: plurality over each node's neighbor
    * labels plus its own self ballot, tie → smallest label. Every node
    * casts the self ballot, so the winner table covers all nodes — no
    * join back needed.
    */
  private def step(edges: DataFrame, lab: DataFrame): DataFrame = {
    val ballots = edges.join(lab.select(col("id").as("v"), col("label")), "v")
      .select(col("u"), col("label"))
      .union(lab.select(col("id").as("u"), col("label")))
    ballots.groupBy("u", "label").agg(count(lit(1)).as("n"))
      .groupBy("u")
      .agg(min(struct((-col("n")).as("nn"), col("label").as("l"))).as("w"))
      .select(col("u").as("id"), col("w.l").as("label"))
  }

  /** Both directions of the undirected pair list. */
  private def symmetrized(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
}
