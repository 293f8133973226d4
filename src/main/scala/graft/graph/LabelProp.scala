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
    *
    * `resume = true` (Path mode only) re-enters a previous run's
    * checkpoint dir after a driver loss: step 1 = symmetrized edges
    * (never released), step 2 = seed labels, step 2+i = labels after
    * round i. The restart picks up at the highest COMMITTED label step
    * (an uncommitted in-flight step is ignored and overwritten) and
    * runs only the remaining rounds — bit-identical to the
    * uninterrupted run, since each round is a pure function of the
    * previous label table (ResumeSpec proves it). Falls back to a
    * fresh run when the dir has no usable frontier.
    */
  def run(nodes: DataFrame, idCol: String, pairs: DataFrame, rounds: Int,
          checkpoint: graft.operators.CheckpointMode =
            graft.operators.CheckpointMode.Local,
          resume: Boolean = false): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val cp = new graft.operators.Checkpointer(checkpoint, "lpa")
    val spark = nodes.sparkSession
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        for {
          (s, frontier) <- graft.operators.Checkpointer
            .lastCompleteStep(spark, dir, "lpa")
          if s >= 2 && s <= 2 + rounds
          edgesF <- graft.operators.Checkpointer.completeStep(spark, dir, "lpa", 1)
        } yield (s, frontier, edgesF)
      case _ => None
    }
    resumed match {
      case Some((s, frontier, _)) if s == 2 + rounds =>
        frontier // previous run already finished all requested rounds
      case Some((s, frontier, edgesF)) =>
        iterate(cp, edgesF, cp.resumeAt(s, frontier), rounds - (s - 2))
      case None =>
        val edges = cp.materialize(symmetrized(pairs))
        val lab0 = cp.materialize(nodes.select(col(idCol).cast("long").as("id"),
          col(idCol).cast("long").as("label")))
        iterate(cp, edges, lab0, rounds)
    }
  }

  /** The synchronous-update loop proper, from an arbitrary starting
    * label table — shared by fresh runs (self labels) and resumed runs
    * (the recovered frontier).
    */
  private def iterate(cp: graft.operators.Checkpointer, edges: DataFrame,
                      lab0: DataFrame, rounds: Int): DataFrame = {
    var lab = lab0
    var prev: Option[DataFrame] = Some(lab)
    for (_ <- 1 to rounds) {
      lab = cp.materialize(step(edges, lab))
      prev.foreach(cp.release)
      prev = Some(lab)
    }
    lab
  }

  /** Propagate until no label changes (one cached count probe per
    * round), bounded by `maxRounds`. Returns (labels, rounds run,
    * converged) — same answer as [[run]] with enough rounds when the
    * propagation converges at all. The third element is the terminal
    * state, and it matters: synchronous LPA provably 2-cycles on
    * bipartite structures (LabelPropSpec pins a 4-cycle that flips
    * forever), so `rounds == maxRounds` alone cannot distinguish "just
    * converged on the last allowed round" from "cut off mid-
    * oscillation" — a pipeline must not treat an oscillation snapshot
    * as a community assignment.
    */
  def runConverged(nodes: DataFrame, idCol: String, pairs: DataFrame,
                   maxRounds: Int = 32,
                   checkpoint: graft.operators.CheckpointMode =
                     graft.operators.CheckpointMode.Local): (DataFrame, Int, Boolean) = {
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
    (lab, round, stable)
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
