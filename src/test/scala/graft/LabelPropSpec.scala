package graft

import graft.dedup.Dedup
import graft.graph.{KCore, LabelProp}

/** Label propagation is the COMMUNITY view of dup evidence: the
  * two-bridged-cliques fixture is exactly the structure min-id
  * components over-merge (one bridge edge collapses both cliques into
  * one cluster) and k-core cannot partition (all 8 nodes survive a
  * 3-core). Plurality voting separates them — and the surviving label
  * of the high-id clique (11, not the global min 1) is the proof the
  * rule is plurality, not min: bridge node 11 sees {11 x3, 1 x1} every
  * round and outvotes the bridge.
  */
class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  private val clique = (base: Long) =>
    for (a <- base to (base + 3); b <- (a + 1) to (base + 3)) yield (a, b)
  private def pairs = (clique(1L) ++ clique(11L) :+ ((4L, 11L))).toDF("id_a", "id_b")
  private def nodes = ((1L to 4L) ++ (11L to 14L)).toDF("doc_id")

  test("two bridged cliques → two communities; components and k-core cannot separate them") {
    val labels = LabelProp.run(nodes, "doc_id", pairs, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.filter(_._1 <= 4).values.toSet === Set(1L),
      "low clique must converge to its min id")
    assert(labels.filter(_._1 >= 11).values.toSet === Set(11L),
      "high clique must KEEP label 11 — a min rule would leak 1 across the bridge")
    // contrast 1: connected components merge everything through the bridge
    val (cc, _) = Dedup.nearDupClustersConverged(nodes, "doc_id", pairs)
    assert(cc.collect().map(_.getLong(1)).toSet === Set(1L),
      "components collapse the fixture into one cluster")
    // contrast 2: the 3-core keeps all 8 nodes — it filters, not partitions
    assert(KCore.kCore(pairs, k = 3, rounds = 4).count() === 8)
  }

  test("converged twin: stability probe stops and matches the pinned-round run") {
    val (lab, rounds, converged) = LabelProp.runConverged(nodes, "doc_id", pairs)
    assert(rounds >= 2 && rounds <= 6, s"fixture should settle fast, took $rounds")
    assert(converged, "two-clique fixture must report a genuine fixpoint")
    val conv = lab.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val pinned = LabelProp.run(nodes, "doc_id", pairs, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(conv === pinned)
  }

  test("terminal-state telemetry: an oscillating fixture reports converged = false") {
    // synchronous LPA can 2-cycle even with the self ballot and the
    // min tie-break — the smallest such graph (exhaustive search over
    // n ≤ 6): hubs 2 and 3 share fan {4,5,6} while only 2 holds leaf
    // 1. From id seeds the fan adopts 2, the hubs adopt the fan's
    // label, and from round 2 the states alternate forever — hubs and
    // fan keep swapping plurality winners. runConverged's flag is the
    // ONLY way a caller can tell this maxRounds cutoff from genuine
    // convergence on the final allowed round.
    val n = (1L to 6L).toDF("doc_id")
    val osc = Seq((1L, 2L), (2L, 4L), (2L, 5L), (2L, 6L),
      (3L, 4L), (3L, 5L), (3L, 6L)).toDF("id_a", "id_b")
    val (_, rounds, converged) = LabelProp.runConverged(n, "doc_id", osc,
      maxRounds = 6)
    assert(!converged, "the hub/fan oscillator must be reported as NOT converged")
    assert(rounds === 6, "an oscillating run must burn its full budget")
    // sanity contrast: the two-clique fixture reports a genuine fixpoint
    val (_, _, ok) = LabelProp.runConverged(nodes, "doc_id", pairs, maxRounds = 6)
    assert(ok)
  }

  test("isolated nodes keep their own label through every round") {
    val n = Seq(1L, 2L, 99L).toDF("doc_id")
    val p = Seq((1L, 2L)).toDF("id_a", "id_b")
    val labels = LabelProp.run(n, "doc_id", p, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels(99L) === 99L, "no neighbors → label never changes")
    assert(labels(1L) === 1L && labels(2L) === 1L)
  }
}
