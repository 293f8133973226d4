package graft

import graft.graph.KCore
import org.apache.spark.sql.functions._

/** Closed-form fixtures for k-core peeling (q143's kernel): cascade
  * semantics (simultaneous per-round removal), fixpoint idempotence,
  * and convergence-probe equality with the pinned-round form.
  */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.kCore(edges.toDF("id_a", "id_b"), k, rounds)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("a clique is its own k-core at k = n-1") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(core(k5.toSeq, 4, 3) === (1L to 5L).map(_ -> 4L))
  }

  test("a path peels from the ends inward, one layer per round") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // round 1 removes only the current fringe (1 and 5) — NOT the
    // whole cascade: 2-core after one round still holds the middle
    assert(core(path, 2, 1) === Seq(2L -> 1L, 3L -> 2L, 4L -> 1L))
    // the cascade completes by round 3: nothing has 2 neighbors left
    assert(core(path, 2, 3) === Seq.empty)
  }

  test("peeling a fixpoint is a no-op: extra rounds change nothing") {
    val tri2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(core(tri2, 2, 1) === core(tri2, 2, 6))
    assert(core(tri2, 2, 1) ===
      Seq(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 2L), "both triangles survive at k=2")
  }

  test("converged form equals the pinned form and matches a brute-force peel") {
    val rnd = new scala.util.Random(13)
    val edges = (for {
      a <- 1L to 25L; b <- (a + 1) to 25L if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    // brute-force: peel simultaneously until stable
    var adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var nodes = adj.keySet
    var changed = true
    while (changed) {
      val keep = nodes.filter(n => (adj(n) & nodes).size >= 3)
      changed = keep != nodes
      nodes = keep
    }
    val expected = nodes.toSeq.sorted.map(n => n -> (adj(n) & nodes).size.toLong)
    val pinned = core(edges, 3, 30)
    val converged = KCore.kCoreConverged(edges.toDF("id_a", "id_b"), 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(pinned === expected)
    assert(converged === expected)
  }
}
