package graft

import graft.graph.PageRank
import org.apache.spark.sql.functions._

/** Pins PageRank semantics: teleport term, contribution split by
  * out-degree, dangling simplification, and conservation on graphs
  * without dangling mass.
  */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int) =
    PageRank.run(nodes.toDF("id"), edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("mutual pair + isolated node: closed-form fixpoint from iteration 1") {
    // A↔B, C isolated, N=3, d=0.85: pr(A)=pr(B)=0.05+0.85·pr(other)
    // is already at its 1/3 fixpoint from the uniform start; C keeps
    // only the teleport term 0.15/3 = 0.05
    val got = ranks(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L)), iters = 3)
    assert(math.abs(got(1L) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(2L) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(3L) - 0.05) < 1e-12)
  }

  test("cycle without dangling nodes conserves total mass = 1") {
    val n = 6L
    val cycle = (0L until n).map(i => (i, (i + 1) % n))
    val got = ranks(0L until n, cycle, iters = 4)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // symmetric cycle → uniform ranks
    got.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12))
  }

  test("out-degree splits contribution: a hub donates rank/outdeg to each target") {
    // hub 0 → {1, 2}; 1 → 0; 2 → 0. After one iteration:
    // pr1(1) = pr1(2) = 0.15/3 + 0.85·(1/3)/2
    val got = ranks(Seq(0L, 1L, 2L), Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)), 1)
    val want = 0.15 / 3 + 0.85 * (1.0 / 3) / 2
    assert(math.abs(got(1L) - want) < 1e-12)
    assert(math.abs(got(2L) - want) < 1e-12)
    assert(math.abs(got(0L) - (0.15 / 3 + 0.85 * 2 * (1.0 / 3))) < 1e-12)
  }

  private def pprRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                       seeds: Seq[Long], iters: Int) =
    PageRank.runPersonalized(nodes.toDF("id"), edges.toDF("src", "dst"),
        seeds.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("personalized: closed-form walk on a mutual pair, single seed") {
    // a↔b, seed {a}: r0 = (1, 0);
    // r1(a) = 0.15·1 + 0.85·r0(b) = 0.15, r1(b) = 0.85·r0(a) = 0.85;
    // r2(a) = 0.15 + 0.85·0.85 = 0.8725, r2(b) = 0.85·0.15 = 0.1275
    val r2 = pprRanks(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), Seq(1L), iters = 2)
    assert(math.abs(r2(1L) - 0.8725) < 1e-12)
    assert(math.abs(r2(2L) - 0.1275) < 1e-12)
  }

  test("personalized: restart mass stays in the seeds' component — strangers get exactly 0") {
    // two disjoint pairs; seeding the first leaves the second at 0.0
    // (not a small teleport floor — PPR has NO uniform teleport)
    val got = pprRanks(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)), Seq(1L), iters = 3)
    assert(got(3L) === 0.0 && got(4L) === 0.0,
      "unreachable nodes must hold zero rank under a seeded restart")
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      "dangling-free graph conserves the unit restart mass")
  }

  test("personalized: multi-seed restart splits mass over the seed set") {
    // seeds {1, 3} on two disjoint pairs: each component runs the
    // single-seed walk at half mass
    val both = pprRanks(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)), Seq(1L, 3L), iters = 2)
    assert(math.abs(both(1L) - 0.8725 / 2) < 1e-12)
    assert(math.abs(both(4L) - 0.1275 / 2) < 1e-12)
  }

  private def wRanks(nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
                     iters: Int) =
    PageRank.runWeighted(nodes.toDF("id"), edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("weighted with uniform weights ≡ unweighted run") {
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L), (1L, 2L))
    val plain = ranks(nodes, edges, iters = 3)
    val weighted = wRanks(nodes, edges.map { case (a, b) => (a, b, 7L) }, 3)
    nodes.foreach(n => assert(math.abs(plain(n) - weighted(n)) < 1e-12,
      s"uniform-weight divergence at node $n"))
  }

  test("weighted: contribution splits by w/W(u), closed form after one round") {
    // 0 →(w=3) 1, 0 →(w=1) 2, 1 → 0, 2 → 0: node 1 draws 3/4 of 0's mass
    val got = wRanks(Seq(0L, 1L, 2L),
      Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L)), iters = 1)
    assert(math.abs(got(1L) - (0.15 / 3 + 0.85 * (1.0 / 3) * 3 / 4)) < 1e-12)
    assert(math.abs(got(2L) - (0.15 / 3 + 0.85 * (1.0 / 3) * 1 / 4)) < 1e-12)
  }

  test("weighted cycle without dangling nodes conserves total mass = 1") {
    val n = 5L
    val edges = (0L until n).map(i => (i, (i + 1) % n, i + 1)) // skewed weights
    val got = wRanks(0L until n, edges, iters = 4)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("weighted: non-positive weights are filtered, never a null/negative rank") {
    // node 0's only edges carry w ≤ 0 → all dropped → 0 becomes an
    // ordinary dangling node. Before the filter, 0's zero ΣW divided
    // its mass by zero: node 1's rank went NULL (mass silently
    // vanished, a third behavior distinct from dangling) and negative
    // weights could push ranks unbounded.
    val got = wRanks(Seq(0L, 1L, 2L),
      Seq((0L, 1L, 0L), (0L, 1L, -3L), (1L, 2L, 2L), (2L, 1L, 5L)), iters = 3)
    assert(got.values.forall(r => r >= 0.0 && !r.isNaN),
      s"ranks must stay finite and non-negative: $got")
    // 0 receives only teleport mass; its zero-weight edge must not count
    assert(math.abs(got(0L) - 0.15 / 3) < 1e-12,
      "a node with only non-positive out-edges is dangling, not a source")
  }
}
