package graft

import org.apache.spark.sql.functions._

import graft.functions.HyperLogLog
import graft.graph.HyperBall

/** HyperBall's register algebra is EXACT set algebra — the sketch of
  * B(v, r) must equal the sketch one would build directly from the
  * true BFS ball — so the spec checks registers against brute-force
  * balls member by member, not just estimates against tolerances. The
  * path-plus-isolate fixture covers growth (balls widen by one hop per
  * round), saturation (the path's balls stop growing at its
  * eccentricity), and the no-edge case (an isolated vertex's ball is
  * forever itself).
  */
class HyperBallSpec extends SparkTestBase {
  import spark.implicits._

  // path 1-2-3-4-5 plus isolated 6
  private val pathEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
  private def edges = (pathEdges ++ pathEdges.map(_.swap)).toDF("src", "dst")
  private def nodes = (1L to 6L).toDF("id")

  private def ball(v: Long, r: Int): Set[Long] = {
    val adj = (pathEdges ++ pathEdges.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var b = Set(v)
    for (_ <- 1 to r) b = b ++ b.flatMap(u => adj.getOrElse(u, Nil))
    b
  }

  test("registers per round equal the sketch of the brute-force BFS ball") {
    val m = 64
    val regs = HyperBall.registers(nodes, "id", edges, rounds = 3, m = m)
    for (r <- 0 to 3) {
      val members = (1L to 6L).flatMap(v => ball(v, r).map(u => (v, u)))
        .toDF("id", "member")
      val expected = members
        .select(col("id"),
          HyperLogLog.register(col("member").cast("string"), m).as("j"),
          HyperLogLog.rank(col("member").cast("string")).as("rho"))
        .groupBy("id", "j").agg(max("rho").as("mreg"))
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2))).toSet
      val got = regs(r)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2))).toSet
      assert(got === expected, s"round $r registers diverge from the true ball")
    }
  }

  test("estimate series: isolated vertex stays ~1; n_present never shrinks") {
    val balls = HyperBall.run(nodes, "id", edges, rounds = 3, m = 64)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(3), x.getDouble(6)))
    val isolated = balls.filter(_._1 == 6L)
    assert(isolated.length === 4)
    assert(isolated.forall(_._3 == 1), "isolated ball has ONE occupied register")
    assert(isolated.forall(b => b._4 > 0.9 && b._4 < 1.1),
      "linear counting of a 1-element set is ~1")
    for (v <- 1L to 6L) {
      val series = balls.filter(_._1 == v).sortBy(_._2).map(_._3)
      assert(series.zip(series.tail).forall { case (a, b) => a <= b },
        s"vertex $v occupied-register count must be monotone, got ${series.toSeq}")
    }
  }

  test("harmonic centrality at a high dial lands on the true truncated HC") {
    // true HC(3) on the path, r <= 3: shell 1 = {2,4} -> 2/1,
    // shell 2 = {1,5} -> 2/2, shell 3 empty => 3.0; HC(6) = 0
    val m = 1024
    val hc = HyperBall.harmonicCentrality(
        HyperBall.run(nodes, "id", edges, rounds = 3, m = m), rounds = 3)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(math.abs(hc(3L) - 3.0) < 0.15, s"HC(center) ~ 3, got ${hc(3L)}")
    assert(math.abs(hc(6L)) < 1e-9, "an isolated vertex has zero centrality")
    // the center out-scores the path ends (2/1 + 1/2 + 1/3 ~ 2.83 for
    // a neighbor of an end; 1/1 + 1/2 + 1/3 ~ 1.83 for an end)
    assert(hc(3L) > hc(1L) && hc(3L) > hc(5L))
  }
}
