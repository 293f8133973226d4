package graft

import graft.graph.Triangles

/** Closed-form fixtures for exact triangle counting (q140's kernel):
  * graphs small enough to count by hand, chosen to pin each term of the
  * summary row and the degree-orientation bookkeeping.
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.triangleStats(edges.toDF("id_a", "id_b")).collect()(0)

  test("K4: every vertex triple closes — 4 triangles, clustering 1.0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = stats(k4)
    assert(r.getAs[Long]("n_nodes") === 4)
    assert(r.getAs[Long]("n_edges") === 6)
    assert(r.getAs[Long]("n_triangles") === 4)
    assert(r.getAs[Long]("n_wedges") === 12)   // 4 vertices × C(3,2)
    assert(r.getAs[Double]("clustering") === 1.0)
  }

  test("path graph: wedges but no closures — 0 triangles, clustering 0") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") === 0)
    assert(r.getAs[Long]("n_wedges") === 2)
    assert(r.getAs[Double]("clustering") === 0.0)
  }

  test("two triangles sharing an edge: counted once each, clustering 6/8") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") === 2)
    assert(r.getAs[Long]("n_wedges") === 8)    // degs 2,3,3,2 → 1+3+3+1
    assert(r.getAs[Double]("clustering") === 6.0 / 8)
  }

  test("star graph: the hub's wedges never close") {
    val r = stats(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L)))
    assert(r.getAs[Long]("n_triangles") === 0)
    assert(r.getAs[Long]("n_wedges") === 10)   // C(5,2) at the hub
    assert(r.getAs[Double]("clustering") === 0.0)
  }

  test("empty edge list: zero row, NULL clustering — never an ANSI 0/0") {
    val r = stats(Seq.empty[(Long, Long)])
    assert(r.getAs[Long]("n_nodes") === 0)
    assert(r.getAs[Long]("n_edges") === 0)
    assert(r.getAs[Long]("n_triangles") === 0)
    assert(r.getAs[Long]("n_wedges") === 0)
    assert(r.isNullAt(r.fieldIndex("clustering")))
  }

  test("triangle count matches brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L if rnd.nextDouble() < 0.25
    } yield (a, b)).toSeq
    val adj = edges.toSet
    def has(x: Long, y: Long) = adj.contains((x min y, x max y))
    val expected = (for {
      x <- 1L to 20L; y <- (x + 1) to 20L; z <- (y + 1) to 20L
      if has(x, y) && has(x, z) && has(y, z)
    } yield 1).size
    assert(stats(edges).getAs[Long]("n_triangles") === expected.toLong)
  }
}
