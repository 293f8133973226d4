package graft

import graft.graph.LinkPredict
import org.apache.spark.sql.functions._

class LinkPredictSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("a", "b")

  test("hash split is deterministic, disjoint, and complete") {
    val e = edges((1L to 40L).map(i => (i, i + 100)): _*)
    val (tr1, te1) = LinkPredict.split(e, "a", "b")
    val (tr2, te2) = LinkPredict.split(e, "a", "b")
    assert(tr1.collect().toSet === tr2.collect().toSet)
    assert(te1.collect().toSet === te2.collect().toSet)
    val (trS, teS) = (tr1.collect().toSet, te1.collect().toSet)
    assert(trS.intersect(teS).isEmpty)
    assert(trS.size + teS.size === 40)
    assert(teS.nonEmpty && trS.nonEmpty) // 25% draw over 40 edges
  }

  test("common neighbors: only non-train pairs with a shared neighbor, exact counts") {
    // 1-2, 1-3, 2-3, 2-4, 3-4: the one scorable non-edge is (1,4) via {2,3}
    val tr = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = LinkPredict.commonNeighbors(tr, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 4L, 2L)))
  }

  test("degree cap bounds the hub: star center keeps its lowest-id neighbors only") {
    val star = edges((1L to 5L).map(l => (0L, l)): _*)
    val capped = LinkPredict.commonNeighbors(star, "a", "b", maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // center capped to neighbors {1,2} -> only that leaf pair is scorable
    assert(capped.toSeq === Seq((1L, 2L, 1L)))
    val uncapped = LinkPredict.commonNeighbors(star, "a", "b", maxDegree = 64)
    assert(uncapped.count() === 10L) // all C(5,2) leaf pairs via the hub
  }

  test("evalReport emits one consistent row: recall = scored positives / test edges") {
    val e = edges((for (i <- 1L to 12L; j <- i + 1 to 12L) yield (i, j)): _*)
    val r = LinkPredict.evalReport(e, "a", "b").collect()
    assert(r.length === 1)
    val row = r.head
    val (nTest, nPos) = (row.getLong(0), row.getLong(1))
    assert(nPos <= nTest)
    assert(row.getDouble(5) === nPos.toDouble / nTest)
  }
}
