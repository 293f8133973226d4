package graft

import graft.ann.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  test("subvectors slice in order and cover the vector") {
    val df = Seq((1L, Seq(1f, 2f, 3f, 4f))).toDF("vid", "vec")
    val got = Pq.subvectors(df, "vid", "vec", m = 2)
      .orderBy("sub").collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).toSeq))
    assert(got.toSeq === Seq((0, Seq(1f, 2f)), (1, Seq(3f, 4f))))
  }

  test("sqdist is the exact squared L2 distance") {
    val df = Seq((Seq(1f, 2f), Seq(4f, 6f))).toDF("a", "b")
    val got = df.select(Pq.sqdist(col("a"), col("b"))).head.getDouble(0)
    assert(got === 25.0) // 9 + 16
  }

  test("one Lloyd iteration recovers hand-computed subspace means") {
    // m=1: plain k-means. seeds = ids 0,1; clusters {0,2} and {1,3}
    val df = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)),
      (2L, Seq(1f, 1f)), (3L, Seq(9f, 9f))).toDF("vid", "vec")
    val cb = Pq.trainCodebooks(df, "vid", "vec", m = 1,
        seedPred = col("vid") < 2, iters = 1)
      .orderBy("code").collect()
      .map(r => (r.getLong(1), r.getSeq[Float](2).toSeq))
    assert(cb.toSeq === Seq(
      (0L, Seq(0.5f, 0.5f)), (1L, Seq(9.5f, 9.5f))))
  }

  test("subspaces cluster independently") {
    // 4-dim, m=2: first half separates ids {0,2}|{1,3}; second half
    // separates {0,3}|{1,2} — codes must disagree across subspaces
    val df = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(10f, 10f, 10f, 10f)),
      (2L, Seq(1f, 1f, 9f, 9f)),
      (3L, Seq(9f, 9f, 1f, 1f))).toDF("vid", "vec")
    val cb = Pq.trainCodebooks(df, "vid", "vec", m = 2,
      seedPred = col("vid") < 2, iters = 2)
    val codes = Pq.assign(Pq.subvectors(df, "vid", "vec", 2), cb)
      .orderBy("id", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(codes.filter(_._1 == 2L).map(_._3).toSeq === Seq(0L, 1L))
    assert(codes.filter(_._1 == 3L).map(_._3).toSeq === Seq(1L, 0L))
  }

  test("assignment ties break toward the smaller code") {
    val df = Seq((7L, Seq(5f))).toDF("vid", "vec")
    val cb = Seq((0, 0L, Seq(4f)), (0, 1L, Seq(6f))).toDF("sub", "code", "cvec")
    val got = Pq.assign(Pq.subvectors(df, "vid", "vec", 1), cb).head
    assert(got.getLong(2) === 0L && got.getDouble(3) === 1.0)
  }

  test("ADC distance is the fixed-order sum of subspace table lookups") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(10f, 10f, 10f, 10f)),
      (2L, Seq(1f, 1f, 9f, 9f)),
      (3L, Seq(9f, 9f, 1f, 1f))).toDF("vid", "vec")
    val cb = Pq.trainCodebooks(vecs, "vid", "vec", m = 2,
      seedPred = col("vid") < 2, iters = 2)
    val codes = Pq.assign(Pq.subvectors(vecs, "vid", "vec", 2), cb)
    val got = Pq.adcTopK(vecs.where($"vid" === 0L), "vid", "vec",
        codes, cb, m = 2, k = 3)
      .orderBy("rk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 3)
    assert(!got.map(_._2).contains(0L), "a query never ranks itself")
    // centroids after convergence: sub0 {0:(0.5,0.5), 1:(9.5,9.5)},
    // sub1 {0:(0.5,0.5)... recompute: sub1 clusters {0,3}→(0.5,0.5)? no:
    // sub1 of id0=(0,0),id3=(1,1) → mean (0.5,0.5); codes of id2: sub0=0,sub1=1
    // ADC(q=0 → cand 2) = d(q.sub0, c0_0) + d(q.sub1, c1_1)
    val r1 = got.head
    assert(r1._1 === 1)
    // nearest by ADC must be id 2 or 3 (both share one near subspace
    // with the all-zero query), never the far id 1
    assert(r1._2 !== 1L)
    // and the ranking is by ascending reconstructed distance
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
  }

  test("ADC is bit-reproducible across runs") {
    val vecs = (0L until 20L).map(i =>
      (i, Seq.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))).toDF("vid", "vec")
    def run() = Pq.trainCodebooks(vecs, "vid", "vec", m = 4,
      seedPred = col("vid") < 4, iters = 2)
    val cb1 = run(); val cb2 = run()
    val c1 = Pq.assign(Pq.subvectors(vecs, "vid", "vec", 4), cb1)
      .orderBy("id", "sub").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val c2 = Pq.assign(Pq.subvectors(vecs, "vid", "vec", 4), cb2)
      .orderBy("id", "sub").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(c1.toSeq === c2.toSeq)
  }
}
