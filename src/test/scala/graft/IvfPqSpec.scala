package graft

import graft.ann.{IvfPq, Pq}
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private val cents = Seq(
    (100L, Seq(0f, 0f)), (200L, Seq(10f, 10f))).toDF("bid", "bvec")

  test("residuals route to the nearest bucket and subtract its centroid") {
    val emb = Seq((1L, Seq(1f, 2f)), (2L, Seq(9f, 8f))).toDF("vid", "vec")
    val got = IvfPq.residuals(emb, "vid", "vec", cents)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toSeq))
    assert(got.toSeq === Seq(
      (1L, 100L, Seq(1.0, 2.0)),
      (2L, 200L, Seq(-1.0, -2.0))))
  }

  test("probe list holds the nprobe nearest buckets, each with its own residual") {
    val q = Seq((7L, Seq(4f, 4f))).toDF("vid", "vec")
    val got = IvfPq.probeResiduals(q, "vid", "vec", cents, nprobe = 2)
      .orderBy("bid").collect()
      .map(r => (r.getLong(1), r.getSeq[Double](2).toSeq))
    assert(got.toSeq === Seq(
      (100L, Seq(4.0, 4.0)),
      (200L, Seq(-6.0, -6.0))))
  }

  test("search only reaches candidates in probed buckets") {
    // 4-dim so m=2 slices cleanly; two far-apart buckets
    val c4 = Seq((100L, Seq(0f, 0f, 0f, 0f)), (200L, Seq(50f, 50f, 50f, 50f)))
      .toDF("bid", "bvec")
    val emb = (0L until 12L).map { i =>
      val base = if (i % 2 == 0) 0f else 50f
      (i, Seq(base + i, base, base + 1, base)) // i stays well under 25
    }.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vid", "vec")
    val res = IvfPq.residuals(emb, "vid", "vec", c4)
    val cb = Pq.trainCodebooks(res, "id", "rv", m = 2,
      seedPred = col("id") < 4, iters = 1)
    val codes = Pq.assign(Pq.subvectors(res, "id", "rv", 2), cb)
      .join(res.select("id", "bid"), "id")
    // probe ONLY the near bucket
    val probes = IvfPq.probeResiduals(emb.where($"vid" === 0L),
      "vid", "vec", c4, nprobe = 1)
    val got = IvfPq.searchAdc(probes, codes, cb, m = 2, k = 10).collect()
    val candIds = got.map(_.getLong(2)).toSet
    assert(candIds.nonEmpty)
    assert(candIds.forall(_ % 2 == 0), s"odd ids live in the unprobed bucket: $candIds")
    assert(!candIds.contains(0L), "a query never ranks itself")
    // nprobe=2 reaches the far bucket too
    val both = IvfPq.searchAdc(
      IvfPq.probeResiduals(emb.where($"vid" === 0L), "vid", "vec", c4, 2),
      codes, cb, m = 2, k = 12).collect().map(_.getLong(2)).toSet
    assert(both.exists(_ % 2 == 1))
  }

  test("exact rerank keeps the shortlist membership but orders by true distance") {
    val c4 = Seq((100L, Seq(0f, 0f, 0f, 0f))).toDF("bid", "bvec")
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 2f, 0f, 0f)),
      (3L, Seq(3f, 0f, 0f, 0f))).toDF("vid", "vec")
    val res = IvfPq.residuals(emb, "vid", "vec", c4)
    val cb = Pq.trainCodebooks(res, "id", "rv", m = 2,
      seedPred = col("id") < 2, iters = 1)
    val codes = Pq.assign(Pq.subvectors(res, "id", "rv", 2), cb)
      .join(res.select("id", "bid"), "id")
    val probes = IvfPq.probeResiduals(emb.where($"vid" === 0L),
      "vid", "vec", c4, nprobe = 1)
    val adc = IvfPq.searchAdc(probes, codes, cb, m = 2, k = 3)
    val rer = IvfPq.rerankExact(adc, emb, "vid", "vec")
      .orderBy("rk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rer.map(_._2).toSet === adc.collect().map(_.getLong(2)).toSet,
      "rerank must not change WHO is in the shortlist")
    assert(rer.map(_._3).toSeq === rer.map(_._3).sorted.toSeq,
      "rerank orders by exact distance")
    // exact distances are the true ones: 1, 4, 9 for cands 1, 2, 3
    assert(rer.map(t => (t._2, t._3)).toMap ===
      Map(1L -> 1.0, 2L -> 4.0, 3L -> 9.0))
  }

  test("bad nprobe is refused") {
    val q = Seq((1L, Seq(0f, 0f))).toDF("vid", "vec")
    intercept[IllegalArgumentException] {
      IvfPq.probeResiduals(q, "vid", "vec", cents, nprobe = 0)
    }
  }
}
