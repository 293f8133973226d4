package graft

import graft.functions.CountMin
import org.apache.spark.sql.functions._

/** Fixtures for the relational count-min sketch (q142's kernel): the
  * ≥-truth guarantee, build-path equivalence, the stateless serving
  * form, and counter-wise mergeability (the property that makes the
  * artifact unionable across corpus shards and micro-batches).
  */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 4
  private val W = 4096

  private val instances = Seq(
    "spark", "spark", "spark", "data", "data", "engine", "big", "big", "big", "big")
  private def inst = instances.toDF("token")
  private val trueCounts = instances.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("estimates equal true counts when the vocabulary is far below width") {
    val sk = CountMin.sketch(inst, col("token"), lit(1L), D, W)
    val est = CountMin.estimate(trueCounts.keys.toSeq.toDF("token"),
        col("token"), sk, D, W)
      .as[(String, Long)].collect().toMap
    assert(est === trueCounts, "4 tokens in 4096 buckets: no collisions, exact")
  }

  test("weighted build from pre-aggregated counts equals the instance build") {
    val skInst = CountMin.sketch(inst, col("token"), lit(1L), D, W)
    val agg = inst.groupBy("token").agg(count(lit(1)).as("cnt"))
    val skAgg = CountMin.sketch(agg, col("token"), col("cnt"), D, W)
    assert(skInst.as[(Int, Long, Long)].collect().sorted.toSeq ===
      skAgg.as[(Int, Long, Long)].collect().sorted.toSeq)
  }

  test("stateless join-chain estimate matches the aggregating form row for row") {
    val sk = CountMin.sketch(inst, col("token"), lit(1L), D, W)
    val qs = (trueCounts.keys.toSeq :+ "unseen").toDF("token")
    val a = CountMin.estimate(qs, col("token"), sk, D, W)
      .as[(String, Long)].collect().toMap
    val b = CountMin.estimateStateless(qs, col("token"), sk, D, W)
      .as[(String, Long)].collect().toMap
    assert(a === b)
    assert(a("unseen") === 0L)
  }

  test("sketches merge counter-wise: sketch(A ∪ B) = sketch(A) + sketch(B)") {
    val a = Seq("x", "x", "y").toDF("token")
    val b = Seq("y", "z").toDF("token")
    val whole = CountMin.sketch(a.union(b), col("token"), lit(1L), D, W)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val merged = CountMin.merge(
        CountMin.sketch(a, col("token"), lit(1L), D, W),
        CountMin.sketch(b, col("token"), lit(1L), D, W))
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(whole === merged)
  }

  test("estimates never undercount, even at a colliding width") {
    // width 2: heavy collisions guaranteed — the ≥ guarantee must hold
    val sk = CountMin.sketch(inst, col("token"), lit(1L), D, 2)
    val est = CountMin.estimate(trueCounts.keys.toSeq.toDF("token"),
        col("token"), sk, D, 2)
      .as[(String, Long)].collect().toMap
    trueCounts.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS must never undercount ($t)")
    }
  }
}
