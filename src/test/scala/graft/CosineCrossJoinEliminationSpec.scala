package graft

import graft.plans.CosineCrossJoinElimination
import graft.similarity.DocSimilarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The cross-join-elimination optimizer rule: under `sim > θ` (θ ≥ 0)
  * the naive all-pairs cosine plan must lose its cartesian, produce
  * identical results, and the rule must NOT fire when the zero-default
  * rows are observable (no filter, or a threshold below zero).
  */
class CosineCrossJoinEliminationSpec extends SparkTestBase {
  import spark.implicits._

  // docs 1/2 share token x; doc 3 is disjoint (sim 0 vs both)
  private def naive(): DataFrame = {
    val w = Seq((1L, "x", 0.6), (1L, "y", 0.8), (2L, "x", 1.0), (3L, "z", 1.0))
      .toDF("id", "token", "weight")
    val n = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0)).toDF("id", "norm")
    DocSimilarity.cartesianCosine(
      w.withColumnRenamed("id", "id_a"), n.withColumnRenamed("id", "id_a"),
      w.withColumnRenamed("id", "id_b"), n.withColumnRenamed("id", "id_b"),
      "id_a", "id_b")
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CosineCrossJoinElimination
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq CosineCrossJoinElimination)
  }

  private def hasCartesian(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    s.contains("CartesianProduct") || s.contains("BroadcastNestedLoop")
  }

  test("filtered naive cosine loses the cross join and keeps identical results") {
    val unoptimized = naive().where(col("sim") > 0.1)
      .as[(Long, Long, Double)].collect().toSet
    assert(hasCartesian(naive().where(col("sim") > 0.1)),
      "precondition: Spark alone keeps the cartesian")
    withRule {
      val df = naive().where(col("sim") > 0.1)
      val got = df.as[(Long, Long, Double)].collect().toSet
      assert(!hasCartesian(df), "rule must eliminate the cartesian")
      assert(got === unoptimized, "rewrite must be semantics-preserving")
      assert(got.nonEmpty)
    }
  }

  test("θ = 0 (strict) also eliminates — zero-default rows cannot pass sim > 0") {
    withRule {
      val df = naive().where(col("sim") > 0.0)
      assert(!hasCartesian(df))
      val got = df.as[(Long, Long, Double)].collect().toSet
      // cross-doc pairs involving doc 3 (disjoint vocabulary) are gone;
      // its self-pair (shared token z, sim 1.0) survives
      assert(got.map(t => (t._1, t._2)) ===
        Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 3L)))
    }
  }

  test("rule does not fire when all pairs are observable") {
    withRule {
      // no filter: the zero-default rows ARE the output
      val all = naive()
      assert(hasCartesian(all), "unfiltered all-pairs must keep the cross join")
      assert(all.count() === 9L)
      // threshold below zero keeps zero-sim rows too
      val neg = naive().where(col("sim") > -1.0)
      assert(hasCartesian(neg))
      assert(neg.count() === 9L)
    }
  }
}
