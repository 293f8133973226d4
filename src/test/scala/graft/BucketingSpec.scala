package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** Bucketed tables must make the key equi-join shuffle-free: both scans
  * report the bucket hash distribution, so the sort-merge join runs
  * with zero exchanges. Broadcast is disabled inside the test — at real
  * fact-table sizes broadcast is off the table, and the point is the
  * exchange-free SMJ.
  */
class BucketingSpec extends SparkTestBase {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      Seq(s) ++ collectAll(s.plan)
    case other => Seq(other) ++ other.children.flatMap(collectAll)
  }

  test("orderkey-bucketed orders ⋈ lineitem plans with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      Bucketing.writeBucketed(
        Tables.read(spark, sf("sf0.001"), "orders"),
        "orders_b", s"$dir/orders_b", "o_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.read(spark, sf("sf0.001"), "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", s"$dir/lineitem_b", "o_orderkey", 8)

      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val n = joined.count()
      assert(n > 0)
      val plan = collectAll(joined.queryExecution.executedPlan)
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join must be exchange-free, found ${shuffles.size} shuffles")

      // sanity: same row count as the plain (shuffling) join
      val plain = Tables.read(spark, sf("sf0.001"), "orders").join(
        Tables.read(spark, sf("sf0.001"), "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(n == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
