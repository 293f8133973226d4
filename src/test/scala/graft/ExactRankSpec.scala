package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ExactRank

class ExactRankSpec extends SparkTestBase {
  import spark.implicits._

  test("ranks equal the single-partition window's on a total order") {
    val df = Seq(5L -> 10L, 3L -> 11L, 5L -> 2L, 1L -> 9L, 8L -> 1L,
        3L -> 3L, 5L -> 5L)
      .toDF("x", "id")
    val (got, n) = ExactRank.withRowNumber(
      df, Seq(col("x"), col("id")), "rk", numPartitions = 3)
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy(col("x"), col("id"))).cast("long"))
    assert(n === 7L)
    assert(got.orderBy("rk").collect().toSeq ===
      want.orderBy("rk").collect().toSeq)
  }

  test("more partitions than rows: empty partitions contribute zero offset") {
    val df = Seq(2L -> 1L, 1L -> 2L).toDF("x", "id")
    val (got, n) = ExactRank.withRowNumber(
      df, Seq(col("x"), col("id")), "rk", numPartitions = 16)
    assert(n === 2L)
    assert(got.select("x", "rk").as[(Long, Long)].collect().sorted.toSeq ===
      Seq((1L, 1L), (2L, 2L)))
  }

  test("equal sort keys land in one partition, tiebreak makes ranks deterministic") {
    // 200 rows over 3 distinct x values: any boundary between equal x
    // values would double-assign ranks if the partitioner split them
    val df = spark.range(200).select((col("id") % 3).as("x"), col("id"))
    val (got, n) = ExactRank.withRowNumber(
      df, Seq(col("x"), col("id")), "rk", numPartitions = 8)
    assert(n === 200L)
    val ranks = got.select("rk").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 200L)) // a permutation: exact, no gaps/dups
    // deterministic: first rank within each x group follows the id tiebreak
    val firstOfX1 = got.where(col("x") === 1).orderBy("rk")
      .select("id").as[Long].first()
    assert(firstOfX1 === 1L)
  }

  test("empty input yields an empty frame and zero total") {
    val df = spark.range(0).select(col("id").as("x"), col("id"))
    val (got, n) = ExactRank.withRowNumber(df, Seq(col("x")), "rk")
    assert(n === 0L)
    assert(got.count() === 0L)
  }

  test("no unpartitioned WindowExec in the physical plan") {
    val df = spark.range(1000).select((col("id") * 37 % 101).as("x"), col("id"))
    val (got, _) = ExactRank.withRowNumber(
      df, Seq(col("x"), col("id")), "rk", numPartitions = 8)
    got.collect()
    val hasGlobalWindow = got.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }.nonEmpty
    assert(!hasGlobalWindow, "exact rank must never sort the world in one task")
  }
}
