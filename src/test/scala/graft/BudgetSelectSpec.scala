package graft

import graft.text.BudgetSelect
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase bucketed budget selection must return EXACTLY the set a
  * global (score DESC, id) running-sum window would select, for any
  * budget — whole buckets, the boundary bucket's internal cut, and the
  * degenerate edges.
  */
class BudgetSelectSpec extends SparkTestBase {

  import spark.implicits._

  // deterministic pseudo-random fixture: ids 0..399, weights 1..20,
  // scores on a coarse grid so bucket-boundary ties are exercised
  private lazy val scored: DataFrame = spark.range(400)
    .select(col("id"),
      (pmod(col("id") * 7919 + 13, lit(20)) + 1).as("w"),
      (pmod(col("id") * 104729 + 7, lit(37)).cast("double") / 37).as("score"))

  private def oracle(budget: Long): Set[Long] = {
    val before = coalesce(
      sum("w").over(Window.orderBy(col("score").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    scored.withColumn("before", before)
      .where(col("before") < budget)
      .select("id").as[Long].collect().toSet
  }

  private def selected(budget: Long): Set[Long] = {
    val b = spark.range(1).select(lit(budget).as("budget"))
    BudgetSelect.selectByBudget(scored, "id", "w", "score", b, buckets = 10)
      .select("id").as[Long].collect().toSet
  }

  test("matches the global-window selection across budget sweep") {
    val total = scored.agg(sum("w")).as[Long].head()
    for (budget <- Seq(1L, 7L, 50L, total / 4, total / 2, total - 1, total, total + 100)) {
      assert(selected(budget) === oracle(budget), s"budget=$budget")
    }
  }

  test("zero budget selects nothing; full budget selects everything") {
    assert(selected(0L).isEmpty)
    assert(selected(Long.MaxValue / 2).size === 400)
  }

  test("zero-weight rows are never selected and never consume budget") {
    val withZero = scored.union(
      spark.range(1000, 1010).select(col("id"), lit(0L).as("w"), lit(1.0).as("score")))
    val b = spark.range(1).select(lit(30L).as("budget"))
    val got = BudgetSelect.selectByBudget(withZero, "id", "w", "score", b, buckets = 10)
      .select("id").as[Long].collect().toSet
    assert(got === oracle(30L))
  }

  // ---- grouped variant: per-group budgets must reproduce the
  // per-group window selection exactly

  private lazy val grouped: DataFrame = scored
    .withColumn("g", (col("id") % 3).cast("string"))

  private def groupedOracle(budgets: Map[String, Long]): Set[Long] = {
    val before = coalesce(
      sum("w").over(Window.partitionBy("g").orderBy(col("score").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val budDf = budgets.toSeq.toDF("g", "budget")
    grouped.join(budDf, "g").withColumn("before", before)
      .where(col("before") < col("budget"))
      .select("id").as[Long].collect().toSet
  }

  private def groupedSelected(budgets: Map[String, Long]): Set[Long] = {
    val budDf = budgets.toSeq.toDF("g", "budget")
    BudgetSelect.selectByBudgetGrouped(grouped, "id", "w", "score", "g",
        budDf, buckets = 10)
      .select("id").as[Long].collect().toSet
  }

  test("grouped selection matches the per-group window across budget mixes") {
    val totals = grouped.groupBy("g").agg(sum("w").as("t"))
      .as[(String, Long)].collect().toMap
    val mixes = Seq(
      Map("0" -> 1L, "1" -> 50L, "2" -> 7L),
      Map("0" -> totals("0") / 2, "1" -> totals("1"), "2" -> (totals("2") + 100L)),
      Map("0" -> totals("0"), "1" -> 1L, "2" -> totals("2") / 4))
    for (m <- mixes) assert(groupedSelected(m) === groupedOracle(m), s"mix=$m")
  }

  test("groups without a budget row select nothing; oversized budgets keep the group") {
    val only = groupedSelected(Map("1" -> Long.MaxValue / 2))
    val g1 = grouped.where(col("g") === "1").select("id").as[Long].collect().toSet
    assert(only === g1)
  }

  test("grouped per-doc windows stay bucket-partitioned (no per-group corpus sort)") {
    val budDf = Seq(("0", 40L), ("1", 40L), ("2", 40L)).toDF("g", "budget")
    val plan = BudgetSelect.selectByBudgetGrouped(grouped, "id", "w", "score", "g",
        budDf, buckets = 10)
      .queryExecution.optimizedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toList
    val perDoc = windowLines.filterNot(_.contains("_bucket DESC"))
    assert(perDoc.forall(_.contains("_bucket")),
      s"per-doc window without bucket partitioning:\n${perDoc.mkString("\n")}")
  }

  test("boundary-bucket window partitions by bucket (no global sort)") {
    val b = spark.range(1).select(lit(100L).as("budget"))
    val plan = BudgetSelect.selectByBudget(scored, "id", "w", "score", b, buckets = 10)
      .queryExecution.optimizedPlan.toString
    // every per-doc Window in the plan must carry the bucket partition key;
    // the only unpartitioned window is the ≤ buckets+1-row bucket cumsum
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toList
    val perDoc = windowLines.filterNot(_.contains("_bucket DESC"))
    assert(perDoc.forall(_.contains("_bucket")),
      s"per-doc window without bucket partitioning:\n${perDoc.mkString("\n")}")
  }
}
