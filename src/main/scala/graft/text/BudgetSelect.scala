package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-capped corpus selection: take documents in (score DESC, id)
  * order until a token/byte budget is exhausted — the "select the best
  * N-billion tokens" step of corpus assembly.
  *
  * The semantics are a global running sum over a total order, but a
  * single `row_number`/`sum over ()` window would sort the whole corpus
  * on one partition. Instead the selection is two-phase:
  *
  *   1. bucket every doc by `floor(score · buckets)` and aggregate
  *      per-bucket weight totals — a corpus-wide HASH agg onto ≤
  *      buckets+1 rows;
  *   2. a bounded window over that tiny table (the q43 pattern —
  *      provably ≤ buckets+1 rows at ANY scale factor) finds each
  *      bucket's tokens-before; buckets whose whole range fits the
  *      budget are accepted WITHOUT any per-doc ordering, buckets past
  *      the budget are rejected outright, and only the ONE boundary
  *      bucket (`before < budget < before + total`) pays a sort —
  *      a per-doc cumulative sum over ~1/buckets of the corpus.
  *
  * The set selected is exactly the global-window answer: floor is
  * monotonic, so the (score DESC, id) order refines bucket-DESC order,
  * and within the boundary bucket the window uses the same key.
  * Docs with zero weight are excluded up front (they can never consume
  * budget, and keeping them would make the strict `before < budget`
  * boundary ambiguous between whole-bucket and per-doc acceptance).
  *
  * Scores must be exact-deterministic doubles (single IEEE division of
  * exact integers, the house rule) so both engines bucket and order
  * identically; no rounding enters the selection itself.
  */
object BudgetSelect {

  /** Rows of `scored` (idCol, weightCol, scoreCol in [0,1]) whose
    * cumulative weight in (score DESC, id ASC) order stays under
    * `budget` (a one-row DataFrame with column `budget`).
    */
  def selectByBudget(scored: DataFrame, idCol: String, weightCol: String,
                     scoreCol: String, budget: DataFrame,
                     buckets: Int = 1000): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    // consumed three times (bucket totals, whole-bucket join, boundary
    // join) — left lazy, whatever scoring pipeline feeds `scored`
    // (tokenization, typically the expensive part) would run three
    // times. The projection is narrow (id, weight, score, bucket), so
    // materialize it once.
    val sc = scored.where(col(weightCol) >= 1)
      .select(col(idCol), col(weightCol), col(scoreCol),
        floor(col(scoreCol) * buckets).cast("int").as("_bucket"))
      .localCheckpoint()
    val bstats = sc.groupBy("_bucket").agg(sum(col(weightCol)).as("_btotal"))
    // bounded window: ≤ buckets+1 rows regardless of corpus size
    val wDesc = Window.orderBy(col("_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcum = bstats
      .withColumn("_bbefore", coalesce(sum(col("_btotal")).over(wDesc), lit(0L)))
      .crossJoin(broadcast(budget))
    val whole = bcum.where(col("_bbefore") + col("_btotal") <= col("budget"))
      .select(col("_bucket"))
    val boundary = bcum.where(col("_bbefore") < col("budget") &&
        col("_bbefore") + col("_btotal") > col("budget"))
      .select(col("_bucket"), col("_bbefore"), col("budget"))
    val wholeDocs = sc.join(broadcast(whole), "_bucket")
      .select(col(idCol), col(weightCol), col(scoreCol))
    // only the boundary bucket pays a per-doc ordering, and its window
    // partitions on the bucket key so Spark plans it as one (bounded)
    // partition of ~1/buckets of the corpus, not a global sort
    val wIn = Window.partitionBy("_bucket")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundaryDocs = sc.join(broadcast(boundary), "_bucket")
      .withColumn("_before",
        col("_bbefore") + coalesce(sum(col(weightCol)).over(wIn), lit(0L)))
      .where(col("_before") < col("budget"))
      .select(col(idCol), col(weightCol), col(scoreCol))
    wholeDocs.union(boundaryDocs)
  }

  /** Per-GROUP budget selection — the corpus-mixing form of
    * [[selectByBudget]]: every group (source, language, domain …) gets
    * its own budget row and consumes it independently in
    * (score DESC, id) order. Same two-phase shape with the group key
    * threaded through: bucket totals are a hash agg onto ≤
    * groups·(buckets+1) rows, the cumulative window partitions BY GROUP
    * over that bounded table, and only each group's one boundary bucket
    * pays a per-doc ordering — so the per-group "running sum over a
    * total order" never becomes a per-group sort of the corpus.
    *
    * `budgets` must be one (groupCol, budget) row per group (it rides
    * broadcast); groups without a budget row are dropped (select
    * nothing), budgets ≥ the group total keep the whole group.
    */
  def selectByBudgetGrouped(scored: DataFrame, idCol: String, weightCol: String,
                            scoreCol: String, groupCol: String, budgets: DataFrame,
                            buckets: Int = 1000): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val sc = scored.where(col(weightCol) >= 1)
      .select(col(groupCol), col(idCol), col(weightCol), col(scoreCol),
        floor(col(scoreCol) * buckets).cast("int").as("_bucket"))
      .localCheckpoint()
    val bstats = sc.groupBy(groupCol, "_bucket").agg(sum(col(weightCol)).as("_btotal"))
    val wDesc = Window.partitionBy(groupCol).orderBy(col("_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcum = bstats
      .withColumn("_bbefore", coalesce(sum(col("_btotal")).over(wDesc), lit(0L)))
      .join(broadcast(budgets), Seq(groupCol))
    val whole = bcum.where(col("_bbefore") + col("_btotal") <= col("budget"))
      .select(col(groupCol), col("_bucket"))
    val boundary = bcum.where(col("_bbefore") < col("budget") &&
        col("_bbefore") + col("_btotal") > col("budget"))
      .select(col(groupCol), col("_bucket"), col("_bbefore"), col("budget"))
    val wholeDocs = sc.join(broadcast(whole), Seq(groupCol, "_bucket"))
      .select(col(groupCol), col(idCol), col(weightCol), col(scoreCol))
    val wIn = Window.partitionBy(groupCol, "_bucket")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundaryDocs = sc.join(broadcast(boundary), Seq(groupCol, "_bucket"))
      .withColumn("_before",
        col("_bbefore") + coalesce(sum(col(weightCol)).over(wIn), lit(0L)))
      .where(col("_before") < col("budget"))
      .select(col(groupCol), col(idCol), col(weightCol), col(scoreCol))
    wholeDocs.union(boundaryDocs)
  }
}
