package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ranking metrics for classifier evaluation — the audit step
  * after fitting a corpus-filter model (NaiveBayes language/quality
  * gates): is the model's SCORE actually ordering positives above
  * negatives, independent of any threshold?
  */
object Metrics {

  /** Exact ROC AUC of `scoreCol` against the binary `posCol` (1 =
    * positive) via the Mann–Whitney rank-sum identity:
    * AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻) over all positive×negative pairs.
    *
    * Computed without enumerating pairs: scores collapse to a
    * (score, n_pos, n_neg) hash-agg table; a cumulative count of
    * negatives strictly below each distinct score then gives
    * U = Σ_s [n_pos(s)·neg_below(s) + n_pos(s)·n_neg(s)/2]. The halves
    * are kept exact by accumulating 2U as integers (`u2`); the emitted
    * auc = u2 / (2·n_pos·n_neg) is one exact bigint/bigint IEEE
    * division — bit-identical across engines, no rounding.
    *
    * Scale shape: the one ordered scan runs over the AGGREGATED
    * distinct-score table, not the row table (q43's sweep pattern) —
    * eval sets are bounded by labeling budget, not corpus size, and
    * ties collapse further. Degenerate single-class inputs emit NULL
    * auc, never an ANSI 0/0.
    *
    * Returns one row: (n_pos, n_neg, u2, auc).
    */
  def binaryAuc(scored: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("m"))
      .agg(sum(col(posCol).cast("long")).as("np"),
        sum(lit(1L) - col(posCol).cast("long")).as("nn"))
    val below = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    val c = g.withColumn("nb", coalesce(sum(col("nn")).over(below), lit(0L)))
    c.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(lit(2L) * col("np") * col("nb") + col("np") * col("nn")).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(col("u2") / (lit(2L) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }
}
