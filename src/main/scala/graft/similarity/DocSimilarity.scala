package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise document cosine similarity over TF-IDF weight tables.
  *
  * The reference has two strategies:
  *  - naive cartesian product over all pairs
  *    (textanalyse/EntityResolution.scala:133-157)
  *  - inverted index + common-token join + broadcast maps
  *    (textanalyse/ScalableEntityResolution.scala:64-129)
  *
  * Spark-first design: the long-form weight table `(id, token, weight)`
  * IS the inverted index, so the scalable path collapses to a single
  * relational expression:
  *
  *   dot(a,b) = SUM(wA * wB) GROUP BY (aId, bId) over an equi-join on token
  *
  * which fuses the reference's J2 (token join) + A8 (groupByKey of common
  * tokens) + V7 (probe broadcast weight maps) into one shuffle-aggregated
  * join that Catalyst plans (SMJ/SHJ + partial aggregation). Nothing is
  * collected to the driver; both sides scale horizontally. Docs sharing
  * no token never meet (their cosine is 0 in the reference too — NaN/0
  * handling per SURVEY.md §7 stays with the caller).
  */
object DocSimilarity {

  /** Scalable inverted-index cosine: all pairs sharing ≥1 token.
    *
    * @param weightsA long-form weights (idA renamed unique), tokens col "token"
    * @param normsA   per-doc L2 norms
    * @return (idA, idB, sim)
    */
  def invertedIndexCosine(
      weightsA: DataFrame, normsA: DataFrame,
      weightsB: DataFrame, normsB: DataFrame,
      idA: String, idB: String): DataFrame = {
    val a = weightsA.select(col(idA), col("token"), col("weight").as("wa"))
    val b = weightsB.select(col(idB), col("token"), col("weight").as("wb"))
    val dots = a.join(b, "token")
      .groupBy(col(idA), col(idB))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(normsA.select(col(idA), col("norm").as("norm_a")), idA)
      .join(normsB.select(col(idB), col("norm").as("norm_b")), idB)
      .select(col(idA), col(idB),
        (col("dot") / (col("norm_a") * col("norm_b"))).as("sim"))
  }

  /** Self-join variant over one corpus: unordered pairs (a < b). */
  def selfCosinePairs(weights: DataFrame, norms: DataFrame, id: String): DataFrame = {
    val wa = weights.select(col(id).as("id_a"), col("token"), col("weight").as("wa"))
    val wb = weights.select(col(id).as("id_b"), col("token"), col("weight").as("wb"))
    val na = norms.select(col(id).as("id_a"), col("norm").as("norm_a"))
    val nb = norms.select(col(id).as("id_b"), col("norm").as("norm_b"))
    wa.join(wb, "token")
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(na, "id_a").join(nb, "id_b")
      .select(col("id_a"), col("id_b"),
        (col("dot") / (col("norm_a") * col("norm_b"))).as("sim"))
  }

  /** Naive cartesian cosine (reference's small-sample strategy,
    * textanalyse/EntityResolution.scala:133-157). Correct at any scale
    * but O(|A|·|B|); kept for parity tests and tiny inputs — the
    * cross join is a `BroadcastNestedLoopJoin` when one side is small.
    */
  def cartesianCosine(
      weightsA: DataFrame, normsA: DataFrame,
      weightsB: DataFrame, normsB: DataFrame,
      idA: String, idB: String): DataFrame = {
    val pairs = normsA.select(col(idA), col("norm").as("norm_a"))
      .crossJoin(normsB.select(col(idB), col("norm").as("norm_b")))
    val dots = weightsA.select(col(idA), col("token"), col("weight").as("wa"))
      .join(weightsB.select(col(idB), col("token"), col("weight").as("wb")), "token")
      .groupBy(col(idA), col(idB))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    pairs.join(dots, Seq(idA, idB), "left")
      .select(col(idA), col(idB),
        (coalesce(col("dot"), lit(0.0)) / (col("norm_a") * col("norm_b"))).as("sim"))
  }
}
