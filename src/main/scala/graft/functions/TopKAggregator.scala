package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (similarity, candidate) pair flowing through [[TopKAggregator]]. */
case class ScoredCand(sim: Double, cand_id: Long)

/** Partial-aggregable top-k by (sim DESC, cand_id ASC) — the mergeable
  * replacement for a `row_number()` window in kNN result selection.
  *
  * A window partitioned by query id must SORT each query's entire
  * candidate partition, so its cost grows with corpus size even though
  * only k rows survive. This aggregator keeps a k-slot sorted buffer per
  * query instead: `reduce` folds candidates in map-side partial
  * aggregates, `merge` combines k-slot buffers across partitions, so the
  * full candidate set is never materialized per query — the shuffle
  * carries at most k rows per (query, input partition). Deterministic:
  * the (sim DESC, cand_id ASC) order is total, matching the
  * `row_number()` ordering it replaces.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredCand, List[ScoredCand], Seq[ScoredCand]] {
  require(k > 0, s"k must be positive, got $k")

  // java.lang.Double.compare, not raw >: it orders NaN greatest and
  // equal to itself — matching Spark's sort semantics, so a NaN sim
  // ranks exactly where the row_number window would put it instead of
  // losing every comparison (which would make results merge-order
  // dependent)
  private def beats(a: ScoredCand, b: ScoredCand): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && a.cand_id < b.cand_id)
  }

  /** Insert into a sorted k-slot buffer, dropping past slot k. */
  private def insert(sorted: List[ScoredCand], x: ScoredCand): List[ScoredCand] =
    if (sorted.lengthCompare(k) >= 0 && !beats(x, sorted.last)) sorted
    else {
      val (pre, post) = sorted.span(s => beats(s, x))
      (pre ::: x :: post).take(k)
    }

  def zero: List[ScoredCand] = Nil
  def reduce(buf: List[ScoredCand], x: ScoredCand): List[ScoredCand] = insert(buf, x)
  def merge(a: List[ScoredCand], b: List[ScoredCand]): List[ScoredCand] =
    b.foldLeft(a)(insert)
  def finish(buf: List[ScoredCand]): Seq[ScoredCand] = buf
  def bufferEncoder: Encoder[List[ScoredCand]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredCand]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column form: `topK(k)(simCol, candIdCol)` aggregates to an
    * ARRAY<STRUCT<sim, cand_id>> sorted by (sim DESC, cand_id ASC),
    * length ≤ k. candIdCol must be LONG (cast before, cast back after).
    */
  def topK(k: Int)(sim: Column, candId: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredCand]).apply(sim, candId)
}
