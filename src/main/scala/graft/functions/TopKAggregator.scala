package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial-aggregable k-slot selection — the mergeable replacement for
  * a `row_number()` window.
  *
  * A window partitioned by a group key must SORT each group's entire
  * partition, so its cost grows with corpus size even though only k
  * rows survive (and a LOW-cardinality group key — 3 strata — pins the
  * whole corpus onto that many partitions). This base keeps a k-slot
  * sorted buffer per group instead: `reduce` folds rows in map-side
  * partial aggregates, `merge` combines k-slot buffers across
  * partitions, so the full row set is never materialized per group —
  * the shuffle carries at most k rows per (group, input partition).
  * Deterministic whenever `beats` is a TOTAL order (every concrete
  * comparator below is), matching the window ordering it replaces.
  * Subclasses supply only the comparator and the concrete encoders —
  * the subtle bounded-insert logic lives exactly once.
  */
abstract class KSlotAggregator[T](k: Int) extends Aggregator[T, List[T], Seq[T]] {
  require(k > 0, s"k must be positive, got $k")

  /** true iff `a` sorts strictly before `b` (must be a total order). */
  protected def beats(a: T, b: T): Boolean

  /** Insert into a sorted k-slot buffer, dropping past slot k. */
  private def insert(sorted: List[T], x: T): List[T] =
    if (sorted.lengthCompare(k) >= 0 && !beats(x, sorted.last)) sorted
    else {
      val (pre, post) = sorted.span(s => beats(s, x))
      (pre ::: x :: post).take(k)
    }

  final def zero: List[T] = Nil
  final def reduce(buf: List[T], x: T): List[T] = insert(buf, x)
  final def merge(a: List[T], b: List[T]): List[T] = b.foldLeft(a)(insert)
  final def finish(buf: List[T]): Seq[T] = buf
}

/** One (similarity, candidate) pair flowing through [[TopKAggregator]]. */
case class ScoredCand(sim: Double, cand_id: Long)

/** Top-k by (sim DESC, cand_id ASC) for kNN result selection. */
class TopKAggregator(k: Int) extends KSlotAggregator[ScoredCand](k) {
  // java.lang.Double.compare, not raw >: it orders NaN greatest and
  // equal to itself — matching Spark's sort semantics, so a NaN sim
  // ranks exactly where the row_number window would put it instead of
  // losing every comparison (which would make results merge-order
  // dependent)
  protected def beats(a: ScoredCand, b: ScoredCand): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && a.cand_id < b.cand_id)
  }
  def bufferEncoder: Encoder[List[ScoredCand]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredCand]] = ExpressionEncoder()
}

/** One (similarity, candidate) pair with a binary id, for
  * [[TopKBinaryAggregator]].
  */
case class ScoredCandBin(sim: Double, cand_id: Array[Byte])

/** [[TopKAggregator]] for non-integral candidate ids: the id rides the
  * k-slot buffer as BINARY (a string id is its UTF-8 bytes via
  * `cast("binary")`), and ties compare by unsigned byte order —
  * exactly Spark's `UTF8String`/binary sort order, so the result
  * matches the `row_number()` window on the original column
  * bit-for-bit. This gives UUID/URL-keyed corpora the same mergeable
  * partial-aggregation path as long-keyed ones instead of the
  * per-query window sort.
  */
class TopKBinaryAggregator(k: Int) extends KSlotAggregator[ScoredCandBin](k) {
  protected def beats(a: ScoredCandBin, b: ScoredCandBin): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && java.util.Arrays.compareUnsigned(a.cand_id, b.cand_id) < 0)
  }
  def bufferEncoder: Encoder[List[ScoredCandBin]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredCandBin]] = ExpressionEncoder()
}

/** One (sort key, id) pair flowing through [[BottomKAggregator]]. */
case class KeyedId(key: Array[Byte], id: Long)

/** Bottom-k by (key ASC in unsigned byte order, id ASC) — the
  * ascending twin of [[TopKAggregator]], for "first k per group under a
  * deterministic sort key" selections (salted-hash stratified sampling,
  * reservoir-style picks). Unsigned byte comparison equals Spark's
  * string/binary sort order, so a string key rides as its UTF-8 bytes
  * with window-identical results.
  */
class BottomKAggregator(k: Int) extends KSlotAggregator[KeyedId](k) {
  protected def beats(a: KeyedId, b: KeyedId): Boolean = {
    val c = java.util.Arrays.compareUnsigned(a.key, b.key)
    c < 0 || (c == 0 && a.id < b.id)
  }
  def bufferEncoder: Encoder[List[KeyedId]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[KeyedId]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column form: `topK(k)(simCol, candIdCol)` aggregates to an
    * ARRAY<STRUCT<sim, cand_id>> sorted by (sim DESC, cand_id ASC),
    * length ≤ k. candIdCol must be LONG (cast before, cast back after).
    */
  def topK(k: Int)(sim: Column, candId: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredCand]).apply(sim, candId)

  /** [[topK]] with a BINARY-buffered id for string/binary id columns
    * (cast string ids with `.cast("binary")` before, back after).
    */
  def topKBinary(k: Int)(sim: Column, candId: Column): Column =
    udaf(new TopKBinaryAggregator(k), Encoders.product[ScoredCandBin]).apply(sim, candId)

  /** Column form of [[BottomKAggregator]]: aggregates to an
    * ARRAY<STRUCT<key, id>> of the k smallest (key, id) pairs, key
    * compared in unsigned byte order (cast string keys to binary).
    */
  def bottomK(k: Int)(key: Column, id: Column): Column =
    udaf(new BottomKAggregator(k), Encoders.product[KeyedId]).apply(key, id)
}
