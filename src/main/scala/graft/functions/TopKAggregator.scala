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
class TopKBinaryAggregator(k: Int)
    extends Aggregator[ScoredCandBin, List[ScoredCandBin], Seq[ScoredCandBin]] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: ScoredCandBin, b: ScoredCandBin): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && java.util.Arrays.compareUnsigned(a.cand_id, b.cand_id) < 0)
  }

  private def insert(sorted: List[ScoredCandBin], x: ScoredCandBin): List[ScoredCandBin] =
    if (sorted.lengthCompare(k) >= 0 && !beats(x, sorted.last)) sorted
    else {
      val (pre, post) = sorted.span(s => beats(s, x))
      (pre ::: x :: post).take(k)
    }

  def zero: List[ScoredCandBin] = Nil
  def reduce(buf: List[ScoredCandBin], x: ScoredCandBin): List[ScoredCandBin] = insert(buf, x)
  def merge(a: List[ScoredCandBin], b: List[ScoredCandBin]): List[ScoredCandBin] =
    b.foldLeft(a)(insert)
  def finish(buf: List[ScoredCandBin]): Seq[ScoredCandBin] = buf
  def bufferEncoder: Encoder[List[ScoredCandBin]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredCandBin]] = ExpressionEncoder()
}

/** One (sort key, id) pair flowing through [[BottomKAggregator]]. */
case class KeyedId(key: Array[Byte], id: Long)

/** Partial-aggregable bottom-k by (key ASC in unsigned byte order,
  * id ASC) — the ascending twin of [[TopKAggregator]], for "first k per
  * group under a deterministic sort key" selections (salted-hash
  * stratified sampling, reservoir-style picks). A `row_number()` window
  * partitioned by a LOW-cardinality group (e.g. 3 strata) sorts the
  * whole corpus on that many partitions; this buffer keeps k rows per
  * (group, input partition) and merges, so no task ever holds more
  * than k rows of state per group. Unsigned byte comparison equals
  * Spark's string/binary sort order, so a string key rides as its
  * UTF-8 bytes with window-identical results.
  */
class BottomKAggregator(k: Int)
    extends Aggregator[KeyedId, List[KeyedId], Seq[KeyedId]] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: KeyedId, b: KeyedId): Boolean = {
    val c = java.util.Arrays.compareUnsigned(a.key, b.key)
    c < 0 || (c == 0 && a.id < b.id)
  }

  private def insert(sorted: List[KeyedId], x: KeyedId): List[KeyedId] =
    if (sorted.lengthCompare(k) >= 0 && !beats(x, sorted.last)) sorted
    else {
      val (pre, post) = sorted.span(s => beats(s, x))
      (pre ::: x :: post).take(k)
    }

  def zero: List[KeyedId] = Nil
  def reduce(buf: List[KeyedId], x: KeyedId): List[KeyedId] = insert(buf, x)
  def merge(a: List[KeyedId], b: List[KeyedId]): List[KeyedId] =
    b.foldLeft(a)(insert)
  def finish(buf: List[KeyedId]): Seq[KeyedId] = buf
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
