package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnShim

/** Column wrappers over Spark's native Bloom-filter sketch expressions
  * (the machinery behind runtime row-group filtering, not exposed in the
  * public function registry). A Bloom sketch is the scale path for
  * membership prefilters: it is mergeable (partial/map-side combinable),
  * its size is FIXED by (estimatedItems, numBits) regardless of input
  * row count, and `might_contain` admits false POSITIVES only — so
  * `prefilter → exact join` returns exactly the exact-join result while
  * shrinking the join input by orders of magnitude. Use where a
  * broadcast distinct key set (e.g. q67's eval shingles) outgrows the
  * broadcast limit at 100 TB.
  */
object BloomFunctions {

  /** Aggregate an LONG hash column (use `xxhash64(x)`) into a serialized
    * Bloom filter of `numBits` bits sized for `estimatedItems` distinct
    * values (~8 bits/item ≈ 2% false-positive rate).
    */
  def bloomFilterAgg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnShim.column(new BloomFilterAggregate(ColumnShim.expression(hash),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** True iff `hash` (same `xxhash64` as at build time) may be in the
    * sketch; false means definitely absent. NULL sketch (empty build
    * side) yields NULL — rows are dropped, matching the exact join on an
    * empty build side. `might_contain` requires the sketch as a constant
    * or scalar subquery — pair with [[bloomSketch]].
    */
  def mightContain(bloom: Column, hash: Column): Column =
    ColumnShim.column(BloomFilterMightContain(ColumnShim.expression(bloom),
      ColumnShim.expression(hash)))

  /** Bloom sketch of `build`'s `hash` column as a SCALAR SUBQUERY column
    * — the shape `might_contain` demands (and the one Spark's own
    * runtime-filter injection uses): the sketch is computed once as a
    * subquery result and the probe side filters map-side against it, no
    * join in the plan at all.
    */
  def bloomSketch(build: DataFrame, hash: Column,
                  estimatedItems: Long, numBits: Long): Column = {
    val agg = build.agg(bloomFilterAgg(hash, estimatedItems, numBits).as("bf"))
    ColumnShim.column(ScalarSubquery(agg.queryExecution.analyzed))
  }
}
