package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the manual dial for the cases AQE's
  * skew-join handling does not cover.
  *
  * Spark's AQE already splits skewed partitions of sort-merge and
  * shuffled-hash JOINS at runtime, and map-side partial aggregation
  * absorbs skew for combinable aggregates. What remains exposed at
  * 100 TB is (a) joins that AQE cannot re-split (e.g. when the skewed
  * side must stay co-partitioned with a downstream op) and (b) per-key
  * aggregations whose state is NOT map-side combinable into bounded
  * size (collect_list/collect_set: one hot key = one giant task). Both
  * get the same medicine: spread each hot key over `nSalts` sub-keys,
  * pay the work in parallel, merge.
  *
  * The salt is `pmod(xxhash64(<whole row>), nSalts)` — deterministic
  * (stable under task retry, unlike rand or monotonically_increasing_id)
  * and value-derived, so identical rows of a hot key still spread when
  * they differ in any column.
  */
object SaltedJoin {

  private def salt(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(nSalts))

  /** Inner equi-join with a salted left (skewed/fact) side: the right
    * side is replicated `nSalts`× (explode of a literal range — cheap
    * when the right side is the smaller one) and the join key becomes
    * (key, salt), so one hot key's rows land on `nSalts` reducers
    * instead of one. Result is identical to `left.join(right, key)`;
    * multiplicity is preserved because every left row carries exactly
    * one salt and meets exactly one replica of each matching right row.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be positive, got $nSalts")
    val taken = (left.columns ++ right.columns).toSet
    require(!taken.contains("_salt") && !taken.contains("_rkey"),
      "saltedEquiJoin reserves column names _salt and _rkey; rename the input columns")
    val l = left.withColumn("_salt", salt(left, nSalts))
    // Build the condition from the RENAMED right frame's own columns: a
    // reference into the pre-rename `right` only resolves via exprId
    // preservation, and trips Spark's ambiguous-self-join detection when
    // both sides derive from the same base plan (the realistic skew
    // self-join case).
    val r = right.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
      .withColumnRenamed(key, "_rkey")
    l.join(r, l("_salt") === r("_salt") && l(key) === r("_rkey"))
      .drop("_salt", "_rkey")
  }

  /** Two-phase salted `collect_set`: partials per (key, salt) bound any
    * single task's state to roughly 1/nSalts of a hot key's distinct
    * values; the final phase merges nSalts small arrays per key. Output
    * is sorted for determinism. Result is identical to the direct
    * `collect_set` (up to the explicit sort).
    */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
                       nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be positive, got $nSalts")
    require(!df.columns.contains("_salt") && !df.columns.contains("_partial"),
      "saltedCollectSet reserves column names _salt and _partial; rename the input columns")
    df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_partial")))))
        .as(s"${valueCol}_set"))
  }
}
