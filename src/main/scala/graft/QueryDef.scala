package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One harness-visible query: a Spark pipeline plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Oracle-parity conventions (so value hashes match bit-for-bit):
  *  - Money/2-decimal aggregates are summed in SCALED INTEGER space
  *    (`cents`) and divided back at the end — integer sums are exact in
  *    any order, and the final long/double division is a single exact
  *    IEEE op on both engines.
  *  - int/int (and long/int) divisions (TF, ratios, Jaccard) are single
  *    exact IEEE divisions → bit-identical, no rounding needed.
  *  - Only genuinely order-dependent float reductions (norms, cosines)
  *    are rounded (6 decimals).
  *  - Every aggregate/computed column is aliased identically in Spark
  *    and SQL; every query has a total ORDER BY; integer widths match
  *    (Spark int ↔ CAST(... AS INTEGER), Spark long ↔ BIGINT).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  /** Exact scaled-integer representation of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** DuckDB CTE chain computing connected-component minimum labels to
    * the true fixpoint, mirroring `Dedup.nearDupClustersConverged`'s
    * algorithm: each round is one hash-min step (take the min of a
    * node's label and its neighbors' labels) followed by one pointer
    * jump (`label ← label(label)`), so the distance covered doubles per
    * round — coverage after k rounds is 2^(k+1) − 2 hops. Expects CTEs
    * `edges(src, dst)` (symmetric) and `l0(id, label)` (label = own id)
    * upstream; the final labels are in `l<rounds>`. The default 15
    * rounds covers components of diameter 65534 — beyond any component
    * our corpora can contain, so the unroll IS the fixpoint and matches
    * the converged Spark result at every scale factor. Every CTE is
    * MATERIALIZED: each round references the previous one twice, and
    * DuckDB's default inlining would expand the chain exponentially
    * (2^rounds scans of the base tables — it exhausts file handles
    * before it exhausts patience).
    */
  def ccFixpointCtes(rounds: Int = 15, prefix: String = ""): String =
    (1 to rounds).map { i =>
      s"""${prefix}h$i AS MATERIALIZED (
             SELECT l.id, LEAST(l.label, COALESCE(MIN(n.label), l.label)) AS label
             FROM ${prefix}l${i - 1} l LEFT JOIN ${prefix}edges e ON e.src = l.id
                              LEFT JOIN ${prefix}l${i - 1} n ON n.id = e.dst
             GROUP BY l.id, l.label),
      ${prefix}l$i AS MATERIALIZED (
             SELECT h.id, LEAST(h.label, COALESCE(p.label, h.label)) AS label
             FROM ${prefix}h$i h LEFT JOIN ${prefix}h$i p ON p.id = h.label)"""
    }.mkString(",\n      ")

  /** Name of the final CTE emitted by [[ccFixpointCtes]]. A second
    * chain in one query (e.g. q277's before/after-deletion CCs) uses a
    * distinct `prefix` for its `edges`/`l0` inputs and every round CTE.
    */
  def ccFinal(rounds: Int = 15, prefix: String = ""): String =
    s"${prefix}l$rounds"
}
