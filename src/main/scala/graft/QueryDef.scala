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
}
