package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectations-style data-quality audit — the validation pass a
  * pipeline runs before it lets a snapshot near training: every check
  * reports a VIOLATION COUNT (not a boolean that hides magnitude), and
  * the report is one relation a gate can join, alert on, or diff
  * across snapshots.
  *
  * Scale shape is the whole design:
  *  - Every ROW-LOCAL expectation on a table (null, range, accepted
  *    set, arbitrary predicate) compiles into ONE aggregate over ONE
  *    scan — a conditional-sum per check, unpivoted to report rows
  *    after the aggregation, when the data is already 1×checks. Ten
  *    checks on a 100 TB table cost the same scan as one.
  *  - [[unique]] is a key-grouped count (partial-aggregating; the
  *    excess-row count Σ(cnt−1) equals COUNT(*) − COUNT(DISTINCT key)
  *    without a distinct's expand).
  *  - [[refIntegrity]] is a left-anti equi-join counting orphans —
  *    broadcast when the parent is dimension-sized, shuffle otherwise;
  *    Catalyst picks.
  * Nothing is collected; the report is its own (tiny) DataFrame.
  */
object Audit {

  /** One row-local expectation: `violated` must be a boolean Column
    * over the table's columns, true on each BAD row.
    */
  final case class RowCheck(check: String, column: String, violated: Column)

  private val schema = Seq("tbl", "chk", "col_name", "violations")

  /** All row-local checks on `df` in one aggregate over one scan. */
  def rowChecks(df: DataFrame, table: String, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    // coalesce: a global SUM over an EMPTY table is NULL, and an empty
    // snapshot must audit as 0 violations (pass), not NULL (unknown)
    val sums = checks.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(c.violated, 1).otherwise(0)), lit(0))
        .cast("long").as(s"_v$i")
    }
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(table).as("tbl"), lit(c.check).as("chk"),
        lit(c.column).as("col_name"), col(s"_v$i").as("violations"))
    }
    df.agg(sums.head, sums.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select(schema.map(n => col(s"e.$n")): _*)
  }

  /** Excess rows beyond one per `cols` key: Σ(cnt − 1) over the
    * grouped counts = COUNT(*) − COUNT(DISTINCT key), 0 when unique.
    */
  def unique(df: DataFrame, table: String, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_cnt"))
      .agg(coalesce(sum(col("_cnt") - 1), lit(0)).cast("long").as("violations"))
      .select(lit(table).as("tbl"), lit("unique").as("chk"),
        lit(cols.mkString(",")).as("col_name"), col("violations"))

  /** Orphan child rows: non-null `childCol` values absent from
    * `parentCol` (null keys are a [[RowCheck]] concern, not an FK one).
    */
  def refIntegrity(child: DataFrame, childCol: String, table: String,
                   parent: DataFrame, parentCol: String): DataFrame =
    child.where(col(childCol).isNotNull).select(col(childCol))
      .join(parent.select(col(parentCol).as(childCol)), Seq(childCol), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(table).as("tbl"), lit("ref_integrity").as("chk"),
        lit(childCol).as("col_name"), col("violations"))

  /** Stack the parts into the final report with the derived `pass`. */
  def report(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "report needs at least one part")
    parts.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("tbl", "chk", "col_name")
  }
}
