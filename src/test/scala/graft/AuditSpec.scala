package graft

import org.apache.spark.sql.functions._

import graft.operators.Audit

/** The audit must COUNT violations, not just flag them — magnitude is
  * what lets a gate distinguish one stray row from a broken upstream —
  * and every check family has a clean and a dirty fixture here so both
  * directions (pass with 0, fail with the exact count) are pinned.
  */
class AuditSpec extends SparkTestBase {
  import spark.implicits._

  private def child = Seq(
    (1L, Option(10L), 5.0), (2L, Option(10L), -1.0), (3L, Option(99L), 2.0),
    (4L, None, 60.0), (4L, Option(20L), 3.0)).toDF("id", "fk", "qty")
  private def parent = Seq(10L, 20L).toDF("pk")

  test("row-local checks: one aggregate, exact per-check counts") {
    val rep = Audit.rowChecks(child, "t", Seq(
        Audit.RowCheck("not_null", "fk", col("fk").isNull),
        Audit.RowCheck("in_range", "qty", col("qty") < 0 || col("qty") > 50),
        Audit.RowCheck("accepted", "id", not(col("id").isin(1L, 2L, 3L, 4L)))))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rep === Set(("not_null", "fk", 1L), ("in_range", "qty", 2L),
      ("accepted", "id", 0L)))
  }

  test("unique counts EXCESS rows (total - distinct keys), 0 when unique") {
    val dup = Audit.unique(child, "t", Seq("id")).collect()(0)
    assert(dup.getLong(3) === 1L, "id 4 appears twice -> one excess row")
    val ok = Audit.unique(child, "t", Seq("id", "fk")).collect()(0)
    assert(ok.getLong(3) === 0L, "(id, fk) is unique here")
  }

  test("refIntegrity counts non-null orphans only — null FKs are not_null's job") {
    val rep = Audit.refIntegrity(child, "fk", "t", parent, "pk").collect()(0)
    assert(rep.getLong(3) === 1L, "only fk=99 is an orphan; the null fk is not")
  }

  test("report derives pass from the count and totally orders the rows") {
    val rep = Audit.report(
      Audit.rowChecks(child, "t", Seq(
        Audit.RowCheck("not_null", "fk", col("fk").isNull))),
      Audit.unique(child, "t", Seq("id", "fk")))
    val rows = rep.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(3), r.getBoolean(4)))
    assert(rows.toSet === Set(("t", "not_null", 1L, false),
      ("t", "unique", 0L, true)))
    assert(rows.map(x => (x._1, x._2)).sameElements(
      rows.map(x => (x._1, x._2)).sorted), "report must arrive ordered")
  }

  test("an EMPTY snapshot audits as 0 violations everywhere, never NULL") {
    val empty = child.where(lit(false))
    val rows = Audit.report(
      Audit.rowChecks(empty, "t", Seq(
        Audit.RowCheck("not_null", "fk", col("fk").isNull))),
      Audit.unique(empty, "t", Seq("id")),
      Audit.refIntegrity(empty, "fk", "t", parent, "pk"))
      .collect().map(r => (r.getString(1), r.getLong(3), r.getBoolean(4)))
    assert(rows.length === 3)
    assert(rows.forall { case (_, v, p) => v == 0L && p },
      s"empty-table checks must pass with 0, got ${rows.toSeq}")
  }

  test("row-local checks stay one scan: a single Aggregate over the table") {
    val plan = Audit.rowChecks(child, "t", Seq(
      Audit.RowCheck("a", "qty", col("qty") < 0),
      Audit.RowCheck("b", "qty", col("qty") > 50),
      Audit.RowCheck("c", "fk", col("fk").isNull))).queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1,
      s"3 checks must fold into ONE aggregate, found ${aggs.size}")
  }
}
