package graft

import graft.operators.IntervalUnion

class IntervalUnionSpec extends SparkTestBase {
  import spark.implicits._

  private def iv(rows: (String, Long, Long, Long)*) =
    rows.toDF("k", "st", "en", "id")

  private def cov(df: org.apache.spark.sql.DataFrame) =
    IntervalUnion.coverage(df, "k", "st", "en", "id")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("overlapping, nested, touching and disjoint intervals merge correctly") {
    val got = cov(iv(
      ("a", 0L, 10L, 1L), ("a", 5L, 20L, 2L),   // overlap → [0,20]
      ("a", 20L, 25L, 3L),                      // touching start==end merges
      ("a", 40L, 50L, 4L), ("a", 42L, 44L, 5L), // nested
      ("a", 60L, 61L, 6L),                      // disjoint
      ("b", 0L, 1L, 7L)))
    assert(got.toSeq === Seq(("a", 3L, 36L), ("b", 1L, 1L)))
    // a: [0,25]=25 + [40,50]=10 + [60,61]=1 → 36 over 3 spans
  }

  test("same-start intervals stay in one sweep via the tie column") {
    val got = cov(iv(("a", 0L, 5L, 1L), ("a", 0L, 9L, 2L)))
    assert(got.toSeq === Seq(("a", 1L, 9L)))
  }

  test("merged spans expose boundaries") {
    val spans = IntervalUnion.mergedSpans(
      iv(("a", 0L, 10L, 1L), ("a", 30L, 40L, 2L)), "k", "st", "en", "id")
      .orderBy("span_start").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(spans.toSeq === Seq((0L, 10L), (30L, 40L)))
  }
}
