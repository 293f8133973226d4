package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  // (key, ts, seq, op, value)
  private def log(rows: (String, Long, Long, String, Double)*) =
    rows.toDF("k", "ts", "seq", "op", "v")

  test("latest upsert wins per key; tombstoned keys vanish") {
    val got = Compaction.latest(
      log(("a", 1L, 1L, "upsert", 10.0), ("a", 3L, 2L, "upsert", 30.0),
        ("a", 2L, 3L, "upsert", 20.0),
        ("b", 1L, 4L, "upsert", 1.0), ("b", 5L, 5L, "delete", 0.0),
        ("c", 9L, 6L, "delete", 0.0), ("c", 4L, 7L, "upsert", 4.0)),
      keyCols = Seq("k"), tsCol = "ts", tieCols = Seq("seq"),
      payloadCols = Seq("op", "v"), deletePred = col("op") === "delete")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq(("a", 30.0, 3L)))
  }

  test("equal timestamps resolve by the tie column — total order, idempotent") {
    val feed = log(("a", 7L, 1L, "upsert", 1.0), ("a", 7L, 2L, "upsert", 2.0))
    val once = Compaction.latest(feed, Seq("k"), "ts", Seq("seq"),
      Seq("v"), lit(false)).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(once.toSeq === Seq(("a", 2.0)))
    // replaying the feed twice (at-least-once delivery) changes nothing
    val twice = Compaction.latest(feed.union(feed), Seq("k"), "ts", Seq("seq"),
      Seq("v"), lit(false)).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(twice.toSeq === once.toSeq)
  }

  test("a delete followed by a later re-insert resurrects the key") {
    val got = Compaction.latest(
      log(("a", 1L, 1L, "upsert", 1.0), ("a", 2L, 2L, "delete", 0.0),
        ("a", 3L, 3L, "upsert", 3.0)),
      Seq("k"), "ts", Seq("seq"), Seq("v"), col("op") === "delete")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 3.0, 3L)))
  }

  test("empty key or payload lists are refused") {
    intercept[IllegalArgumentException] {
      Compaction.latest(log(), Seq.empty, "ts", Seq("seq"), Seq("v"), lit(false))
    }
    intercept[IllegalArgumentException] {
      Compaction.latest(log(), Seq("k"), "ts", Seq("seq"), Seq.empty, lit(false))
    }
  }
}
