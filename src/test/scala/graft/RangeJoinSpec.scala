package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val lefts = Seq( // (user, ts, id)
    (1L, 100L, 10L), (1L, 250L, 11L), (2L, 100L, 12L)
  ).toDF("user_id", "ts", "id")

  private val rights = Seq( // (user, ts, v)
    (1L, 1L, 1.0),    // way before id=10's window (lookback 100: (0,100])
    (1L, 50L, 2.0),   // in id=10's window
    (1L, 100L, 4.0),  // boundary: ts == left.ts counts
    (1L, 151L, 8.0),  // in id=11's window (151..250], crosses bucket boundary
    (2L, 150L, 16.0)  // after id=12 → never counted
  ).toDF("user_id", "ts", "v")

  test("trailing-window counts with exact boundary semantics across buckets") {
    val out = RangeJoin.countRecent(lefts, rights, Seq("user_id"),
        "id", "ts", "v", lookback = 100L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_recent"), Option(r.get(r.fieldIndex("sum_recent_value"))))).toMap
    assert(out(10L)._1 === 3)                       // ts 1 excluded? (0,100] → 1 IS in (0,100]
    assert(out(10L)._2 === Some(7.0))               // 1+2+4
    assert(out(11L) === (1L, Some(8.0)))            // (150,250] → 151 only
    assert(out(12L) === (0L, None))                 // right event is in the future
  }

  test("each qualifying pair is counted exactly once despite bucket cloning") {
    // right row at a bucket boundary must not double-count
    val l = Seq((1L, 200L, 1L)).toDF("user_id", "ts", "id")
    val r = Seq((1L, 200L, 5.0), (1L, 101L, 7.0)).toDF("user_id", "ts", "v")
    val out = RangeJoin.countRecent(l, r, Seq("user_id"), "id", "ts", "v", 100L)
      .collect()(0)
    assert(out.getAs[Long]("n_recent") === 2)
    assert(out.getAs[Double]("sum_recent_value") === 12.0)
  }
}
