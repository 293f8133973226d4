package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val quotes = Seq( // (sym, ts, quote_id, price)
    ("A", 10L, 1L, 1.0), ("A", 20L, 2L, 2.0), ("A", 20L, 3L, 3.0),
    ("B", 15L, 4L, 4.0)
  ).toDF("sym", "ts", "quote_id", "price")

  private val trades = Seq( // (sym, ts, trade_id)
    ("A", 5L, 100L),   // before any quote → no match
    ("A", 20L, 101L),  // ties with quotes 2,3 → latest tie (3) wins
    ("A", 99L, 102L),  // latest quote overall
    ("B", 15L, 103L),  // exact-timestamp match
    ("C", 50L, 104L)   // key with no quotes at all
  ).toDF("sym", "ts", "trade_id")

  test("as-of join picks the latest right row at-or-before each left timestamp") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "quote_id",
        Seq("quote_id", "price"))
      .select("trade_id", "asof_quote_id", "asof_price")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out.size === 5)
    assert(out(100L) === (None, None))
    assert(out(101L) === (Some(3L), Some(3.0)))  // same-ts quotes: max tie wins
    assert(out(102L) === (Some(3L), Some(3.0)))
    assert(out(103L) === (Some(4L), Some(4.0)))  // right row AT left ts matches
    assert(out(104L) === (None, None))
  }

  test("maxStaleness nulls matches older than the bound; fresh matches keep") {
    // the latest at-or-before row is unique, so "latest within the
    // window" ≡ "latest overall, nulled if stale" — the cheap form
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "quote_id",
        Seq("quote_id"), maxStaleness = Some(org.apache.spark.sql.functions.lit(3L)))
      .select("trade_id", "asof_quote_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    val unbounded = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "quote_id",
        Seq("quote_id"))
      .select("trade_id", "asof_quote_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(103L) === unbounded(103L), "an exact-ts match is never stale")
    assert(out.forall { case (id, m) => m.isEmpty || m === unbounded(id) },
      "tolerance may only REMOVE matches, never change them")
    assert(out.values.flatten.size < unbounded.values.flatten.size,
      "a tight bound must null out at least one stale match")
  }

  test("left columns survive untouched; one row out per left row") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "quote_id", Seq("price"))
    assert(out.count() === trades.count())
    assert(out.columns.toSet === Set("sym", "ts", "trade_id", "asof_price"))
  }
}
