package graft

/** The control-chart queries ship REWRITTEN recurrences (CUSUM's prefix
  * closed form, EWMA's unrolled weighted sum) so they run as windows /
  * bounded joins instead of sequential loops. These specs replay the
  * textbook sequential recurrences on the queries' own emitted inputs
  * and demand agreement — a rewrite bug cannot hide behind the oracle,
  * because the oracle mirrors the rewrite.
  */
class ControlChartSpec extends SparkTestBase {

  test("q244: prefix closed form ≡ Page's sequential CUSUM recurrence") {
    val rows = SparkEntry.queries("q244_cusum")(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      var sp = 0L
      var sn = 0L
      series.sortBy(_._2).foreach { case (_, _, zm, sPos, sNeg) =>
        sp = math.max(0L, sp + zm - 500000L)
        sn = math.max(0L, sn - zm - 500000L)
        // s_pos = exact-integer micros over an exact power-of-ten division
        assert(math.round(sPos * 1e6) === sp)
        assert(math.round(sNeg * 1e6) === sn)
      }
    }
  }

  test("q245: unrolled weighted sum ≡ sequential EWMA recurrence") {
    val rows = SparkEntry.queries("q245_ewma")(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      var ew = 0.0
      series.sortBy(_._2).foreach { case (_, _, i, z, ewma, ucl, signal) =>
        ew = 0.2 * z + 0.8 * ew // replay from the ROUNDED emitted z
        assert(math.abs(ew - ewma) < 1e-5, s"ewma drift at i=$i")
        val expectedUcl = math.sqrt(1.0 - math.pow(0.8, 2.0 * i))
        assert(math.abs(ucl - expectedUcl) < 1e-6)
        assert(signal === (math.abs(ewma) > ucl), s"signal gate at i=$i")
      }
    }
  }

  test("q244 alarms fire iff the emitted statistic clears h = 4") {
    val rows = SparkEntry.queries("q244_cusum")(spark, sf("sf0.001"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(6) === (r.getDouble(4) > 4.0))
      assert(r.getBoolean(7) === (r.getDouble(5) > 4.0))
    }
  }
}
