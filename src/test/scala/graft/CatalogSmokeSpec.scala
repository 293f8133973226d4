package graft

/** Every catalog query runs end-to-end on sf0.001 and yields rows; the
  * driver's flagship entry does too. (The value-level gate is the driver's
  * DuckDB oracle at sf0.01 — scripts/check_oracles.py locally.)
  */
class CatalogSmokeSpec extends SparkTestBase {

  SparkEntry.catalog.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("every query name is unique") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
