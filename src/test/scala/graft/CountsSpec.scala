package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-vs-code lock-step: stale claim counts are how padding
  * accusations start. The README's query count is asserted against the
  * live catalog, and the gate discipline (every query has BOTH a
  * `queries` entry and an `oracleSql` entry) is asserted structurally
  * — a new query that forgets its oracle fails here, not in the
  * driver's round report.
  */
class CountsSpec extends AnyFunSuite {

  test("README's claimed query count matches the live catalog") {
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("README.md"))
    val claimed = """exposes (\d+) queries""".r.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.queries.size),
      s"README claims ${claimed.getOrElse("<no match>")} queries, " +
        s"catalog has ${SparkEntry.queries.size} — update the README counts block")
  }

  test("every catalog query has an oracle, and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique and follow the qNNN_name convention") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
    val bad = names.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }
}
