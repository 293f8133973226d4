package graft

import graft.er.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val lastToken = (c: org.apache.spark.sql.Column) =>
    element_at(split(c, " "), -1)

  test("best match per probe with tie-break on catalog id") {
    val probes = Seq((1L, "cold widget"), (2L, "tiny gear")).toDF("id", "name")
    val cat = Seq(
      (10L, "bold widget"),  // dist 1 from "cold widget"
      (11L, "gold widget"),  // dist 1 — same dist, higher id loses
      (12L, "small widget"), // dist 4 — over maxDist 2
      (20L, "huge bolt")     // different block
    ).toDF("id", "name")
    val got = FuzzyJoin.bestMatch(probes, cat, "id", "name", lastToken, maxDist = 2)
      .orderBy("probe_id").collect()
    assert(got.length === 2)
    val r1 = got(0)
    assert((r1.getLong(0), r1.getLong(3), r1.getInt(5)) === (1L, 10L, 1))
    assert(r1.getLong(2) === 3L) // 10, 11, 12 all reach the band (len 12 vs 11)
    val r2 = got(1)
    assert(r2.getLong(0) === 2L && r2.isNullAt(3) && r2.getLong(2) === 0L)
  }

  test("length band is a correct prefilter: |len diff| > maxDist never scores") {
    val probes = Seq((1L, "ab")).toDF("id", "name")
    val cat = Seq((10L, "abxyz"), (11L, "abc")).toDF("id", "name")
    // block everything together to isolate the band
    val got = FuzzyJoin.bestMatch(probes, cat, "id", "name", _ => lit("one"),
        maxDist = 1).collect().head
    assert(got.getLong(2) === 1L)   // only "abc" (len 3) is within band of "ab"
    assert(got.getLong(3) === 11L && got.getInt(5) === 1)
  }

  test("exact duplicates match at distance 0") {
    val probes = Seq((1L, "same name")).toDF("id", "name")
    val cat = Seq((10L, "same name")).toDF("id", "name")
    val got = FuzzyJoin.bestMatch(probes, cat, "id", "name", lastToken,
      maxDist = 3).collect().head
    assert(got.getLong(3) === 10L && got.getInt(5) === 0)
  }

  test("oversized catalog blocks are skipped by the skew cap") {
    val probes = Seq((1L, "aa zz")).toDF("id", "name")
    val cat = (10L to 14L).map(i => (i, s"a$i zz")).toDF("id", "name")
    val capped = FuzzyJoin.bestMatch(probes, cat, "id", "name", lastToken,
      maxDist = 3, maxBlockSize = 4L).collect().head
    assert(capped.isNullAt(3) && capped.getLong(2) === 0L)
    val uncapped = FuzzyJoin.bestMatch(probes, cat, "id", "name", lastToken,
      maxDist = 3, maxBlockSize = 5L).collect().head
    assert(!uncapped.isNullAt(3))
  }
}
