package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class LshBandedSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("big", "data", "spark", "engine", "scale", "fast")),
    (2L, Seq("big", "data", "spark", "engine", "scale", "fast")),   // identical
    (3L, Seq("big", "data", "spark", "engine", "scale", "slow")),   // near dup
    (4L, Seq("all", "new", "vocabulary", "entirely", "different", "words"))
  ).toDF("doc_id", "tokens")

  test("banded LSH: identical docs always collide; disjoint docs never do") {
    val pairs = Dedup.lshBandedCandidatePairs(docs, "doc_id", "tokens", 4, 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))   // identical sets share every band
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("banded (r=2) is a subset of single-hash (r=1) candidates — the precision dial") {
    val banded = Dedup.lshBandedCandidatePairs(docs, "doc_id", "tokens", 4, 2)
      .as[(Long, Long)].collect().toSet
    val single = Dedup.lshCandidatePairs(docs, "doc_id", "tokens", 8)
      .as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(single))
  }
}
