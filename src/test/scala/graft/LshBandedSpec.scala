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

  test("bucket cap bounds the k² blowup of a degenerate hot bucket") {
    // 1000 docs share one token set (all land in the same bucket of
    // every band) + 4 genuinely similar docs in small buckets. Uncapped
    // this emits 1000*999/2 ≈ 500k pairs from the hot bucket alone; the
    // cap must drop the hot bucket while keeping the small ones.
    val hot = (100L until 1100L).map(i => (i, Seq("common", "boilerplate", "header")))
    val fine = Seq(
      (1L, Seq("alpha", "beta", "gamma", "delta")),
      (2L, Seq("alpha", "beta", "gamma", "delta")),
      (3L, Seq("alpha", "beta", "gamma", "epsilon")),
      (4L, Seq("zeta", "eta", "theta", "iota")))
    val skewed = (hot ++ fine).toDF("doc_id", "tokens")

    val capped = Dedup.lshBandedCandidatePairs(skewed, "doc_id", "tokens", 4, 2,
      maxBucketSize = 10).as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), "small-bucket pairs must survive the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      "hot-bucket pairs must be dropped")
    assert(capped.size < 50, s"candidate count must stay bounded, got ${capped.size}")

    // same guarantee for the minhash r=1 and simhash families
    val cappedSingle = Dedup.lshCandidatePairs(skewed, "doc_id", "tokens", 4,
      maxBucketSize = 10).as[(Long, Long)].collect().toSet
    assert(cappedSingle.contains((1L, 2L)) &&
      !cappedSingle.exists { case (a, b) => a >= 100L && b >= 100L })
    val cappedSim = Dedup.simhashNearDups(skewed, "doc_id", "tokens",
      maxBucketSize = 10).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cappedSim.contains((1L, 2L)) &&
      !cappedSim.exists { case (a, b) => a >= 100L && b >= 100L })
  }

  test("SRP banding takes the same bucket cap as the other LSH families") {
    // 200 identical vectors share every SRP band bucket (the embedding
    // analogue of boilerplate text); 2 near-identical outliers sit in
    // small buckets and must survive the cap
    val hotVec = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val hot = (100L until 300L).map(i => (i, hotVec))
    val fine = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 0.9f)))
    val emb = (hot ++ fine).toDF("vec_id", "embedding")
    val capped = graft.ann.Knn.srpNearDupPairs(emb, "vec_id", "embedding",
        dims = 8, threshold = 0.5, maxBucketSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), "small-bucket pair must survive the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      "hot-bucket pairs must be dropped")
  }
}
