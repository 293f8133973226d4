package graft

import graft.ann.Knn
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class SimhashIvfSpec extends SparkTestBase {
  import spark.implicits._

  test("simhash: 32-bit string, identical for identical sets, close for near-dups") {
    val docs = Seq(
      (1L, Seq("big", "data", "spark", "engine", "scale", "fast")),
      (2L, Seq("fast", "scale", "engine", "spark", "data", "big")),  // same set
      (3L, Seq("big", "data", "spark", "engine", "scale", "slow")),  // 1 token swap
      (4L, Seq("entirely", "unrelated", "vocabulary", "tokens"))
    ).toDF("doc_id", "tokens")
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("tokens")).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(sigs.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    assert(sigs(1L) === sigs(2L))
    // the native kernel is bit-for-bit the HOF (executable-spec) formulation
    val hof = docs.select(col("doc_id"), Dedup.simhashHof(col("tokens")).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(hof === sigs)
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("simhashNearDups finds the near-dup pair and reports hamming") {
    val docs = Seq(
      (1L, Seq("big", "data", "spark", "engine", "scale", "fast")),
      (2L, Seq("big", "data", "spark", "engine", "scale", "fast")),
      (3L, Seq("w1", "w2", "w3", "w4", "w5", "w6", "w7"))
    ).toDF("doc_id", "tokens")
    val dups = Dedup.simhashNearDups(docs, "doc_id", "tokens")
      .as[(Long, Long, Int)].collect().toList
    assert(dups === List((1L, 2L, 0)))
  }

  test("IVF assignment puts every vector in exactly one bucket; kNN searches only it") {
    // two obvious clusters around e1 and e2
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.95f, 0.05f)),
      (50L, Array(0.0f, 1.0f)), (51L, Array(0.1f, 0.9f)), (52L, Array(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val assign = Knn.ivfAssign(emb, "vec_id", "embedding", col("vec_id") % 50 === 0)
      .as[(Long, Long)].collect().toMap
    assert(assign.size === 6)
    assert(Seq(0L, 1L, 2L).forall(assign(_) === 0L))
    assert(Seq(50L, 51L, 52L).forall(assign(_) === 50L))

    val knn = Knn.ivfKnn(emb, "vec_id", "embedding",
        col("vec_id") % 50 === 0, col("vec_id") === 1L, 5)
      .select("cand_id").as[Long].collect().toSet
    // only its own bucket: never the 5x cluster
    assert(knn === Set(0L, 2L))
  }
}
