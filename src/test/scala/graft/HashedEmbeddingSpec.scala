package graft

import graft.ann.Knn
import graft.text.HashedEmbedding
import org.apache.spark.sql.functions._

/** Feature-hashing embeddings: fixed dimensionality, collision-additive,
  * zero-filled, and directly consumable by the ANN machinery.
  */
class HashedEmbeddingSpec extends SparkTestBase {
  import spark.implicits._

  private val weights = Seq(
    (1L, "alpha", 2.0), (1L, "beta", 3.0),
    (2L, "alpha", 2.0), (2L, "beta", 3.0),  // identical doc
    (3L, "gamma", 7.0)
  ).toDF("doc_id", "token", "weight")

  test("dense d-dim vectors: component = sum of the dim's token weights, rest 0") {
    val d = 13
    val vecs = HashedEmbedding.embed(weights, "doc_id", d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.values.forall(_.length == d), "every vector must have d dims")
    assert(vecs(1L) === vecs(2L), "identical weight rows must embed identically")
    // total mass is preserved: components sum to the weight sum
    assert(math.abs(vecs(1L).map(_.toDouble).sum - 5.0) < 1e-6)
    assert(math.abs(vecs(3L).map(_.toDouble).sum - 7.0) < 1e-6)
    assert(vecs(3L).count(_ != 0.0f) === 1, "single token lands in exactly one dim")
  }

  test("colliding tokens add into the same component") {
    // force a collision: same token twice (different rows) must sum
    val w = Seq((9L, "tok", 1.5), (9L, "tok", 2.5)).toDF("doc_id", "token", "weight")
    val vec = HashedEmbedding.embed(w, "doc_id", 13)
      .collect()(0).getSeq[Float](1)
    assert(math.abs(vec.map(_.toDouble).sum - 4.0) < 1e-6)
    assert(vec.count(_ != 0.0f) === 1)
  }

  test("hashed embeddings feed straight into cosine kNN") {
    val emb = HashedEmbedding.embed(weights, "doc_id", 13)
      .withColumnRenamed("vec", "embedding")
    val knn = Knn.cosineKnn(emb, "doc_id", "embedding", col("doc_id") === 1L, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(knn.head === ((1, 2L, 1.0)), "the identical doc must rank first at cosine 1")
  }
}
