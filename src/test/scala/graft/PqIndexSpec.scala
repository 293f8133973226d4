package graft

import graft.ann.{Pq, PqIndex}
import graft.operators.VersionedState
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The durable PQ code table's maintenance contract across a restart —
  * IvfIndexSpec's sibling (the torn-commit mechanics are shared
  * VersionedState machinery and proven there; here the PQ-specific
  * semantics: frozen-codebook encode equivalence, m recovered from the
  * stored codebooks, rebuild GC, replay duplication).
  */
class PqIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(ids: Range): DataFrame =
    ids.map { i =>
      val v = Array.tabulate(8)(d =>
        (((i % 4) * 13 + d * 5 + i % 7).toFloat % 9f) - 3f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pq_$tag").toString + "/idx"

  test("refresh from disk ≡ one-shot encoding; codebooks frozen; m recovered") {
    val dir = freshDir("restart")
    PqIndex.build(vecs(0 until 40), "vec_id", "embedding", m = 2,
      seedPred = col("vec_id") < 4, iters = 2, stateDir = dir)
    val cbBefore = PqIndex.codebooks(spark, dir).get
      .as[(Int, Long, Seq[Float])].collect().toSet

    // "new driver": refresh never receives m — it must come from disk
    PqIndex.refresh(vecs(40 until 50), "vec_id", "embedding", dir)

    assert(PqIndex.codebooks(spark, dir).get
      .as[(Int, Long, Seq[Float])].collect().toSet === cbBefore,
      "refresh must not move codebooks")
    val maintained = PqIndex.codes(spark, dir).get
      .select("id", "sub", "code").as[(Long, Int, Long)].collect().toSet
    val oneShot = Pq.assign(
        Pq.subvectors(vecs(0 until 50), "vec_id", "embedding", 2),
        PqIndex.codebooks(spark, dir).get)
      .select("id", "sub", "code").as[(Long, Int, Long)].collect().toSet
    assert(maintained === oneShot,
      "union of segments must equal encoding everything at once (drift ≡ 0)")
  }

  test("rebuild supersedes: old segments die with their codebook basis") {
    val dir = freshDir("rebuild")
    PqIndex.build(vecs(0 until 30), "vec_id", "embedding", 2,
      col("vec_id") < 4, 1, dir)
    PqIndex.refresh(vecs(30 until 40), "vec_id", "embedding", dir)
    PqIndex.build(vecs(0 until 40), "vec_id", "embedding", 2,
      col("vec_id") < 4, 2, dir)
    val codes = PqIndex.codes(spark, dir).get
    assert(codes.count() === 80L, "one row per (vector, subspace) after a rebuild")
    assert(VersionedState.committed(spark, dir).map(_._2) === Seq("base"))
  }

  test("replaying a delta duplicates its rows — the documented non-idempotence") {
    val dir = freshDir("replay")
    PqIndex.build(vecs(0 until 20), "vec_id", "embedding", 2,
      col("vec_id") < 4, 1, dir)
    PqIndex.refresh(vecs(20 until 25), "vec_id", "embedding", dir)
    PqIndex.refresh(vecs(20 until 25), "vec_id", "embedding", dir)
    assert(PqIndex.codes(spark, dir).get.where(col("id") >= 20).count() === 20L,
      "segment append is additive; exactly-once delivery is the caller's job")
  }

  test("an EMPTY delta refresh commits harmlessly (the quiet-ingest-window case)") {
    val dir = freshDir("emptydelta")
    PqIndex.build(vecs(0 until 20), "vec_id", "embedding", 2,
      col("vec_id") < 4, 1, dir)
    val before = PqIndex.codes(spark, dir).get
      .select("id", "sub", "code").as[(Long, Int, Long)].collect().toSet
    PqIndex.refresh(vecs(20 until 20), "vec_id", "embedding", dir)
    assert(PqIndex.codes(spark, dir).get
      .select("id", "sub", "code").as[(Long, Int, Long)].collect().toSet === before,
      "an empty segment must not disturb the code table")
    assert(VersionedState.committed(spark, dir).map(_._2) === Seq("base", "delta"))
  }

  test("refresh before any build is refused") {
    val e = intercept[IllegalArgumentException] {
      PqIndex.refresh(vecs(0 until 5), "vec_id", "embedding",
        freshDir("norefresh"))
    }
    assert(e.getMessage.contains("build"))
  }
}
