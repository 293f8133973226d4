package graft

import graft.ann.IvfIndex
import graft.operators.VersionedState
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The durable IVF index's maintenance contract across a RESTART: the
  * versioned state directory — not driver memory — carries the index
  * between runs. A build commits a base; a refresh from a DIFFERENT
  * "driver" (fresh DataFrames, state read off disk) appends a delta
  * segment; the union must equal routing everything through the same
  * frozen centroids in one shot. Crash-safety mirrors SketchStateSpec:
  * a torn version is invisible and recovered over.
  */
class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(ids: Range): DataFrame =
    ids.map { i =>
      // deterministic spread: 8 dims, three rough directions by i % 3
      val base = Array.tabulate(8)(d =>
        (((i % 3) * 17 + d * 7 + i % 5).toFloat % 11f) + 1f)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ivf_$tag").toString + "/idx"

  test("refresh from disk ≡ one-shot routing; centroids frozen across versions") {
    val dir = freshDir("restart")
    val hist = vecs(0 until 40)
    val delta = vecs(40 until 55)
    IvfIndex.build(hist, "vec_id", "embedding",
      col("vec_id") % 10 === 0, iters = 2, dir)
    val centsBefore = IvfIndex.centroids(spark, dir).get
      .as[(Long, Seq[Float])].collect().toMap

    // "new driver": nothing in memory survives; refresh reads disk
    IvfIndex.refresh(delta, "vec_id", "embedding", dir)

    val centsAfter = IvfIndex.centroids(spark, dir).get
      .as[(Long, Seq[Float])].collect().toMap
    assert(centsAfter === centsBefore, "refresh must not move centroids")

    val maintained = IvfIndex.assignments(spark, dir).get
      .select("id", "centroid_id").as[(Long, Long)].collect().toMap
    val oneShot = IvfIndex.assignTo(vecs(0 until 55), "vec_id", "embedding",
        IvfIndex.centroids(spark, dir).get)
      .select("id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(maintained === oneShot,
      "union of segments must equal routing everything at once (drift ≡ 0)")
  }

  test("rebuild supersedes: old segments die with their centroid basis") {
    val dir = freshDir("rebuild")
    IvfIndex.build(vecs(0 until 30), "vec_id", "embedding",
      col("vec_id") % 10 === 0, iters = 1, dir)
    IvfIndex.refresh(vecs(30 until 40), "vec_id", "embedding", dir)
    // periodic retrain over everything: a NEW base
    IvfIndex.build(vecs(0 until 40), "vec_id", "embedding",
      col("vec_id") % 10 === 0, iters = 2, dir)
    val asg = IvfIndex.assignments(spark, dir).get
    assert(asg.count() === 40L, "exactly one row per vector after a rebuild")
    assert(asg.select("id").distinct().count() === 40L)
    // prior versions are GC'd: only the new base lives on disk
    assert(VersionedState.committed(spark, dir).map(_._2) === Seq("base"))
  }

  test("kill mid-commit: a torn refresh is invisible and recovered over") {
    val dir = freshDir("crash")
    IvfIndex.build(vecs(0 until 30), "vec_id", "embedding",
      col("vec_id") % 10 === 0, iters = 1, dir)
    val before = IvfIndex.assignments(spark, dir).get.count()
    // simulate a refresh dying after writing payload but before marker
    val torn = new java.io.File(VersionedState.versionPath(dir, 2L))
    assert(new java.io.File(torn, "segment").mkdirs())
    java.nio.file.Files.writeString(
      torn.toPath.resolve("segment/part-00000.parquet"), "torn")
    assert(IvfIndex.assignments(spark, dir).get.count() === before,
      "the torn version must be invisible to readers")
    IvfIndex.refresh(vecs(30 until 35), "vec_id", "embedding", dir)
    assert(IvfIndex.assignments(spark, dir).get.count() === before + 5,
      "the next refresh must overwrite the torn attempt and commit")
  }

  test("replaying a delta duplicates its rows — the documented non-idempotence") {
    val dir = freshDir("replay")
    IvfIndex.build(vecs(0 until 20), "vec_id", "embedding",
      col("vec_id") % 10 === 0, iters = 1, dir)
    IvfIndex.refresh(vecs(20 until 25), "vec_id", "embedding", dir)
    IvfIndex.refresh(vecs(20 until 25), "vec_id", "embedding", dir) // replay
    val n = IvfIndex.assignments(spark, dir).get
      .where(col("id") >= 20).count()
    assert(n === 10L,
      "segment append is additive; exactly-once delivery is the caller's job")
  }

  test("an EMPTY delta refresh commits harmlessly (the quiet-ingest-window case)") {
    val dir = freshDir("emptydelta")
    IvfIndex.build(vecs(0 until 20), "vec_id", "embedding",
      col("vec_id") % 10 === 0, iters = 1, dir)
    val before = IvfIndex.assignments(spark, dir).get
      .select("id", "centroid_id").as[(Long, Long)].collect().toSet
    IvfIndex.refresh(vecs(20 until 20), "vec_id", "embedding", dir)
    assert(IvfIndex.assignments(spark, dir).get
      .select("id", "centroid_id").as[(Long, Long)].collect().toSet === before,
      "an empty segment must not disturb the index")
    assert(VersionedState.committed(spark, dir).map(_._2) === Seq("base", "delta"),
      "the empty refresh still commits (maintenance cadence stays observable)")
  }

  test("refresh before any build is refused") {
    val dir = freshDir("norefresh")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.refresh(vecs(0 until 5), "vec_id", "embedding", dir)
    }
    assert(e.getMessage.contains("build"))
  }
}
