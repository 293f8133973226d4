package graft

import graft.operators.VersionedState
import org.apache.spark.sql.functions._

/** Direct contract tests for the shared commit protocol (SketchState /
  * IvfIndex / PqIndex / IvfPqIndex specs cover it end-to-end; these pin
  * the primitive's own edges: marker labels round-trip, GC keeps the
  * requested tail, and the single-writer assumption is SURFACED by the
  * create-exclusive marker, never silently merged).
  */
class VersionedStateSpec extends SparkTestBase {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vs_$tag").toString + "/st"

  private def commitOne(dir: String, prev: Option[Long], label: String,
                        gcBelow: Long = Long.MinValue): Long =
    VersionedState.commit(spark, dir, prev, label, gcBelow) { vdir =>
      spark.range(3).write.mode("overwrite").parquet(vdir)
    }

  test("labels round-trip through the commit markers in version order") {
    val dir = freshDir("labels")
    commitOne(dir, None, "base")
    commitOne(dir, Some(1L), "delta")
    commitOne(dir, Some(2L), "delta")
    assert(VersionedState.committed(spark, dir) ===
      Seq((1L, "base"), (2L, "delta"), (3L, "delta")))
    assert(VersionedState.currentVersion(spark, dir) === Some(3L))
  }

  test("a second writer is surfaced by the marker create, not silently merged") {
    val dir = freshDir("writers")
    commitOne(dir, None, "base")
    // writer B commits version 2 while writer A still believes prev = 1
    commitOne(dir, Some(1L), "delta")
    // writer A's attempt at version 2 must FAIL at the commit point —
    // its payload write is to the same (already committed) v2, and the
    // marker's create-exclusive refuses to clobber
    val e = intercept[Exception] { commitOne(dir, Some(1L), "delta") }
    assert(e.isInstanceOf[java.io.IOException]
        || e.getMessage.toLowerCase.contains("exist"),
      s"expected the marker create to refuse, got: $e")
    // and the committed history is writer B's, intact
    assert(VersionedState.committed(spark, dir).map(_._1) === Seq(1L, 2L))
  }

  test("gcBelow deletes exactly the requested tail — markers and payloads") {
    val dir = freshDir("gc")
    commitOne(dir, None, "base")
    commitOne(dir, Some(1L), "delta")
    commitOne(dir, Some(2L), "delta", gcBelow = 2L) // delete v1 only
    assert(VersionedState.committed(spark, dir).map(_._1) === Seq(2L, 3L))
    assert(!new java.io.File(VersionedState.versionPath(dir, 1L)).exists,
      "GC'd payload must be gone from disk")
    // the survivors still read
    assert(spark.read.parquet(VersionedState.versionPath(dir, 3L)).count() === 3L)
  }

  test("a crashed attempt's leftover payload is cleared by the retry") {
    val dir = freshDir("retry")
    commitOne(dir, None, "base")
    // simulate: writer died mid-payload for v2 (no marker)
    val torn = new java.io.File(VersionedState.versionPath(dir, 2L))
    assert(torn.mkdirs())
    java.nio.file.Files.writeString(torn.toPath.resolve("junk"), "torn")
    assert(VersionedState.currentVersion(spark, dir) === Some(1L))
    commitOne(dir, Some(1L), "delta") // retry overwrites the torn v2
    assert(VersionedState.committed(spark, dir).map(_._1) === Seq(1L, 2L))
    assert(!new java.io.File(torn, "junk").exists,
      "the torn leftover must not survive inside the committed version")
    assert(spark.read.parquet(VersionedState.versionPath(dir, 2L)).count() === 3L)
  }
}
