package graft

import graft.dedup.{ClusterState, Dedup}
import graft.operators.VersionedState
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained cluster-label state's contract: refresh on the
  * reduced (label-contracted) graph must reproduce a from-scratch
  * converged CC over the union — including the non-local case where
  * one new bridge doc merges two old clusters and every member of the
  * larger one relabels (the remap, not a rewrite). q276 gates the
  * same identity against the DuckDB fixpoint; here the restart /
  * replay / compact / bridge semantics the oracle can't see.
  */
class ClusterStateSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cs_$tag").toString + "/st"

  private def idsDf(ids: Seq[Long]): DataFrame = ids.toDF("id")
  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b")

  private def labelMap(dir: String): Map[Long, Long] =
    ClusterState.labels(spark, dir).get
      .as[(Long, Long)].collect().toMap

  private def fullCc(ids: Seq[Long], ps: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.nearDupClustersConverged(idsDf(ids), "id", pairsDf(ps))._1
      .select(col("id"), col("cluster_id"))
      .as[(Long, Long)].collect().toMap

  test("a bridge doc merges two OLD clusters: remap relabels, ≡ from-scratch CC") {
    val dir = freshDir("bridge")
    // history: clusters {1,2,3} (min 1) and {10,11} (min 10), loner 20
    val histIds = Seq(1L, 2L, 3L, 10L, 11L, 20L)
    val histPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    ClusterState.build(idsDf(histIds), "id", pairsDf(histPairs), dir)
    assert(labelMap(dir) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    // delta: doc 30 bridges 3 and 11 — the {10,11} cluster must
    // relabel to 1 WITHOUT touching history rows (remap only)
    ClusterState.refresh(idsDf(Seq(30L, 31L)), "id",
      pairsDf(Seq((30L, 3L), (30L, 11L))), dir, "b1")
    val got = labelMap(dir)
    assert(got === fullCc(histIds ++ Seq(30L, 31L),
      histPairs ++ Seq((30L, 3L), (30L, 11L))),
      "maintained labels must equal from-scratch CC on the union")
    assert(got(11L) === 1L, "old cluster {10,11} must relabel through the remap")
    assert(got(31L) === 31L, "an isolated new doc labels itself")
    // the remap table is DELTA-sized: one row (10 → 1)
    val v = VersionedState.currentVersion(spark, dir).get
    assert(spark.read.parquet(
        s"${VersionedState.versionPath(dir, v)}/remap")
      .as[(Long, Long)].collect().toSet === Set((10L, 1L)),
      "only the touched old cluster appears in the remap")
  }

  test("chained merges across THREE batches resolve through the remap chain") {
    val dir = freshDir("chain")
    ClusterState.build(idsDf(Seq(5L, 6L, 8L, 9L)), "id",
      pairsDf(Seq((5L, 6L), (8L, 9L))), dir)
    // batch 1: 40 joins {8,9} → cluster 8 stays 8
    ClusterState.refresh(idsDf(Seq(40L)), "id", pairsDf(Seq((40L, 9L))),
      dir, "b1")
    // batch 2: 41 bridges the two clusters → everything relabels to 5
    ClusterState.refresh(idsDf(Seq(41L)), "id",
      pairsDf(Seq((41L, 6L), (41L, 40L))), dir, "b2")
    val got = labelMap(dir)
    val want = fullCc(Seq(5L, 6L, 8L, 9L, 40L, 41L),
      Seq((5L, 6L), (8L, 9L), (40L, 9L), (41L, 6L), (41L, 40L)))
    assert(got === want)
    assert(got.values.toSet === Set(5L), "one component, min id 5")
  }

  test("restart: a new 'driver' refreshes from disk; replayed delta id is a no-op") {
    val dir = freshDir("restart")
    ClusterState.build(idsDf(Seq(1L, 2L)), "id", pairsDf(Seq((1L, 2L))), dir)
    val v1 = ClusterState.refresh(idsDf(Seq(7L)), "id",
      pairsDf(Seq((7L, 2L))), dir, "b1")
    assert(ClusterState.refresh(idsDf(Seq(7L)), "id",
      pairsDf(Seq((7L, 2L))), dir, "b1") === v1,
      "a replayed delta id returns the existing version")
    assert(labelMap(dir) === Map(1L -> 1L, 2L -> 1L, 7L -> 1L))
    assert(VersionedState.committed(spark, dir).map(_._2) ===
      Seq("base", "delta:b1"))
  }

  test("compact folds the remap chain into one base-compact, value-exact") {
    val dir = freshDir("compact")
    ClusterState.build(idsDf(Seq(1L, 2L, 10L, 11L)), "id",
      pairsDf(Seq((1L, 2L), (10L, 11L))), dir)
    ClusterState.refresh(idsDf(Seq(30L)), "id",
      pairsDf(Seq((30L, 2L), (30L, 11L))), dir, "b1")
    ClusterState.refresh(idsDf(Seq(50L)), "id", pairsDf(Nil), dir, "b2")
    val before = labelMap(dir)
    ClusterState.compact(spark, dir)
    assert(VersionedState.committed(spark, dir).map(_._2) === Seq("base-compact"))
    assert(labelMap(dir) === before, "compacted ≡ pre-compaction labels")
    // maintenance continues on the compacted base
    ClusterState.refresh(idsDf(Seq(60L)), "id", pairsDf(Seq((60L, 50L))),
      dir, "b3")
    assert(labelMap(dir)(60L) === 50L)
  }

  test("refresh before build is refused") {
    val e = intercept[IllegalArgumentException] {
      ClusterState.refresh(idsDf(Seq(1L)), "id", pairsDf(Nil),
        freshDir("norefresh"))
    }
    assert(e.getMessage.contains("build"))
  }
}
