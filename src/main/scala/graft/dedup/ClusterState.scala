package graft.dedup

import graft.ann.IndexSegments
import graft.operators.VersionedState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, INCREMENTALLY-maintained near-duplicate CLUSTER LABELS —
  * the missing state between q72 (batch connected components over the
  * verified near-dup graph) and q89 (screening one batch against a
  * corpus): at 100 TB the label table `doc → cluster min-id` is a
  * corpus-sized artifact an evolving corpus must MAINTAIN, not
  * recompute — but unlike the ANN index family, cluster labels change
  * NON-LOCALLY on ingest (one new bridge document merges two old
  * clusters, relabeling every member of the larger one). Rewriting
  * the corpus-sized table per batch would be the rebuild shape q225
  * retired; this operator stores the non-local change as a
  * DELTA-SIZED REMAP instead.
  *
  * == State layout ==
  *
  * One [[graft.operators.VersionedState]] directory:
  *
  *  - `base` / `base-compact`: `labels/` (id, label) — converged
  *    component-minimum labels for every doc known at that point.
  *  - `delta` / `delta:<id>` (a [[refresh]]): `adds/` (id, label) for
  *    the NEW docs, plus `remap/` (old_label, new_label) for every
  *    OLD cluster whose label changed — both bounded by the batch and
  *    the clusters it touches, never corpus-sized.
  *
  * The live table ([[labels]]) is (base labels ∪ every adds) pushed
  * through the remap chain in version order; each remap is
  * cluster-count-bounded and broadcast. [[compact]] folds the chain
  * back into one `base-compact` (the same read-bound argument as
  * [[graft.ann.IndexSegments.compact]]).
  *
  * == Why the reduced graph is exact ==
  *
  * A [[refresh]] contracts every existing cluster to its label (each
  * new edge's endpoints map through the stored table; new docs map to
  * themselves) and runs converged CC on that REDUCED graph only —
  * nodes are touched old labels + new ids, edges are the batch's.
  * Contracting an already-connected component preserves
  * connectivity, and because every old label IS its component's
  * minimum doc id, the reduced component's minimum equals the full
  * graph's minimum — so maintained labels ≡ a from-scratch CC over
  * the union (q276 gates it hash-exact against the DuckDB fixpoint).
  * Labels never resurrect: a label that died in a merge was a doc id
  * that now maps to something smaller, so it can never re-enter a
  * later reduced graph as a node — which is what makes applying the
  * remap chain in version order exact.
  *
  * Replay: `deltaId` rides in the commit marker and a re-delivered id
  * is a no-op (the [[graft.ann.IndexSegments]] guard). Torn commits,
  * GC, and second-writer surfacing are VersionedState's guarantees.
  *
  * == Known limit: no deletions ==
  *
  * This operator maintains a GROWING corpus. Removing a doc is
  * decremental connectivity — deleting a bridge doc may SPLIT a
  * cluster, which cannot be decided from labels alone (it needs the
  * surviving edge set). Supporting it would mean storing the verified
  * edge relation as state (corpus-×-avg-degree-sized) and re-running
  * CC inside affected clusters on delete. Until a use case pays for
  * that, the contract is: deletions require a [[build]] over the
  * surviving corpus (dedup pipelines delete via the INDEX side —
  * [[graft.ann.IvfIndex.delete]], q275 — where removal is row-local;
  * the label table is usually consumed upstream of deletions anyway).
  */
object ClusterState {

  /** Full (re)build: converged CC over `ids`/`pairs` (columns
    * id_a/id_b), committed as a `base`; prior versions GC'd.
    */
  def build(ids: DataFrame, idCol: String, pairs: DataFrame,
            stateDir: String): Long = {
    val spark = ids.sparkSession
    val (lab, _) = Dedup.nearDupClustersConverged(ids, idCol, pairs)
    val prev = VersionedState.currentVersion(spark, stateDir)
    val next = prev.getOrElse(0L) + 1L
    VersionedState.commit(spark, stateDir, prev, label = "base",
      gcBelow = next) { vdir =>
      lab.select(col(idCol).as("id"), col("cluster_id").as("label"))
        .write.mode("overwrite").parquet(s"$vdir/labels")
    }
  }

  /** Incremental refresh: `newIds` are this batch's docs; `pairs`
    * (id_a/id_b) are the verified near-dup edges TOUCHING the batch
    * (new–new and new–old alike; old–old edges were already folded
    * into the stored labels). Runs converged CC on the reduced graph
    * only and commits (adds, remap) as a delta. `deltaId` (optional)
    * makes the refresh replay-idempotent.
    */
  def refresh(newIds: DataFrame, idCol: String, pairs: DataFrame,
              stateDir: String, deltaId: String = ""): Long = {
    val spark = newIds.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    require(prev.nonEmpty,
      s"no committed state at $stateDir — run build() before refresh()")
    IndexSegments.alreadyDelivered(spark, stateDir, deltaId) match {
      case Some(v) => return v // replayed batch: already committed
      case None    =>
    }
    val stored = labels(spark, stateDir).get
      .localCheckpoint() // both endpoint projections + the remap filter read it
    // contract: project each endpoint to its current label (new docs
    // have no stored label and stay themselves)
    val e = pairs
      .join(stored.select(col("id").as("_pa"), col("label").as("_mla")),
        col("id_a") === col("_pa"), "left")
      .join(stored.select(col("id").as("_pb"), col("label").as("_mlb")),
        col("id_b") === col("_pb"), "left")
      .select(coalesce(col("_mla"), col("id_a")).as("id_a"),
        coalesce(col("_mlb"), col("id_b")).as("id_b"))
      .where(col("id_a") =!= col("id_b"))
    val newIdTable = newIds.select(col(idCol).as("id"))
    val nodes = e.select(col("id_a").as("id"))
      .unionByName(e.select(col("id_b").as("id")))
      .unionByName(newIdTable)
      .distinct()
    val (rl, _) = Dedup.nearDupClustersConverged(nodes, "id", e)
    val reduced = rl.select(col("id").as("node"), col("cluster_id"))
      .localCheckpoint() // the remap filter AND the adds join read it
    // remap rows: old labels whose component minimum changed
    val remap = reduced
      .join(stored.select(col("label")).distinct(),
        col("node") === col("label"))
      .where(col("cluster_id") =!= col("node"))
      .select(col("node").as("old_label"), col("cluster_id").as("new_label"))
    // adds: every new doc's final label (isolated docs label themselves
    // — they are in `nodes`, so the reduced CC covers them)
    val adds = reduced.join(newIdTable, col("node") === col("id"))
      .select(col("id"), col("cluster_id").as("label"))
    VersionedState.commit(spark, stateDir, prev,
      label = IndexSegments.deltaLabel(deltaId)) { vdir =>
      adds.write.mode("overwrite").parquet(s"$vdir/adds")
      remap.write.mode("overwrite").parquet(s"$vdir/remap")
    }
  }

  /** The live label table (id, label) — base ∪ adds pushed through the
    * remap chain in version order (each remap is cluster-bounded and
    * broadcast). None before the first commit.
    */
  def labels(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val cs = VersionedState.committed(spark, stateDir)
    if (cs.isEmpty) return None
    val base = IndexSegments.lastBase(cs, stateDir)
    var lab = spark.read.parquet(
      s"${VersionedState.versionPath(stateDir, base)}/labels")
    for ((n, l) <- cs.filter(_._1 > base) if l.startsWith("delta")) {
      val vdir = VersionedState.versionPath(stateDir, n)
      val adds = spark.read.parquet(s"$vdir/adds")
      val remap = spark.read.parquet(s"$vdir/remap")
        .select(col("old_label"), col("new_label"))
      lab = lab.unionByName(adds)
        .join(broadcast(remap), col("label") === col("old_label"), "left")
        .select(col("id"),
          coalesce(col("new_label"), col("label")).as("label"))
    }
    Some(lab)
  }

  /** Fold the remap chain into one `base-compact` version and GC the
    * folded tail.
    */
  def compact(spark: SparkSession, stateDir: String): Long = {
    val cs = VersionedState.committed(spark, stateDir)
    require(cs.nonEmpty, s"no committed state at $stateDir — nothing to compact")
    val base = IndexSegments.lastBase(cs, stateDir)
    val cur = cs.last._1
    if (cur == base) return cur
    val folded = labels(spark, stateDir).get
    val next = cur + 1
    VersionedState.commit(spark, stateDir, Some(cur), label = "base-compact",
      gcBelow = next) { vdir =>
      folded.write.mode("overwrite").parquet(s"$vdir/labels")
    }
  }
}
