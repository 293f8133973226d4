package graft.ann

import graft.operators.VersionedState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, INCREMENTALLY-maintained IVF index — q225's
  * `merge(stored, Δ) ≡ rebuild(S ∪ Δ)` contract applied to the last
  * rebuild-from-scratch family: at 100 TB you refresh a vector index
  * from deltas and GATE drift against a periodic full retrain; you do
  * not re-route the corpus on every ingest batch.
  *
  * == State layout ==
  *
  * One [[graft.operators.VersionedState]] directory; every version is
  * an atomic (centroids, assignment segment) pair, labeled in its
  * commit marker:
  *
  *  - `base` (from [[build]]): centroids freshly trained; the segment
  *    holds assignments of the ENTIRE corpus given. Earlier versions
  *    are dead (their segments route against superseded centroids)
  *    and are garbage-collected.
  *  - `delta` (from [[refresh]]): centroids carried over UNCHANGED
  *    (frozen — the centroid table is bucket-count-sized, so the
  *    per-version rewrite is trivia); the segment holds ONLY the
  *    delta's assignments. History is never re-scanned.
  *
  * The live index is the latest version's centroids + the UNION of
  * segments from the latest base onward. Because a version's marker
  * covers both tables, a crash can never pair new centroids with
  * stale segments or vice versa — the mixed-basis corruption a
  * two-directory layout invites.
  *
  * == Maintenance algebra ==
  *
  * Assignment is POINTWISE (each vector's bucket depends only on the
  * frozen centroids), so refresh-by-union is exactly re-routing
  * everything: drift ≡ 0 by construction, and q266 verifies it
  * engine-side against a full re-route. What frozen centroids DO lose
  * over time is fit — the delta may drift from the training
  * distribution — so [[refresh]] is paired with q266's retrain audit:
  * mean assigned cosine of the maintained index vs a full Lloyd
  * retrain, gated in exact micro-scaled integer space, plus an IVF
  * recall comparison on a bounded query set. When the gate trips, run
  * [[build]] again (the periodic rebuild) — not every batch.
  *
  * Replay: a refresh carrying a caller-supplied `deltaId` is
  * IDEMPOTENT — the id rides in the commit marker and a re-delivered
  * id is a no-op (the protocol-level guard [[IndexSegments]] provides;
  * IvfIndexSpec pins it). An ID-LESS refresh keeps additive append
  * semantics (re-delivering duplicates its rows, like SketchState's
  * histogram member — exactly-once delivery is then the caller's
  * contract). A [[build]] interrupted before its marker leaves the
  * previous index intact; re-run it. [[delete]] tombstones ids;
  * [[compact]] folds the segment tail and excises tombstones.
  */
object IvfIndex {

  /** Frozen-centroid routing: (id, centroid_id, cs) — each vector's
    * most-cosine-similar centroid, ties to the smaller centroid id,
    * via the partial-aggregable max-struct (no window; the corpus is
    * never sorted). Zero-norm vectors are dropped (cosine undefined);
    * zero-norm centroids likewise.
    */
  def assignTo(vectors: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame): DataFrame = {
    val e = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
        Knn.l2norm(col(vecCol)).as("nrm"))
      .where(col("nrm") > 0)
    val cn = centroids.select(col("centroid_id"), col("cent_vec"),
        Knn.l2norm(col("cent_vec")).as("cent_nrm"))
      .where(col("cent_nrm") > 0)
    e.crossJoin(broadcast(cn))
      .select(col("id"), col("centroid_id"),
        (Knn.dot(col("v"), col("cent_vec")) / (col("nrm") * col("cent_nrm")))
          .as("cs"))
      .groupBy("id")
      .agg(max(struct(col("cs"), (-col("centroid_id")).as("nid"))).as("b"))
      .select(col("id"), (-col("b.nid")).as("centroid_id"),
        col("b.cs").as("cs"))
  }

  /** Full (re)build: train centroids on `emb` (spherical k-means,
    * [[Knn.kmeansCentroids]] — deterministic from `seedPred` seeds),
    * route every vector, and commit the pair as a BASE version. The
    * routing reads the centroids BACK from the freshly written
    * version directory, so the committed artifact — not an in-memory
    * plan — is what every assignment derives from. Prior versions are
    * garbage-collected after the marker lands.
    */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            seedPred: org.apache.spark.sql.Column, iters: Int,
            stateDir: String): Long = {
    val spark = emb.sparkSession
    val cents = Knn.kmeansCentroids(emb, idCol, vecCol, seedPred, iters)
    val prev = VersionedState.currentVersion(spark, stateDir)
    val next = prev.getOrElse(0L) + 1L
    val v = VersionedState.commit(spark, stateDir, prev, label = "base",
      gcBelow = next) { vdir =>
      cents.write.mode("overwrite").parquet(s"$vdir/centroids")
      val stored = spark.read.parquet(s"$vdir/centroids")
      assignTo(emb, idCol, vecCol, stored)
        .write.mode("overwrite").parquet(s"$vdir/segment")
    }
    v
  }

  /** Incremental refresh: route ONLY `delta` through the stored
    * (frozen) centroids and commit (same centroids, delta segment) as
    * a DELTA version. One broadcast join over the delta — the history
    * segments are not read, let alone re-routed.
    *
    * `deltaId` (optional) makes the refresh REPLAY-IDEMPOTENT: the id
    * rides in the commit marker (`delta:<id>`), and re-delivering an
    * id already committed on the current read horizon is a no-op
    * returning the existing version. An id-less refresh keeps the
    * additive append semantics (exactly-once delivery is then the
    * caller's contract — both behaviors pinned in IvfIndexSpec).
    */
  def refresh(delta: DataFrame, idCol: String, vecCol: String,
              stateDir: String, deltaId: String = ""): Long = {
    val spark = delta.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    require(prev.nonEmpty,
      s"no committed index at $stateDir — run build() before refresh()")
    IndexSegments.alreadyDelivered(spark, stateDir, deltaId) match {
      case Some(v) => return v // replayed delta: already committed
      case None    =>
    }
    val stored = spark.read.parquet(
      s"${VersionedState.versionPath(stateDir, prev.get)}/centroids")
    VersionedState.commit(spark, stateDir, prev,
      label = IndexSegments.deltaLabel(deltaId)) { vdir =>
      stored.write.mode("overwrite").parquet(s"$vdir/centroids")
      assignTo(delta, idCol, vecCol,
          spark.read.parquet(s"$vdir/centroids"))
        .write.mode("overwrite").parquet(s"$vdir/segment")
    }
  }

  /** Delete `ids` (first column) from the live index: commits a
    * TOMBSTONE version (centroids carried forward + the id table).
    * Earlier segments' rows for those ids vanish from
    * [[assignments]]; a later [[refresh]] may re-add an id (the
    * delete-then-refresh ordering q272 gates). Physical excision
    * happens at the next [[compact]].
    */
  def delete(ids: DataFrame, stateDir: String): Long =
    IndexSegments.commitTombstone(ids, stateDir, Seq("centroids"))

  /** Fold every segment since the last base into ONE `base-compact`
    * version — centroids copied, NO retrain (assignments are immutable
    * under frozen centroids), tombstoned rows physically excised — and
    * GC below the retention floor (default keeps the folded horizon
    * alive for in-flight readers; reclaim with [[gc]] or the next
    * compact). Delivered delta ids ride the sidecar, so the replay
    * guard survives compaction. Bounds [[assignments]]' segment
    * fan-out and the driver-side marker reads; q271 gates
    * `compacted ≡ pre-compaction union` hash-exact.
    */
  def compact(spark: SparkSession, stateDir: String,
              retainHorizons: Int = 1): Long =
    IndexSegments.compact(spark, stateDir, Seq("centroids"), retainHorizons)

  /** Reclaim the pre-compaction horizon a retaining [[compact]] left
    * alive — call once in-flight readers of the old horizon are done.
    */
  def gc(spark: SparkSession, stateDir: String): Unit =
    IndexSegments.gcOldHorizons(spark, stateDir)

  /** The live centroid table, or None before the first build. */
  def centroids(spark: SparkSession, stateDir: String): Option[DataFrame] =
    VersionedState.currentVersion(spark, stateDir).map { n =>
      spark.read.parquet(s"${VersionedState.versionPath(stateDir, n)}/centroids")
    }

  /** The live assignment relation — the union of every segment from
    * the latest base (`base`/`base-compact`) onward, minus tombstoned
    * rows (all segments routed against the same frozen centroid table,
    * by the commit pairing; ordering semantics in
    * [[IndexSegments.live]]).
    */
  def assignments(spark: SparkSession, stateDir: String): Option[DataFrame] =
    IndexSegments.live(spark, stateDir)
}
