package graft.streaming

import graft.ann.Knn
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming vector retrieval — the SERVING twin of the batch
  * retrieval pair (q95 broadcast kNN / q98 IVF): a stream of query
  * vectors is answered against a STORED corpus index.
  *
  * Serving shape, mirrored from how vector stores deploy:
  *  - the index ([[buildIndex]]) is batch-built once and persisted: every
  *    corpus vector pre-assigned to its top-1 codebook centroid, norms
  *    precomputed — the streaming side never touches raw corpus text;
  *  - the codebook is a MODEL ARTIFACT: k centroid vectors, collected
  *    once at operator-construction time (k rows — the same bounded
  *    collect [[Knn.kmeansCentroids]] already performs per iteration)
  *    and folded into a map-side bucket expression, so routing a query
  *    to its bucket costs zero joins and zero state;
  *  - candidate scoring is a STATELESS stream-static equi-join on the
  *    bucket id (the static side re-reads / broadcasts per micro-batch);
  *  - only the final per-query top-k is stateful: a watermarked
  *    aggregation over (event time, query id) riding the same mergeable
  *    k-slot aggregator as the batch path, so per-query state is bounded
  *    by k and evicted once the watermark passes;
  *  - index REBUILDS go live without a stream restart via the shared
  *    [[graft.operators.VersionedState]] commit protocol
  *    ([[publishIndex]]/[[latestVersion]] — atomic marker-last commits,
  *    racing publishers surfaced, two versions retained) and the
  *    [[retrieveHotSwap]] server, which re-resolves the latest
  *    published version every micro-batch.
  */
object VectorStreams {

  /** One codebook row: (centroid id, centroid vector, its L2 norm). */
  final case class Centroid(id: Long, vec: Array[Float], nrm: Double)

  /** Batch-build the stored serving index: corpus vectors keyed by their
    * top-1 centroid (partial-aggregable assignment via
    * [[Knn.ivfAssign]]) plus the collected codebook. Persist the
    * DataFrame (ideally bucketed by `centroid_id`); ship the codebook
    * array with the serving job.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 centroidPred: Column): (DataFrame, Seq[Centroid]) = {
    val e = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"),
        Knn.l2norm(col(vecCol)).as("c_nrm"))
      .where(col("c_nrm") > 0)
    val assigned = Knn.ivfAssign(corpus, idCol, vecCol, centroidPred)
      .select(col(idCol).as("cand_id"), col("centroid_id"))
    val index = e.join(assigned, "cand_id")
    val codebook = corpus.where(centroidPred)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        Centroid(r.getLong(0), v,
          math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
      }
      .filter(_.nrm > 0).sortBy(_.id).toSeq
    (index, codebook)
  }

  /** Map-side bucket routing: the argmax-cosine centroid of `vec` as a
    * pure column expression over the literal codebook (highest cosine,
    * ties to the SMALLEST centroid id — exactly [[Knn.ivfAssign]]'s
    * max_by order, so stream routing agrees with the stored index).
    */
  def bucketExpr(vec: Column, nrm: Column, codebook: Seq[Centroid]): Column = {
    require(codebook.nonEmpty, "empty codebook")
    val init = struct(lit(Double.NegativeInfinity).as("cs"),
      lit(Long.MaxValue).as("cid"))
    val best = codebook.sortBy(_.id).foldLeft(init) { (acc, c) =>
      val cs = Knn.dot(vec, typedLit(c.vec.toSeq)) / (nrm * lit(c.nrm))
      // strict > keeps the earlier (smaller-id) centroid on ties
      when(cs > acc.getField("cs"),
        struct(cs.as("cs"), lit(c.id).as("cid"))).otherwise(acc)
    }
    best.getField("cid")
  }

  /** Streaming top-k retrieval. Input stream needs
    * (ts TIMESTAMP, q_id LONG, q_vec ARRAY<FLOAT>); emits
    * (ts, q_id, rk, cand_id, sim) once the watermark passes the query's
    * event time (append mode). Zero-norm query vectors are dropped
    * (ANSI-safe cosine, same rule as the batch path).
    */
  def retrieveStream(queries: DataFrame, index: DataFrame,
                     codebook: Seq[Centroid], k: Int,
                     watermark: String = "1 hour"): DataFrame = {
    val scored = score(queries, index, codebook)
    scored
      .withWatermark("ts", watermark)
      .groupBy(col("ts"), col("q_id"))
      .agg(graft.functions.TopKAggregator.topK(k)(
        col("sim"), col("cand_id").cast("long")).as("tk"))
      .select(col("ts"), col("q_id"), posexplode(col("tk")).as(Seq("pos", "sc")))
      .select(col("ts"), col("q_id"), (col("pos") + 1).as("rk"),
        col("sc.cand_id").as("cand_id"), round(col("sc.sim"), 6).as("sim"))
  }

  /** Bucket-route and cosine-score queries against the index (shared by
    * the static-index stream and the hot-swap server).
    */
  private def score(queries: DataFrame, index: DataFrame,
                    codebook: Seq[Centroid]): DataFrame =
    queries
      .withColumn("q_nrm", Knn.l2norm(col("q_vec")))
      .where(col("q_nrm") > 0)
      .withColumn("centroid_id", bucketExpr(col("q_vec"), col("q_nrm"), codebook))
      .join(index, Seq("centroid_id"))
      .select(col("ts"), col("q_id"),
        (Knn.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm"))).as("sim"),
        col("cand_id"))

  // ------------------------------------------------------------------
  // Versioned index artifacts — the rebuild/hot-swap contract, riding
  // the repo-wide graft.operators.VersionedState protocol (one commit
  // protocol per repo — publishIndex predating it kept three solved
  // hazards: an overwrite=true marker a racing second publisher could
  // silently clobber, no GC, no foreign-layout guard):
  //
  //   rootDir/vNNN…N/index/     corpus rows keyed by centroid (parquet)
  //   rootDir/vNNN…N/codebook/  (id, vec) rows (parquet)
  //   rootDir/commits/N         marker, CREATED LAST (create-exclusive)
  //
  // A version is immutable once its marker exists; readers resolve the
  // highest committed version; a racing second publisher is SURFACED
  // by the fail-fast + create-exclusive commit, never merged; GC keeps
  // the previous version alive (retention 2) so an in-flight
  // micro-batch that already resolved it never loses its files.
  // ------------------------------------------------------------------

  /** Highest PUBLISHED version under `rootDir`, if any. */
  def latestVersion(spark: org.apache.spark.sql.SparkSession,
                    rootDir: String): Option[Int] =
    graft.operators.VersionedState.currentVersion(spark, rootDir).map(_.toInt)

  /** Publish a freshly built index+codebook as the next version under
    * `rootDir` (payload first, marker last — the VersionedState commit
    * point). Returns the published version. Run from the BATCH side on
    * whatever rebuild cadence the corpus needs; serving picks it up
    * without restart ([[retrieveHotSwap]]). Versions older than the
    * PREVIOUS one are GC'd — two stay live for in-flight readers.
    */
  def publishIndex(index: DataFrame, codebook: Seq[Centroid],
                   rootDir: String): Int = {
    val spark = index.sparkSession
    import spark.implicits._
    val prev = graft.operators.VersionedState.currentVersion(spark, rootDir)
    graft.operators.VersionedState.commit(spark, rootDir, prev,
      label = "index", gcBelow = prev.getOrElse(0L)) { vdir =>
      index.write.mode("overwrite").parquet(s"$vdir/index")
      codebook.map(c => (c.id, c.vec.toSeq)).toDF("id", "vec")
        .coalesce(1).write.mode("overwrite").parquet(s"$vdir/codebook")
    }.toInt
  }

  /** Load the highest published version. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                rootDir: String): (DataFrame, Seq[Centroid], Int) = {
    val v = latestVersion(spark, rootDir).getOrElse(
      throw new IllegalStateException(s"no published index under $rootDir"))
    val vdir = graft.operators.VersionedState.versionPath(rootDir, v.toLong)
    val index = spark.read.parquet(s"$vdir/index")
    val codebook = spark.read.parquet(s"$vdir/codebook")
      .collect()
      .map { r =>
        val vec = r.getSeq[Float](1).toArray
        Centroid(r.getLong(0), vec,
          math.sqrt(vec.map(x => x.toDouble * x.toDouble).sum))
      }
      .sortBy(_.id).toSeq
    (index, codebook, v)
  }

  /** HOT-SWAP serving: per micro-batch, re-resolve the latest published
    * index version and answer that batch's queries against it — a
    * rebuilt corpus goes live at the next micro-batch boundary, no
    * stream restart. `foreachBatch` is what makes the re-resolution
    * possible: a plan-time static join pins one file listing (and the
    * codebook literal) forever, while here both are rebuilt per batch.
    * Per-query top-k needs no watermark state — each query's scoring
    * completes within its own batch, so selection is a batch
    * aggregation. `sink` receives (result, batchId, indexVersion);
    * result rows are (ts, q_id, rk, cand_id, sim).
    */
  def retrieveHotSwap(queries: DataFrame, rootDir: String, k: Int)
                     (sink: (DataFrame, Long, Int) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val (index, codebook, v) = loadIndex(batch.sparkSession, rootDir)
        val result = score(batch, index, codebook)
          .groupBy(col("ts"), col("q_id"))
          .agg(graft.functions.TopKAggregator.topK(k)(
            col("sim"), col("cand_id").cast("long")).as("tk"))
          .select(col("ts"), col("q_id"), posexplode(col("tk")).as(Seq("pos", "sc")))
          .select(col("ts"), col("q_id"), (col("pos") + 1).as("rk"),
            col("sc.cand_id").as("cand_id"), round(col("sc.sim"), 6).as("sim"))
        sink(result, batchId, v)
    }
}
