package graft.text

import graft.ann.IndexSegments
import graft.operators.VersionedState
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The RETRIEVAL member of the durable maintenance family: a BM25
  * inverted index (term postings + document lengths) maintained as
  * [[graft.operators.VersionedState]] across corpus ingest batches —
  * the production shape of batch q119 (which computes BM25 one-shot
  * per query): a web-scale corpus evolves by ingest and erasure
  * batches, and the postings table is the artifact you maintain, not
  * recompute per query.
  *
  * Both state components are LINEAR COUNTS — a posting is (term, doc,
  * tf) and a length is (doc, dl) — so the whole
  * [[graft.dedup.ExactSubstr]] count algebra transfers: a refresh
  * commits ONLY the batch's postings (history is never re-tokenized),
  * a deletion is a merge of NEGATED counts (no tombstones — unlike the
  * ANN index family, whose rows are not additive), compaction folds
  * the horizon into one table of the nonzero totals, and ANY
  * drift vs a one-shot recount is corruption by construction, never
  * approximation.
  *
  * == State layout ==
  *
  * One versioned-state directory; every version's payload is a
  * `postings/` parquet table (term STRING, doc, tf BIGINT, dl
  * BIGINT), PARTITIONED BY a term-hash bucket `b` (the first 8 md5
  * hex digits of the term mod B — B a build-time dial carried in the
  * base label, recovered from disk on every later commit so
  * maintainers cannot desynchronize it), and an unpartitioned
  * `doclen/` table (doc, dl BIGINT). The document length is
  * DENORMALIZED into every posting row: dl is known at every commit
  * (build/refresh tokenize the batch; retract/delete negate LIVE
  * rows, which already carry it) and negates alongside tf, so the
  * count algebra is unchanged — and the serving path never joins a
  * corpus-sized table (see the scale-shape note below). The
  * `doclen/` table remains the N/avgdl STATS source only (one
  * doc-count-sized agg folding to one row per cut).
  * Labels: `base:B=<n>` (a [[build]] — counts of the whole
  * corpus given), `delta` / `delta:<id>` (a [[refresh]] — counts of
  * ONLY the delta docs), `retract:<id>`* (a [[retract]] — NEGATIVE
  * counts of removed docs, token rows supplied by the caller),
  * `drop:<id>`* (a [[delete]] — the same negation re-derived from the
  * LIVE state by id alone), `base-compact:B=<n>` (a [[compact]] —
  * every count since the last base folded into one table). The LIVE index is the per-key SUM across every table since
  * the latest base, positive totals only ([[livePostings]] /
  * [[liveDocLens]]).
  *
  * A refresh/retract carrying `deltaId` is replay-idempotent — the id
  * rides the commit marker, survives compaction in the delivered-id
  * sidecar ([[graft.ann.IndexSegments.DeliveredFile]]), and is reset
  * only by a full [[build]]. Torn commits, GC and second-writer
  * surfacing are [[graft.operators.VersionedState]]'s guarantees.
  *
  * == Scale shape (100 TB) ==
  *
  * The per-batch state delta is one token explode + hash agg OVER THE
  * BATCH (the inverted-index build cost of the batch alone). A query
  * filters the postings union by its terms' BUCKETS and the terms
  * themselves BEFORE the live-sum agg: the bucket predicate is a
  * PARTITION filter (a k-term query opens ≤ k of B directories per
  * segment — a file skip), the term predicate a pushed data filter
  * inside them (a row skip) — and because dl rides the posting row,
  * the per-doc length needs NO lookup join: EVERY per-query input is
  * bounded by the query terms' postings, never the corpus. Corpus
  * stats (N, avgdl) are one doc-count-sized agg folding to one row,
  * computed once per manifest cut by a serving layer ([[stats]] →
  * `precomputedStats`) — with it, a query's total selected bytes are
  * the pruned postings buckets alone (ProfileBm25's
  * `selected-bytes-total` column). The segment fan-out and the
  * driver-side marker scan are bounded by [[compact]], exactly like
  * the rest of the family.
  */
object Bm25State {

  /** Batch postings: (term, doc, tf) — one explode + one hash agg over
    * the batch given (map-side partial agg keeps the shuffle at
    * distinct-(term, doc) size).
    */
  def postings(toks: DataFrame, idCol: String, toksCol: String): DataFrame =
    toks.select(col(idCol).as("doc"), explode(col(toksCol)).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))

  /** Batch document lengths: (doc, dl), zero-token docs excluded (they
    * carry no postings and must not count toward N or avgdl — q119's
    * `len(tokens) >= 1` filter).
    */
  def docLens(toks: DataFrame, idCol: String, toksCol: String): DataFrame =
    toks.where(size(col(toksCol)) >= 1)
      .select(col(idCol).as("doc"), size(col(toksCol)).cast("long").as("dl"))

  /** Batch postings WITH the doc length denormalized onto every row:
    * (term, doc, tf, dl) — the stored payload shape, ONE pass over the
    * batch (dl = size(tokens) rides through the explode as a grouping
    * key; under the one-row-per-doc batch contract it is functionally
    * dependent on doc, so the group is exactly (term, doc)). Same
    * shuffle as [[postings]] — no second scan, no join.
    */
  def postingsWithDl(toks: DataFrame, idCol: String,
                     toksCol: String): DataFrame =
    toks.where(size(col(toksCol)) >= 1)
      .select(col(idCol).as("doc"),
        size(col(toksCol)).cast("long").as("dl"),
        explode(col(toksCol)).as("term"))
      .groupBy("term", "doc", "dl").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc"), col("tf"), col("dl"))

  /** The term-hash bucket COLUMN: first 8 md5 hex digits mod B —
    * md5 for the repo's portable-hash discipline, byte-equal to
    * [[bucketOf]] (the driver-side twin query planning uses).
    */
  def bucketExpr(term: Column, nB: Int): Column =
    (conv(substring(md5(term), 1, 8), 16, 10).cast("long") % nB).cast("int")

  /** Driver-side twin of [[bucketExpr]]: the bucket of one term. */
  def bucketOf(term: String, nB: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % nB).toInt
  }

  private def baseLabel(kind: String, nB: Int) = s"$kind:B=$nB"

  private val BPattern = """.*:B=(\d+)""".r

  private def lastBaseOf(cs: Seq[(Long, String)],
                         stateDir: String): (Long, Int) =
    cs.filter(_._2.startsWith("base")).lastOption match {
      case Some((n, BPattern(b))) => (n, b.toInt)
      case Some((_, bad)) => throw new IllegalStateException(
        s"base marker at $stateDir carries no bucket dial (label '$bad') " +
          "— not a Bm25State directory")
      case None => throw new IllegalStateException(
        s"$stateDir has committed versions but no base — corrupt state")
    }

  /** The bucket count the stored state was partitioned with. `asOf`
    * pins the read to a committed version (a manifest cut).
    */
  def storedBuckets(spark: SparkSession, stateDir: String,
                    asOf: Option[Long] = None): Int = {
    val cs0 = VersionedState.committed(spark, stateDir)
    val cs = asOf.fold(cs0)(v => cs0.filter(_._1 <= v))
    require(cs.nonEmpty, s"no committed state at $stateDir")
    lastBaseOf(cs, stateDir)._2
  }

  /** Write a postings table bucket-partitioned. `splits ≤ 1` keeps the
    * historical ONE file per bucket per commit — right for delta-sized
    * commits. A corpus-sized write (build/compact) with one file per
    * bucket funnels 1/B of the corpus through a SINGLE task (a write
    * straggler at scale) and later bin-packs a bucket's whole read
    * into one input split; `splits > 1` co-hashes the doc id into the
    * exchange so each bucket lands in ~`splits` parallel tasks → ~that
    * many files, restoring both write and read parallelism. Purely
    * physical: the read path is unchanged (the bucket stays the
    * partition directory; readers sum per (term, doc) regardless of
    * file count).
    */
  private def writePostings(p: DataFrame, nB: Int, vdir: String,
                            splits: Int = 1): Unit = {
    val withB = p.withColumn("b", bucketExpr(col("term"), nB))
    // the salt keeps the distinct partitioner keys at nB·splits: keying
    // the exchange on (b, doc) directly would spread EVERY bucket over
    // all nB·splits tasks (≈ nB·splits files per bucket — nB× the
    // documented fan-out; at B=1024/splits=32 that is 33M tiny files
    // instead of 32k)
    val parted =
      if (splits <= 1) withB.repartition(nB, col("b"))
      else withB.repartition(nB * splits, col("b"),
        pmod(hash(col("doc")), lit(splits)))
    parted.write.mode("overwrite").partitionBy("b")
      .parquet(s"$vdir/postings")
  }

  private def writePayload(toks: DataFrame, idCol: String, toksCol: String,
                           negate: Boolean, nB: Int, splits: Int = 1)
                          (vdir: String): Unit = {
    val p = postingsWithDl(toks, idCol, toksCol)
    val l = docLens(toks, idCol, toksCol)
    val (ps, ls) =
      if (negate)
        (p.select(col("term"), col("doc"), (-col("tf")).as("tf"),
          (-col("dl")).as("dl")),
          l.select(col("doc"), (-col("dl")).as("dl")))
      else (p, l)
    // two independent tables of one commit payload: overlap the writes
    // from the driver pool (guide §2.6) — each write's content and
    // layout are exactly the sequential ones
    graft.operators.Par.both(
      () => writePostings(ps, nB, vdir, splits),
      () => ls.write.mode("overwrite").parquet(s"$vdir/doclen"))
  }

  /** Full (re)build: the inverted index of the entire corpus given,
    * committed as `base:B=<buckets>`; prior versions (and the
    * replay-guard horizon) GC'd. `buckets` sizes the postings'
    * term-hash partitioning — the dial to raise with corpus size
    * (16 keeps the toy testdata at one small file per bucket; a
    * 100 TB corpus wants 1024+, each bucket a directory a k-term
    * query never opens unless it has to). `writeSplits` (> 1)
    * parallelizes each bucket's corpus-sized write/read into ~that
    * many files — size so bucket files land near the input split size
    * (bytes/B/splits ≈ `maxPartitionBytes`); deltas don't need it.
    */
  def build(toks: DataFrame, idCol: String, toksCol: String,
            stateDir: String, buckets: Int = 16,
            writeSplits: Int = 1): Long = {
    require(buckets >= 1, s"buckets must be ≥ 1, got $buckets")
    // an all-empty base would commit zero part files under postings/,
    // and every later read's explicit-schema inference off the base
    // would then fail with an opaque AnalysisException — surface the
    // contract here instead (start an empty index with the first real
    // batch's build, not an empty one). The guard is on the DERIVED
    // payload, not the raw input: a corpus whose docs all have EMPTY
    // token arrays passes a raw non-empty check while postings/doclen
    // (filtered by size ≥ 1) still write footer-less.
    require(!toks.where(size(col(toksCol)) >= 1).isEmpty,
      "build() needs a corpus with at least one non-empty token array " +
        "— zero-token docs carry no postings, so the base would commit " +
        "no parquet footers to anchor later reads; build on the first " +
        "real batch instead")
    val spark = toks.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    val next = prev.getOrElse(0L) + 1L
    VersionedState.commit(spark, stateDir, prev,
      label = baseLabel("base", buckets), gcBelow = next)(
      writePayload(toks, idCol, toksCol, negate = false, buckets,
        writeSplits))
  }

  private def deltaCommit(toks: DataFrame, idCol: String, toksCol: String,
                          stateDir: String, kind: String, deltaId: String,
                          negate: Boolean,
                          requireNewDocs: Boolean = false): Long = {
    val spark = toks.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    require(prev.nonEmpty,
      s"no committed state at $stateDir — run build() before $kind()")
    // validate-first, the family-wide invariant (commitTombstone's
    // order): guard keys are always VALIDATED ids
    IndexSegments.validDeltaId(deltaId) // byte-bounded: marker + sidecar safe
    val delivered =
      if (deltaId.isEmpty) None
      else IndexSegments.alreadyDeliveredLabel(spark, stateDir,
        s"$kind:$deltaId") // marker OR the base's compaction-carried sidecar
    delivered match {
      case Some(v) => return v // replayed batch id: already committed
      case None    =>
    }
    // opt-in split-arrival guard, checked AFTER the replay guard (a
    // crash-replayed batch legitimately names its own live docs): the
    // denormalized dl layout needs each doc's tokens whole in ONE
    // commit — a second refresh of a live doc leaves per-term dl
    // divergent and scores silently wrong
    if (requireNewDocs && !negate) {
      val dup = liveDocLens(spark, stateDir).get
        .join(broadcast(toks.select(col(idCol).as("doc")).distinct()), "doc")
        .select("doc").limit(3).collect().map(_.get(0))
      require(dup.isEmpty,
        s"refresh delta names docs already LIVE in $stateDir (e.g. " +
          s"${dup.mkString(", ")}) — a live doc is updated by delete() " +
          "+ re-refresh(), never a second refresh (the denormalized dl " +
          "rides each commit whole)")
    }
    val nB = storedBuckets(spark, stateDir) // the dial comes from disk
    val label = if (deltaId.isEmpty) kind else s"$kind:$deltaId"
    VersionedState.commit(spark, stateDir, prev, label = label)(
      writePayload(toks, idCol, toksCol, negate, nB))
  }

  /** Incremental refresh: postings + lengths of ONLY the delta docs.
    * `deltaId` (optional) makes the refresh replay-idempotent.
    *
    * ⚠ Family contract: a doc's tokens arrive WHOLE in one commit, and
    * a live doc is updated by [[delete]] + re-[[refresh]], never by a
    * second refresh of the same id. The denormalized layout depends on
    * it: splitting one doc's content across two refreshes leaves each
    * (term, doc)'s dl summing only over the commits that term appeared
    * in — per-term lengths diverge and scores silently differ from the
    * doclen-join formulation (which this layout replaced precisely
    * because no shipped pipeline used incremental per-doc appends).
    * The [[maintain]] drift gate reports a split arrival as Corruption
    * when an `auditCorpus` is supplied; `requireNewDocs = true` rejects
    * it UP FRONT instead — one doc-count-sized scan of the live
    * lengths against the broadcast batch ids, checked after the replay
    * guard (a crash-replayed batch legitimately names its own docs).
    */
  def refresh(toks: DataFrame, idCol: String, toksCol: String,
              stateDir: String, deltaId: String = "",
              requireNewDocs: Boolean = false): Long =
    deltaCommit(toks, idCol, toksCol, stateDir, "delta", deltaId,
      negate = false, requireNewDocs = requireNewDocs)

  /** Remove docs from the maintained index: commit their postings and
    * lengths NEGATED (counts are linear — the dedup pipeline's
    * erasure verdicts are a merge here, no tombstones needed). The
    * caller passes the same token rows the docs contributed when
    * added; when the doc store is no longer queryable, use [[delete]]
    * — the postings name the doc, so the rows can be re-derived from
    * the live state.
    *
    * ⚠ Contract hazard (prefer [[delete]] for erasure): retracting
    * token rows the doc never contributed leaves NEGATIVE stored
    * totals — a later [[refresh]] of that doc sums to ≤ 0 and the doc
    * stays dead. [[compact]] preserves nonzero totals (negatives
    * included), so the dead-doc state is at least compaction-invariant
    * — but it is still WRONG relative to the caller's intent, and only
    * the drift gate ([[maintain]] with an `auditCorpus`) surfaces it,
    * as Corruption. [[delete]] has no such mode — it negates LIVE
    * totals, so it is idempotent at the algebra level. The same hazard
    * note applies to [[graft.dedup.ExactSubstr.retract]].
    */
  def retract(toks: DataFrame, idCol: String, toksCol: String,
              stateDir: String, deltaId: String = ""): Long =
    deltaCommit(toks, idCol, toksCol, stateDir, "retract", deltaId,
      negate = true)

  /** Erasure BY ID ALONE: negate the docs' LIVE postings and lengths —
    * no token rows needed (unlike [[retract]] and ExactSubstr.retract,
    * the postings name the doc, so the negation re-derives from the
    * state itself). Deriving from the LIVE totals also makes deletion
    * idempotent at the ALGEBRA level, not just the replay guard: a
    * second delete of the same ids (even under a different delta id)
    * sees zero live counts and negates nothing — where a double
    * [[retract]] of the same token rows under two ids would
    * over-subtract. A later [[refresh]] re-adds the doc (erasure is
    * intent-ordered, like the ANN family's latest-wins tombstones).
    * `ids` is a one-column relation of doc ids (erasure-batch-sized,
    * broadcast against one scan of the live tables).
    */
  def delete(ids: DataFrame, idCol: String, stateDir: String,
             deltaId: String = ""): Long = {
    val spark = ids.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    require(prev.nonEmpty,
      s"no committed state at $stateDir — run build() before delete()")
    IndexSegments.validDeltaId(deltaId) // validate-first (family invariant)
    val delivered =
      if (deltaId.isEmpty) None
      else IndexSegments.alreadyDeliveredLabel(spark, stateDir,
        s"drop:$deltaId")
    delivered match {
      case Some(v) => return v // replayed erasure id: already committed
      case None    =>
    }
    val nB = storedBuckets(spark, stateDir)
    val victims = broadcast(ids.select(col(idCol).as("doc")).distinct())
    val p = livePostings(spark, stateDir).get.join(victims, "doc")
      .select(col("term"), col("doc"), (-col("tf")).as("tf"),
        (-col("dl")).as("dl"))
    val l = liveDocLens(spark, stateDir).get.join(victims, "doc")
      .select(col("doc"), (-col("dl")).as("dl"))
    val label = if (deltaId.isEmpty) "drop" else s"drop:$deltaId"
    VersionedState.commit(spark, stateDir, prev, label = label) { vdir =>
      graft.operators.Par.both(
        () => writePostings(p, nB, vdir),
        () => l.write.mode("overwrite").parquet(s"$vdir/doclen"))
    }
  }

  /** Per-key count totals across the read horizon — the family-shared
    * [[graft.ann.IndexSegments.liveCounts]] reader (explicit base
    * schema, legacy-layout remedy, `liveOnly = false` for the
    * observable-state-invariant compact fold).
    */
  private def liveSum(spark: SparkSession, stateDir: String,
                      asOf: Option[Long], table: String, keys: Seq[String],
                      cnts: Seq[String],
                      pre: DataFrame => DataFrame = identity,
                      liveOnly: Boolean = true)
      : Option[DataFrame] =
    IndexSegments.liveCounts(spark, stateDir, asOf, table, keys, cnts,
      pre, liveOnly)

  /** The LIVE postings (term, doc, tf, dl): per-key totals summed
    * across every version since the latest base, positive tf totals
    * only — dl sums by the same linear algebra (it was committed
    * alongside tf and negated alongside it), so a live row's dl IS
    * the doc's live length PROVIDED each doc's tokens arrived whole
    * per commit (the [[refresh]] contract — split arrivals leave
    * per-term dl divergent, which the drift gate surfaces).
    * None before the first commit. With
    * `terms` given, the read filters to those terms' BUCKET
    * PARTITIONS (a file skip — ≤ k of B directories per segment open)
    * plus the terms themselves (a pushed row filter inside them)
    * BEFORE the live-sum agg. `asOf` pins the read to a committed
    * version (a manifest cut; the pinned horizon must still be on
    * disk — retention keeps one folded horizon, [[gc]] reclaims it).
    */
  def livePostings(spark: SparkSession, stateDir: String,
                   asOf: Option[Long] = None,
                   terms: Option[Seq[String]] = None): Option[DataFrame] = {
    val pre: DataFrame => DataFrame = terms match {
      case Some(ts) =>
        val nB = storedBuckets(spark, stateDir, asOf)
        val bs = ts.map(bucketOf(_, nB)).distinct
        df => df.where(col("b").isin(bs: _*) && col("term").isin(ts: _*))
      case None => identity
    }
    liveSum(spark, stateDir, asOf, "postings", Seq("term", "doc"),
      Seq("tf", "dl"), pre)
  }

  /** The LIVE document lengths (doc, dl) — same algebra; the N/avgdl
    * STATS source (the serving path reads dl off the postings rows).
    * A fully retracted doc sums to 0 and drops out of N and avgdl.
    */
  def liveDocLens(spark: SparkSession, stateDir: String,
                  asOf: Option[Long] = None): Option[DataFrame] =
    liveSum(spark, stateDir, asOf, "doclen", Seq("doc"), Seq("dl"))

  /** Corpus stats — one row (nd, avgdl) derived from the live doc
    * lengths (exact: derived, never maintained additively, so a
    * re-ingested doc can't desynchronize them from the doclen truth).
    * The derivation is a doc-count-sized scan folding to one row, and
    * the result only changes at COMMITS — a serving layer computes
    * this once per manifest cut (collect the single row, re-`lit` it)
    * and passes it to [[topK]], which otherwise recomputes per query
    * for self-containment.
    */
  def stats(spark: SparkSession, stateDir: String,
            asOf: Option[Long] = None): DataFrame =
    liveDocLens(spark, stateDir, asOf).getOrElse(
        throw new IllegalStateException(s"no committed state at $stateDir"))
      .agg(count(lit(1)).as("nd"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))

  /** BM25 top-k over the maintained index (k1/b the Robertson defaults,
    * the +1 idf form — q119's scorer verbatim): per-term partial
    * scores summed per doc, ROUNDED to `roundTo` digits (ties broken
    * by doc), cut by TakeOrderedAndProject — per-partition top-k then
    * a k-row merge, never a corpus sort. The term filter lands below
    * the live-sum agg and the segment union; df/stats ride one-row /
    * k-row broadcasts; dl rides the posting rows themselves, so there
    * is NO per-doc length lookup join — with `precomputedStats` (a
    * [[stats]] result, one row per cut — same arithmetic or the
    * scores change) the query's only table input is the pruned
    * postings buckets. Without it, the corpus-stats derivation scans
    * the doclen table once (doc-count-sized) for self-containment.
    */
  def topK(spark: SparkSession, stateDir: String, terms: Seq[String],
           k: Int, k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 6,
           asOf: Option[Long] = None,
           precomputedStats: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val tf = livePostings(spark, stateDir, asOf, Some(terms)).getOrElse(
      throw new IllegalStateException(s"no committed state at $stateDir"))
    val stats = precomputedStats.getOrElse(
      liveDocLens(spark, stateDir, asOf).get
        .agg(count(lit(1)).as("nd"),
          (sum("dl").cast("double") / count(lit(1))).as("avgdl")))
    val dft = tf.groupBy("term").agg(countDistinct("doc").as("df"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc"),
        (log((col("nd") - col("df") + 0.5) / (col("df") + 0.5) + 1)
          * (col("tf") * (k1 + 1))
          / (col("tf") + lit(k1)
              * (lit(1) - b + lit(b) * col("dl") / col("avgdl")))).as("s"))
      .groupBy("doc").agg(round(sum("s"), roundTo).as("bm25"))
      .orderBy(col("bm25").desc, col("doc")).limit(k)
  }

  /** Fold every count table since the last base into ONE `base-compact`
    * version (zero totals dropped, NONZERO totals — negatives from a
    * contract-violating retract included — preserved, so compaction
    * never changes observable state) and GC below
    * the retention floor (default keeps the folded horizon alive for
    * in-flight readers — reclaim with [[gc]] or the next compact).
    * The delivered delta/retract ids ride the sidecar, so the replay
    * guard survives compaction; only a full [[build]] resets it.
    * `writeSplits` as in [[build]] — the fold is the other
    * corpus-sized write.
    */
  def compact(spark: SparkSession, stateDir: String,
              retainHorizons: Int = 1,
              maxDelivered: Int = IndexSegments.DefaultMaxDelivered,
              writeSplits: Int = 1): Long = {
    val cs = VersionedState.committed(spark, stateDir)
    require(cs.nonEmpty, s"no committed state at $stateDir — nothing to compact")
    val (base, nB) = lastBaseOf(cs, stateDir)
    val cur = cs.last._1
    if (cur == base) return cur
    // the fold keeps every NONZERO total (not just positive): negative
    // totals left by a contract-violating retract survive compaction
    // verbatim, so the observable state (reads filter > 0) is
    // IDENTICAL before and after a compact on any input — the old
    // positive-only fold silently revived a violated-then-refreshed
    // doc across a compact
    val p = liveSum(spark, stateDir, None, "postings", Seq("term", "doc"),
      Seq("tf", "dl"), liveOnly = false).get
    val l = liveSum(spark, stateDir, None, "doclen", Seq("doc"),
      Seq("dl"), liveOnly = false).get
    // a fully-erased state must NOT fold: the bucket-partitioned write
    // of zero rows commits zero parquet footers, and every later read's
    // explicit-schema anchor off the new base would then fail — the
    // same hole build()'s non-empty guard closes. Keep the unfolded
    // horizon (reads stay healthy) and build() on the next real corpus.
    require(!p.isEmpty,
      s"refusing to compact $stateDir: the live index is EMPTY (every " +
        "doc erased) — an empty base-compact would leave no schema " +
        "anchor; keep the horizon and build() on the next corpus instead")
    val delivered = IndexSegments.retainDelivered(
      IndexSegments.deliveredLabelsOrdered(spark, stateDir, cs),
      maxDelivered, stateDir)
    val next = cur + 1
    VersionedState.commit(spark, stateDir, Some(cur),
      label = baseLabel("base-compact", nB),
      gcBelow = IndexSegments.compactGcFloor(cs, next, retainHorizons)) { vdir =>
      graft.operators.Par.both(
        () => writePostings(p, nB, vdir, writeSplits),
        () => l.write.mode("overwrite").parquet(s"$vdir/doclen"))
      VersionedState.writeLines(spark, vdir, IndexSegments.DeliveredFile,
        delivered)
    }
  }

  /** Reclaim the pre-compaction horizon a retaining [[compact]] left
    * alive — call once in-flight readers of the old horizon are done.
    */
  def gc(spark: SparkSession, stateDir: String): Unit =
    IndexSegments.gcOldHorizons(spark, stateDir)

  /** The runbook as code — one call per ingest batch: refresh with the
    * delta (replay-guarded by `deltaId`), compact when the read
    * horizon's marker count exceeds `maxLiveMarkers`, and — when
    * `auditCorpus` (the full live token table) is supplied — gate BOTH
    * maintained tables against a one-shot recount: counts are linear,
    * so ANY difference is corruption (a replayed id-less delta, a lost
    * table), never approximation.
    */
  def maintain(deltaToks: DataFrame, idCol: String, toksCol: String,
               stateDir: String, deltaId: String = "",
               maxLiveMarkers: Int = 8,
               auditCorpus: Option[DataFrame] = None):
      graft.operators.MaintainReport = {
    import graft.operators.{GateVerdict, Maintain, MaintainReport}
    val spark = deltaToks.sparkSession
    val prev = VersionedState.currentVersion(spark, stateDir)
    val v = refresh(deltaToks, idCol, toksCol, stateDir, deltaId)
    val replayed = prev.exists(v <= _) // fresh commit ⇒ prev+1
    val compacted = Maintain.liveMarkers(spark, stateDir) > maxLiveMarkers
    if (compacted) compact(spark, stateDir)
    val gates = auditCorpus.toSeq.map { corpus =>
      val pDiff = livePostings(spark, stateDir).get
        .join(postingsWithDl(corpus, idCol, toksCol)
            .select(col("term"), col("doc"), col("tf").as("tf_one"),
              col("dl").as("dl_one")),
          Seq("term", "doc"), "full_outer")
        .where(col("tf").isNull || col("tf_one").isNull ||
          col("tf") =!= col("tf_one") || col("dl") =!= col("dl_one"))
        .count()
      val lDiff = liveDocLens(spark, stateDir).get
        .join(docLens(corpus, idCol, toksCol)
            .select(col("doc"), col("dl").as("dl_one")),
          Seq("doc"), "full_outer")
        .where(col("dl").isNull || col("dl_one").isNull ||
          col("dl") =!= col("dl_one"))
        .count()
      if (pDiff == 0 && lDiff == 0)
        GateVerdict.Ok("drift", "maintained postings + doclen ≡ one-shot recount")
      else
        GateVerdict.Corruption("drift",
          s"$pDiff postings / $lDiff doc lengths differ from the one-shot " +
            "recount — counts are linear, so this is lost/replayed state, " +
            "not approximation; rebuild and check replay discipline")
    }
    MaintainReport(v, replayed, compacted,
      Maintain.liveMarkers(spark, stateDir), gates)
  }
}
