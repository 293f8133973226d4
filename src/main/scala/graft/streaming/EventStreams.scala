package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event row as the typed streaming API sees it. `event_id` breaks
  * same-timestamp ties in [[EventStreams.valueAnomalies]] exactly like
  * its batch twin q84; it defaults to 0 for callers that don't carry
  * ids (then same-timestamp fold order falls back to (type, value)).
  */
final case class UserEvent(ts: java.sql.Timestamp, user_id: Long,
                           event_type: String, value: Double,
                           event_id: Long = 0L)

/** Per-user running aggregate maintained by [[EventStreams.runningUserTotals]]. */
final case class UserRunning(user_id: Long, n_events: Long, total_cents: Long)

/** One (ts, id, cents) ledger entry of [[EventStreams.pointInTimeSpend]]'s
  * bounded per-user state.
  */
final case class SpendEntry(ts_us: Long, event_id: Long, cents: Long)

/** Per-user rolling-window ledger state (entries within the window of
  * the newest processed event — anything older can never re-enter a
  * future frame under the in-order contract, so it is pruned).
  */
final case class SpendState(entries: Seq[SpendEntry])

/** Per-event serving row of [[EventStreams.pointInTimeSpend]]: the
  * rolling-window spend feature as of 1µs before the event — the ONLINE
  * value of batch q210's training-time feature.
  */
final case class FeatureRow(user_id: Long, event_id: Long, ts_us: Long,
                            spend_7d_cents: Long)

/** Per-key compacted CDC state maintained by
  * [[EventStreams.latestUserState]] — the streaming twin of batch
  * q188's changelog compaction. `deleted` records that the latest op
  * was a tombstone (the key stays in state so a late re-insert with a
  * HIGHER timestamp can resurrect it, and an older late upsert cannot).
  */
final case class KeyState(user_id: Long, ts_us: Long, event_id: Long,
                          event_type: String, value: Double, deleted: Boolean,
                          expired: Boolean = false)

/** One completed daily count arriving at [[EventStreams.cusumMonitor]]
  * (typically the output of a daily windowed aggregation upstream).
  */
final case class DailyCount(event_type: String, d: Long, x: Long)

/** Per-type CUSUM state: Page's recurrence carried in exact micros —
  * TWO longs however long the stream runs (the closed-form prefix
  * tables q244 uses batch-side are a rewrite of exactly this state).
  * `last_d` enforces the in-order contract: a day at or before the
  * last scored one is late and dropped (a cumulative chart cannot
  * retro-adjust without replaying everything after the insertion).
  */
final case class CusumState(last_d: Long, sp: Long, sn: Long)

/** One scored chart point emitted by [[EventStreams.cusumMonitor]] —
  * column-compatible with batch q244's output rows.
  */
final case class ChartPoint(event_type: String, d: Long, x: Long, zm: Long,
                            s_pos: Double, s_neg: Double,
                            alarm_up: Boolean, alarm_down: Boolean)

/** One completed day's two-arm enrollment/conversion INCREMENTS
  * arriving at [[EventStreams.msprtMonitor]]: ne/nc = users whose
  * FIRST event / first purchase fell on day `d` per arm (the q257
  * per-user collapse, upstreamed — both firsts are monotone, so the
  * increments never retro-adjust). `exp` keys concurrent experiments.
  */
final case class ArmDay(exp: String, d: Long,
                        ne_a: Long, nc_a: Long, ne_b: Long, nc_b: Long)

/** Per-experiment mSPRT state: FIVE longs + the running min of 1/Λ
  * however long the experiment runs (`has_min` distinguishes "no
  * valid Λ yet" from a genuine minimum — MIN over an all-NULL prefix
  * is NULL, and p stays 1 there).
  */
final case class MsprtState(last_d: Long, n_a: Long, c_a: Long,
                            n_b: Long, c_b: Long,
                            min_inv: Double, has_min: Boolean)

/** One scored sequential-test point emitted by
  * [[EventStreams.msprtMonitor]] — column-compatible with batch
  * q257's output rows (lambda is null on V = 0 days, like the batch).
  */
final case class MsprtPoint(exp: String, d: Long, n_a: Long, c_a: Long,
                            n_b: Long, c_b: Long, theta: Double,
                            lambda: Option[Double],
                            p_always_valid: Double, reject: Boolean)

/** One completed day's two-arm CONTINUOUS-metric increments arriving
  * at [[EventStreams.msprtNormalMonitor]]: per arm, the count of
  * (user, day) observations and the exact integer Σx / Σx² of their
  * winsorized daily spends (cents, capped at a PRE-REGISTERED dial —
  * a data-dependent cap like q259's pooled p95 would peek at the
  * future and break the always-valid martingale). `exp` keys
  * concurrent experiments.
  */
final case class ArmDayNorm(exp: String, d: Long,
                            n_a: Long, s1_a: Long, s2_a: Long,
                            n_b: Long, s1_b: Long, s2_b: Long)

/** Per-experiment normal-mSPRT state: SEVEN longs + the running min
  * of 1/Λ however long the experiment runs (`has_min` as in
  * [[MsprtState]]).
  */
final case class MsprtNormState(last_d: Long,
                                n_a: Long, s1_a: Long, s2_a: Long,
                                n_b: Long, s1_b: Long, s2_b: Long,
                                min_inv: Double, has_min: Boolean)

/** One scored point emitted by [[EventStreams.msprtNormalMonitor]] —
  * column-compatible with batch q273's output rows (lambda is null on
  * V = 0 days, like the batch).
  */
final case class MsprtNormPoint(exp: String, d: Long,
                                n_a: Long, s1_a: Long, n_b: Long, s1_b: Long,
                                theta: Double, lambda: Option[Double],
                                p_always_valid: Double, reject: Boolean)

/** Exact scaled-integer cents of a 2-decimal double, replicating
  * Spark's `round()` (BigDecimal HALF_UP) bit-for-bit — `math.round`
  * is floor(x+0.5), which differs on negative values (refunds:
  * round(-0.5) is -1 under HALF_UP, 0 under floor(x+0.5)) and would
  * silently diverge the streaming folds from their oracle-checked
  * batch twins.
  */
private object Cents {
  def apply(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}

/** Structured-Streaming operators over the `events` shape
  * (ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE).
  *
  * The reference is batch-only (SURVEY.md §2.9: no streaming), so these
  * are engine extensions; each transformation is a pure
  * `DataFrame => DataFrame` that works identically on a batch frame and
  * on a `readStream` frame — the batch analogues are catalog queries
  * q14 (tumbling window) and q37 (sessionization), which the driver
  * oracle-checks. Event-time semantics:
  *  - watermarks bound state (late data beyond the bound is dropped),
  *  - tumbling windows use the built-in `window()` bucketing,
  *  - sessions use `session_window()` (gap-based merge — Spark merges
  *    overlapping per-event gap windows in the state store),
  *  - bespoke state uses `mapGroupsWithState` (the extension point the
  *    built-ins can't cover).
  * At scale the state store partitions by grouping key across executors;
  * nothing here collects to the driver.
  */
object EventStreams {

  /** Tumbling event-time window aggregation (streaming analogue of q14):
    * per (1-hour window, event_type) counts and value sums. Late rows
    * beyond 1 hour are dropped via the watermark; state for closed
    * windows is evicted.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), (col("sum_cents") / 100.0).as("sum_value"))

  /** Gap-based sessionization (streaming analogue of q37): events of one
    * user belong to one session while gaps stay under 30 minutes.
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"),
        (col("sum_cents") / 100.0).as("sum_value"))

  /** Watermarked streaming deduplication — the ingestion-side dedup a
    * training-data pipeline runs before anything else: keep the first
    * occurrence of each (user_id, event_type, ts) key, with the
    * watermark bounding how long keys are remembered (without it the
    * key state grows forever). Exactly-once per key within the
    * watermark horizon; state partitions by key across executors.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** Watermarked stream-stream interval join: pair each left event with
    * the same user's right events that happened within `within` AFTER
    * it. Both sides carry watermarks and the join condition bounds the
    * event-time distance, so Spark can size the state store and evict
    * rows once they can no longer match — the form of streaming join
    * that runs indefinitely without unbounded state.
    *
    * `within` bounds the EVENT-TIME distance between paired rows;
    * `watermarkDelay` bounds how LATE data may arrive and still join
    * (state is kept for roughly `within` + `watermarkDelay`). They are
    * different dials — a 30-minute pairing window with 5 minutes of
    * late-arrival tolerance is `("30 minutes", Some("5 minutes"))`; the
    * default reuses `within` for both.
    */
  def joinEventsWithin(left: DataFrame, right: DataFrame,
                       within: String = "30 minutes",
                       watermarkDelay: Option[String] = None): DataFrame = {
    val delay = watermarkDelay.getOrElse(within)
    val l = left.select(col("ts").as("l_ts"), col("user_id"),
        col("event_type").as("l_type"), col("value").as("l_value"))
      .withWatermark("l_ts", delay)
    val r = right.select(col("ts").as("r_ts"), col("user_id").as("r_user"),
        col("event_type").as("r_type"), col("value").as("r_value"))
      .withWatermark("r_ts", delay)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"),
        col("r_ts"), col("r_type"), col("r_value"))
  }

  /** Streaming CONTENT dedup — the ingestion-side near-exact document
    * dedup of a training pipeline, as a stream: fingerprint each doc
    * map-side (md5 of its sorted distinct token set, the same
    * fingerprint as batch q30/q51) and keep the first arrival of each
    * fingerprint within the watermark horizon. Docs differing only in
    * token order/duplication dedup together; the watermark bounds the
    * fingerprint state like any keyed streaming state.
    * Input needs (ts TIMESTAMP, doc_id, text STRING).
    */
  def dedupDocsByContent(docs: DataFrame, stopWords: Seq[String] = Nil,
                         watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", contentFingerprint(col("text"), stopWords))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Content fingerprint shared by the streaming dedup operators and
    * their batch twins (q30/q51/q89 corpus side): md5 of the sorted
    * distinct token set.
    */
  private def contentFingerprint(text: org.apache.spark.sql.Column,
                                 stopWords: Seq[String]) =
    md5(concat_ws(" ", array_sort(array_distinct(
      graft.text.Tokenize.tokens(text, stopWords)))))

  /** Streaming ADMISSION against an existing corpus — the ingestion
    * twin of batch q89's incremental dedup: a document stream is
    * admitted only if its content fingerprint appears neither in the
    * static corpus index (stream-static LEFT ANTI join — the corpus
    * side is the stored dedup index, re-read per micro-batch or
    * broadcast when small) nor earlier in the stream within the
    * watermark horizon. Input needs (ts TIMESTAMP, doc_id, text);
    * `corpusIndex` needs a `fingerprint` column (build it with the
    * same tokenization via [[corpusFingerprints]]).
    */
  def admitNewDocs(docs: DataFrame, corpusIndex: DataFrame,
                   stopWords: Seq[String] = Nil,
                   watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", contentFingerprint(col("text"), stopWords))
      .join(corpusIndex.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming robust-outlier scoring against STORED per-group stats —
    * the serving twin of batch q111: the batch job trains the
    * median/MAD table (tiny — one row per group), and the stream flags
    * each arriving event whose cents deviation from its group median
    * exceeds 3·MAD. A stateless stream-static broadcast join + a
    * map-side predicate: no streaming state at all, so it scales to
    * any event rate; exactly the batch cut (cents are exact, the
    * stored medians are exact halves, MADs exact quarters — no float
    * boundary). Input needs (ts, event_id, event_type, value); `stats`
    * needs (event_type, med, mad) in CENTS from the q111 shape.
    */
  def madOutliers(events: DataFrame, stats: DataFrame): DataFrame =
    events
      .withColumn("cv", graft.QueryDef.cents(col("value")))
      .join(broadcast(stats), "event_type")
      .where(abs(col("cv") - col("med")) > lit(3) * col("mad"))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"),
        (col("med") / 100).as("median_value"), (col("mad") / 100).as("mad_value"))

  /** The static-side index for [[admitNewDocs]]: one fingerprint row
    * per corpus document (store this, append admitted docs to it).
    */
  def corpusFingerprints(corpus: DataFrame, stopWords: Seq[String] = Nil): DataFrame =
    corpus.select(contentFingerprint(col("text"), stopWords).as("fingerprint"))
      .distinct()

  /** The stored-vocabulary artifact for [[oovScores]]: a Bloom sketch of
    * every token with corpus count ≥ `minCount` (batch q133's <unk>
    * threshold). The sketch is mergeable and its size is FIXED by
    * (estimatedItems, numBits) no matter how large the corpus — at
    * 100 TB the vocabulary never needs to broadcast as rows; only these
    * bytes ship with the serving job. The one-row collect is the model
    * artifact leaving the cluster, not a data path.
    */
  def vocabBloomSketch(corpus: DataFrame, minCount: Long,
                       stopWords: Seq[String] = Nil,
                       estimatedItems: Long = 1L << 17,
                       numBits: Long = 16L << 17): Array[Byte] =
    corpus
      .select(explode(graft.text.Tokenize.tokens(col("text"), stopWords)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .agg(graft.functions.BloomFunctions
        .bloomFilterAgg(xxhash64(col("tok")), estimatedItems, numBits).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

  /** Streaming OOV-rate scoring against the stored vocabulary sketch —
    * the serving twin of batch q133: each arriving document is scored
    * for the fraction of its tokens outside the training vocabulary
    * (the ingestion-time drift alarm). COMPLETELY stateless: the sketch
    * rides as a constant, membership is a map-side higher-order filter
    * over the token array — no join, no streaming state, any event
    * rate. Bloom false positives make `n_oov` an UNDERcount only
    * (a truly-OOV token can test in-vocab, never the reverse), bounded
    * by the sketch's fpp (~0.05% at the 16 bits/item default).
    * Input needs (ts, doc_id, text); token-less docs are dropped (their
    * rate is 0/0).
    */
  def oovScores(docs: DataFrame, vocabSketch: Array[Byte],
                stopWords: Seq[String] = Nil): DataFrame =
    docs
      .withColumn("tokens", graft.text.Tokenize.tokens(col("text"), stopWords))
      .where(size(col("tokens")) > 0)
      .select(col("doc_id"), col("ts"), size(col("tokens")).as("n_tokens"),
        size(filter(col("tokens"), t => !graft.functions.BloomFunctions
          .mightContain(lit(vocabSketch), xxhash64(t)))).as("n_oov"))
      .withColumn("oov_rate", col("n_oov") / col("n_tokens"))

  /** Streaming hot-token alarm against a stored count-min sketch — the
    * serving twin of batch q142: each arriving document's distinct
    * tokens are frequency-estimated against the batch-built sketch and
    * those at or above `threshold` estimated corpus occurrences are
    * flagged (the ingestion-time boilerplate/spam-burst detector).
    * COMPLETELY stateless: the explode is a map-side generator, the
    * sketch rides as `depth` broadcast stream-static joins with a
    * `least` chain instead of a min aggregation
    * ([[graft.functions.CountMin.estimateStateless]]) — no watermark,
    * no state store, any event rate. CMS estimates never undercount,
    * so a truly-hot token is never missed; collisions can only
    * over-flag, bounded by the sketch dials.
    * Input needs (ts, doc_id, text); emits one row per flagged
    * (doc, token).
    */
  def heavyHitterFlags(docs: DataFrame, sketch: DataFrame, threshold: Long,
                       depth: Int, width: Int,
                       stopWords: Seq[String] = Nil): DataFrame = {
    val toks = docs.select(col("doc_id"), col("ts"),
      explode(array_distinct(
        graft.text.Tokenize.tokens(col("text"), stopWords))).as("token"))
    graft.functions.CountMin
      .estimateStateless(toks, col("token"), sketch, depth, width)
      .where(col("cms_est") >= threshold)
      .select(col("doc_id"), col("ts"), col("token"), col("cms_est"))
  }

  /** Live distinct-cardinality registers over a stream — the streaming
    * twin of batch q148/q150 ([[graft.functions.HyperLogLog]]):
    * maintain, per `keys` group, the m max-rank registers of every item
    * seen so far. Aggregation state is BOUNDED at keys·m rows no matter
    * how many distinct items flow past — the point vs a streaming
    * COUNT(DISTINCT), whose state grows with cardinality — and register
    * MAX is idempotent, so replayed micro-batches can't corrupt it
    * (at-least-once safe). Run in update/complete mode (an unbounded
    * MAX admits no watermark eviction; the state it can't evict is only
    * keys·m rows); read the live estimate off the register table with
    * [[graft.functions.HyperLogLog.estimate]] per micro-batch or on
    * demand. Incremental maintenance equals the batch rebuild
    * register-for-register (StreamingSpec) because a register is a pure
    * MAX over a deterministic per-item hash — the same property that
    * makes the batch artifact shard-mergeable (q148's merge_drift).
    */
  def liveDistinctRegisters(items: DataFrame, item: org.apache.spark.sql.Column,
                            keys: Seq[String], m: Int): DataFrame =
    graft.functions.HyperLogLog.sketch(items, item, keys, m)

  /** Live bucket-histogram counters over a stream — the streaming twin
    * of batch q152 ([[graft.functions.BucketHistogram]]): maintain, per
    * `keys` group, the (bucket, n) counter table of every value seen so
    * far. State is bounded at keys·(observed range ÷ width) counter
    * rows — the dial, not the stream length — versus a streaming
    * percentile over raw values whose state grows with the stream. Run
    * in update/complete mode (counters never evict; the state they
    * can't evict is the bounded counter table); read live quantiles off
    * the counter table with [[graft.functions.BucketHistogram.quantiles]]
    * per micro-batch or on demand, with the same width-bounded error
    * guarantee as the batch sketch. Incremental maintenance equals the
    * batch rebuild counter-for-counter (StreamingSpec) because a
    * counter is a pure COUNT over a deterministic bucket function;
    * exactly-once counting across restarts is the state store's
    * transactionality (counter ADD is not idempotent the way register
    * MAX is — replay safety comes from checkpointing, not algebra).
    */
  def liveHistogramCounters(events: DataFrame, value: org.apache.spark.sql.Column,
                            keys: Seq[String], width: Long): DataFrame =
    graft.functions.BucketHistogram.sketch(events, value, keys, width)

  /** STATELESS perceptual-near-dup collision report against a stored
    * banded hash index ([[graft.multimodal.Multimodal.bandedIndex]]) —
    * the admission screen for image/audio payloads, the q230 dedup
    * geometry served online: each arriving item's 56-bit hash explodes
    * into its 4 band chunks, probes the index by (band, chunk)
    * equi-join, and exact `bit_count(xor)` ≤ `maxHamming` verifies the
    * candidates. Emits (id, matched_id, hamming) collision rows —
    * items absent from the report are novel and admitted by the
    * caller's anti-join. Fully STATELESS (no watermark, no state
    * store, no dedup aggregation), so the screen runs at any event
    * rate: a pair sharing several bands surfaces once per shared band
    * (≤ 4 rows) — multiplicity is harmless to admission semantics and
    * collapses batch-side if a distinct report is wanted. The index
    * rides as a static relation (broadcast when it fits,
    * (band, chunk)-partitioned equi-join when it doesn't);
    * within-stream duplicates are the batch re-index's concern, same
    * as [[admitNewDocs]]'s corpus contract.
    *
    * The MAINTAINED source for `index` is
    * [[graft.multimodal.PerceptualIndex.liveIndex]] — the versioned
    * state the batch lifecycle (build/refresh/delete/compact, replay
    * guards, manifest cuts) evolves; materialize it once per cut (the
    * stream probes a static plan, so refresh the relation when the cut
    * advances, the [[graft.streaming.VectorStreams]] hot-swap
    * discipline). A one-shot [[graft.multimodal.Multimodal
    * .bandedIndex]] DataFrame remains fine for ad-hoc runs.
    */
  def perceptualCollisions(items: DataFrame, idCol: String, hashCol: String,
                           index: DataFrame, maxHamming: Int): DataFrame =
    items.select(col(idCol).as("id"), col(hashCol).as("in_hsh"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("chunk", expr("shiftright(in_hsh, band * 14) & 16383"))
      .join(index.select(col("band"), col("chunk"),
        col("id").as("matched_id"), col("hsh")), Seq("band", "chunk"))
      .withColumn("hamming", expr("cast(bit_count(in_hsh ^ hsh) as int)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id"), col("matched_id"), col("hamming"))

  /** The LOG-SPACED twin of [[liveHistogramCounters]] for heavy-tailed
    * streams (spend, token counts): same bounded counter-table state,
    * relative-error quantiles — the q227 batch sketch maintained live
    * ([[graft.functions.BucketHistogram.logSketch]]).
    */
  def liveLogHistogramCounters(events: DataFrame,
                               value: org.apache.spark.sql.Column,
                               keys: Seq[String], subPerDecade: Int): DataFrame =
    graft.functions.BucketHistogram.logSketch(events, value, keys, subPerDecade)

  /** Stateless audience ROUTING against stored KMV sketches — the
    * serving twin of batch q154/q158: each arriving document's shingle
    * sketch (computed MAP-SIDE via [[graft.functions.Kmv.arraySketch]]
    * — no aggregation, no state) is Jaccard-scored against every
    * stored audience sketch, and the best-resembling audience wins
    * (ties → smallest name). The audiences ride as a bounded literal
    * (|audiences|·k longs — the vocabBloomSketch pattern), so routing
    * a 100 TB/day firehose is embarrassingly parallel: no watermark,
    * no state store, no join, any event rate.
    * Input needs (doc_id, ts, text); emits
    * (doc_id, ts, audience, jaccard).
    */
  def kmvAudienceRoute(docs: DataFrame, audiences: Seq[(String, Seq[Long])],
                       nGram: Int, k: Int,
                       stopWords: Seq[String] = Nil): DataFrame = {
    require(audiences.nonEmpty, "kmvAudienceRoute needs at least one audience")
    // the native kmv_jaccard merge walk requires sorted-distinct
    // buffers (what Kmv.sketch/mergeArrays emit); a hand-built
    // audience violating that would misroute every document silently,
    // so the bounded artifact is validated once up front
    audiences.foreach { case (name, sk) =>
      require(sk.isEmpty || sk.iterator.sliding(2).withPartial(false)
          .forall(p => p.head < p(1)),
        s"audience '$name' sketch must be sorted ascending and distinct " +
          "(build it with Kmv.sketch / Kmv.mergeArrays)")
    }
    import graft.functions.Kmv
    val audLit = array(audiences.map { case (name, sk) =>
      struct(typedLit(sk).as("kmv"), lit(name).as("aud"))
    }: _*)
    // Evaluation-count discipline (measured 29 s → ~2 s at sf0.1):
    // the doc sketch is the expensive subtree (tokenize + shingle +
    // one md5 per shingle), and without barriers CollapseProject
    // re-inlines it into every audience's lambda call AND into each
    // field read of the final struct — ~10 evaluations per row. A
    // Generate (explode of a 1-element array) is a projection barrier
    // Catalyst never collapses through, and it is streaming-legal —
    // so the sketch is computed exactly once per row, and the argmax
    // struct exactly once on top of it.
    val dskOnce = explode(array(Kmv.arraySketch(graft.dedup.Dedup.wordShingles(
      graft.text.Tokenize.tokens(col("text"), stopWords), nGram), k)))
    val scored = transform(audLit, a =>
      struct(graft.functions.KmvJaccard(col("dsk"), a.getField("kmv"), k).as("jac"),
        a.getField("aud").as("aud")))
    // argmax by (jac, then SMALLEST name): fold the bounded audience
    // array — map-side, deterministic
    val best = aggregate(scored,
      struct(lit(-1.0).as("jac"), lit("").as("aud")),
      (acc, x) => when(x.getField("jac") > acc.getField("jac"), x)
        .when(x.getField("jac") === acc.getField("jac") &&
          x.getField("aud") < acc.getField("aud"), x)
        .otherwise(acc))
    docs.select(col("doc_id"), col("ts"), dskOnce.as("dsk"))
      .select(col("doc_id"), col("ts"), explode(array(best)).as("b"))
      .select(col("doc_id"), col("ts"),
        col("b.aud").as("audience"),
        col("b.jac").as("jaccard"))
  }

  /** Live KMV bottom-k buffer over a stream — the streaming twin of
    * batch q153/q154 ([[graft.functions.Kmv]]): maintain, per `keys`
    * group, the ≤ k smallest distinct 60-bit item hashes seen so far.
    * State is bounded at keys·k longs no matter the cardinality, and
    * the DISTINCT insert is idempotent — re-delivered items can't
    * occupy a second slot, so replayed micro-batches are harmless
    * (at-least-once safe, the register-MAX property). Run in update/
    * complete mode; read the live distinct estimate
    * ([[graft.functions.Kmv.estimate]]), uniform key sample, or
    * pairwise Jaccard ([[graft.functions.Kmv.jaccard]]) off the buffer
    * at any point. Incremental maintenance equals the batch rebuild
    * slot-for-slot (StreamingSpec) because bottom-k over a set is
    * order-insensitive.
    */
  def liveKmvSketch(items: DataFrame, item: org.apache.spark.sql.Column,
                    keys: Seq[String], k: Int): DataFrame =
    graft.functions.Kmv.sketch(items, item, keys, k)

  /** Custom keyed state via `flatMapGroupsWithState` (the 0..n-rows-per-
    * group extension point `mapGroupsWithState` can't express): emit an
    * anomaly row whenever a user's event value exceeds `factor` × their
    * exclusive running mean — the shape of streaming outlier/abuse
    * detection, and the streaming analogue of batch q84. State per user
    * is two numbers (count, scaled-cents sum); the first event of a
    * user is never anomalous (no baseline yet).
    *
    * Determinism: the group iterator carries NO order guarantee, so the
    * batch's events are sorted by (event time to full microsecond
    * precision, event_id) before folding — exactly q84's window order,
    * so within one micro-batch which event is flagged matches the
    * oracle-checked batch twin even when two events share a timestamp
    * (provided event ids are carried; with defaulted ids the tie falls
    * back to (type, value)). ACROSS batches ordering is arrival-bound —
    * late events use the state as of their arrival, which is streaming
    * semantics.
    * The threshold compares cross-multiplied scaled-integer cents
    * (cents · n > factor · sum_cents) — exact long arithmetic, the same
    * predicate as q84, never a float-division boundary flip.
    */
  /** ONLINE feature serving for batch q210's rolling-spend feature:
    * per arriving event, the user's exact spend over the trailing
    * `windowMicros` ending 1µs before it — the train/serve-skew killer
    * (the SERVED feature must equal what the training join computed,
    * or the model sees a distribution it never trained on; the
    * StreamingSpec case proves streamed rows ≡ the batch q210 window,
    * cent for cent). State per user is the (ts, id, cents) ledger of
    * the trailing window only — after processing an event at t, any
    * entry older than t − window can never enter a future frame under
    * the in-order contract, so it is pruned and state stays bounded by
    * one window's events per ACTIVE user, not by history.
    *
    * Ordering contract (the [[valueAnomalies]] adjudication): within a
    * micro-batch events fold in (event-time, event_id) order — exactly
    * the batch window's frame order, so same-batch results are
    * bit-identical to batch; across batches delivery must be in order
    * per key (route late data through the batch backfill, which is the
    * feature store's correction path anyway). Same-timestamp PEERS are
    * excluded from each other's frames, matching the batch RANGE
    * frame's `1 PRECEDING` bound.
    */
  def pointInTimeSpend(events: Dataset[UserEvent],
                       windowMicros: Long = 604800000000L): Dataset[FeatureRow] = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SpendState, FeatureRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[SpendState]) =>
          var entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
          val sorted = batch.toSeq.sortBy { e =>
            (e.ts.toInstant.getEpochSecond * 1000000L + e.ts.getNanos / 1000L,
              e.event_id)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[FeatureRow]
          sorted.foreach { e =>
            val tu = e.ts.toInstant.getEpochSecond * 1000000L + e.ts.getNanos / 1000L
            val spend = entries.iterator
              .filter(en => en.ts_us >= tu - windowMicros && en.ts_us <= tu - 1)
              .map(_.cents).sum
            out += FeatureRow(uid, e.event_id, tu, spend)
            entries = (entries :+ SpendEntry(tu, e.event_id, Cents(e.value)))
              .filter(_.ts_us >= tu - windowMicros)
          }
          state.update(SpendState(entries))
          out.iterator
      }
  }

  def valueAnomalies(events: Dataset[UserEvent],
                     factor: Long = 3L): Dataset[UserEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserEvent](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          var n = 0L
          var cents = 0L
          state.getOption.foreach { p => n = p.n_events; cents = p.total_cents }
          val out = scala.collection.mutable.ArrayBuffer.empty[UserEvent]
          // getTime is millisecond-truncated; (epochSecond, getNanos)
          // recovers the full microsecond order q84 sorts by
          batch.toSeq.sortBy(e => (e.ts.toInstant.getEpochSecond, e.ts.getNanos,
            e.event_id, e.event_type, e.value)).foreach { e =>
            val ec = Cents(e.value)
            if (n > 0 && ec * n > factor * cents) out += e
            n += 1
            cents += ec
          }
          state.update(UserRunning(uid, n, cents))
          out.iterator
      }
  }

  /** Streaming CDC compaction (the q188 twin): per-key latest
    * surviving state via `mapGroupsWithState`, with 'error' events as
    * tombstones. State is ONE row per key regardless of feed length —
    * the bounded-state property that makes this viable on an unbounded
    * changelog. An event only replaces the state when it is strictly
    * newer under the total (ts µs, event_id) order, so late replays
    * and at-least-once duplicates are no-ops and the final state per
    * key is bit-identical to the batch max-struct compaction whatever
    * the arrival order — stronger than the usual streaming caveat,
    * because compaction's argmax is order-insensitive by construction.
    */
  def latestUserState(events: Dataset[UserEvent]): Dataset[KeyState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[KeyState, KeyState](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[KeyState]) =>
          var cur = state.getOption.orNull
          batch.foreach { e =>
            val tsu = e.ts.toInstant.getEpochSecond * 1000000L + e.ts.getNanos / 1000L
            if (cur == null || tsu > cur.ts_us ||
                (tsu == cur.ts_us && e.event_id > cur.event_id)) {
              cur = KeyState(uid, tsu, e.event_id, e.event_type, e.value,
                e.event_type == "error")
            }
          }
          state.update(cur)
          cur
      }
  }

  /** [[latestUserState]] with TTL eviction — the state-hygiene dial an
    * unbounded key space needs: a key idle past `ttl` (event time) is
    * FLUSHED (emitted once more with `expired = true` — the record a
    * pipeline appends to cold storage) and removed from the store, so
    * state is bounded by ACTIVE keys, not all keys ever seen. A later
    * event for an evicted key starts fresh: the streaming view is the
    * hot tier, and the batch compaction over the full changelog (q188)
    * remains the source of truth — which is why flushing, not
    * retaining, is the correct eviction semantics.
    */
  def latestUserStateWithTtl(events: Dataset[UserEvent],
                             ttlMicros: Long = 3600000000L): Dataset[KeyState] = {
    require(ttlMicros > 0, s"ttl must be positive, got $ttlMicros")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .mapGroupsWithState[KeyState, KeyState](GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val flushed = state.get.copy(expired = true)
            state.remove()
            flushed
          } else {
            var cur = state.getOption.orNull
            batch.foreach { e =>
              val tsu = e.ts.toInstant.getEpochSecond * 1000000L + e.ts.getNanos / 1000L
              if (cur == null || tsu > cur.ts_us ||
                  (tsu == cur.ts_us && e.event_id > cur.event_id)) {
                cur = KeyState(uid, tsu, e.event_id, e.event_type, e.value,
                  e.event_type == "error")
              }
            }
            state.update(cur)
            // a very late event could put ts+ttl behind the watermark,
            // which setTimeoutTimestamp refuses — clamp forward (the
            // key then times out on the next watermark advance)
            state.setTimeoutTimestamp(
              math.max((cur.ts_us + ttlMicros) / 1000L,
                state.getCurrentWatermarkMs + 1))
            cur
          }
      }
  }

  /** Custom keyed state via `mapGroupsWithState`: a per-user running
    * (event count, exact cents total) that survives across micro-batches
    * — the pattern for state the built-in aggregations can't express.
    * Money is accumulated in scaled-integer space (exact in any order).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          var n = 0L
          var cents = 0L
          state.getOption.foreach { prev => n = prev.n_events; cents = prev.total_cents }
          batch.foreach { e => n += 1; cents += Cents(e.value) }
          val next = UserRunning(uid, n, cents)
          state.update(next)
          next
      }
  }

  /** LIVE two-sided CUSUM control chart — batch q244 maintained as
    * Page's recurrence over an unbounded daily-count stream:
    * S⁺ ← max(0, S⁺ + z − k), S⁻ ← max(0, S⁻ − z − k), with z scored
    * against FROZEN per-type baseline stats `ref` (event_type →
    * (mean, stddev), computed batch-side from a reference window —
    * a live monitor cannot use q244's in-window moments, which is
    * exactly how control charts are run in production: estimate on
    * stable history, monitor against it). Everything after the one
    * z rounding is EXACT MICRO-SCALED LONG arithmetic, so a streamed
    * chart is bit-identical to the batch closed form on the same
    * counts and reference (ControlChartSpec/StreamingSpec prove it).
    *
    * State per type is THREE longs however long the stream runs.
    * Ordering contract: days are scored in (d) order within each
    * micro-batch; a day at or before the last scored one is LATE and
    * dropped (a cumulative statistic cannot retro-adjust), mirroring
    * the watermark-drop semantics of the windowed aggregations.
    * Types absent from `ref` (or with σ ≤ 0) are not scored — the
    * batch exclusion, live.
    */
  def cusumMonitor(counts: Dataset[DailyCount],
                   ref: Map[String, (Double, Double)],
                   kMicros: Long = 500000L,
                   hMicros: Long = 4000000L): Dataset[ChartPoint] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, ChartPoint](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (tpe: String, batch: Iterator[DailyCount], state: GroupState[CusumState]) =>
          ref.get(tpe).filter(_._2 > 0.0) match {
            case None => Iterator.empty
            case Some((mu, sigma)) =>
              var s = state.getOption.getOrElse(CusumState(Long.MinValue, 0L, 0L))
              val out = scala.collection.mutable.ArrayBuffer.empty[ChartPoint]
              batch.toSeq.sortBy(_.d).foreach { c =>
                if (c.d > s.last_d) {
                  // HALF_UP like the batch round() — math.round is
                  // floor(x+0.5) and differs on negative half-micros
                  val zm = java.math.BigDecimal
                    .valueOf((c.x - mu) / sigma * 1000000.0)
                    .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
                  val sp = math.max(0L, s.sp + zm - kMicros)
                  val sn = math.max(0L, s.sn - zm - kMicros)
                  out += ChartPoint(tpe, c.d, c.x, zm,
                    sp / 1000000.0, sn / 1000000.0, sp > hMicros, sn > hMicros)
                  s = CusumState(c.d, sp, sn)
                }
              }
              state.update(s)
              out.iterator
          }
      }
  }

  /** LIVE always-valid inference — batch q257's mSPRT maintained as
    * bounded per-experiment state over a stream of completed daily
    * two-arm increments: the continuous-monitoring test run the way
    * it was designed to be run (Johari et al. KDD'17 — the p-sequence
    * is valid at EVERY peek, so a dashboard may read it daily without
    * α-inflation; q219's fixed-horizon z cannot be monitored live).
    *
    * The unit of analysis is the USER (q257's discipline — the
    * upstream producer emits per-day counts of first events / first
    * purchases per arm, never raw event counts). State per experiment
    * is five longs + one double however long it runs: cumulative
    * (n_a, c_a, n_b, c_b), the last scored day, and the running
    * min of 1/Λ. Each day's θ̂, pooled V, and Λ are the SAME fixed
    * double trees as the batch query on the same cumulative longs,
    * and the rounding replicates Spark's `round()` (BigDecimal
    * HALF_UP), so the streamed p-sequence is bit-identical to batch
    * q257 on the same increments (StreamingSpec proves it).
    *
    * Ordering contract mirrors [[cusumMonitor]]: days score in (d)
    * order within a micro-batch; a day at or before the last scored
    * one is late and dropped (a cumulative statistic cannot
    * retro-adjust). Days before both arms have enrollments update
    * the cumulative state but emit nothing (n = 0 has no estimator);
    * V = 0 days emit a null Λ and p holds at the running min.
    */
  def msprtMonitor(days: Dataset[ArmDay], tauSq: Double = 1e-2,
                   alpha: Double = 0.05): Dataset[MsprtPoint] = {
    val spark = days.sparkSession
    import spark.implicits._
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    days
      .groupByKey(_.exp)
      .flatMapGroupsWithState[MsprtState, MsprtPoint](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (exp: String, batch: Iterator[ArmDay], state: GroupState[MsprtState]) =>
          var s = state.getOption.getOrElse(
            MsprtState(Long.MinValue, 0L, 0L, 0L, 0L, 0.0, has_min = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[MsprtPoint]
          batch.toSeq.sortBy(_.d).foreach { day =>
            if (day.d > s.last_d) {
              val nA = s.n_a + day.ne_a; val cA = s.c_a + day.nc_a
              val nB = s.n_b + day.ne_b; val cB = s.c_b + day.nc_b
              var minInv = s.min_inv; var hasMin = s.has_min
              if (nA > 0 && nB > 0) {
                // the batch query's double trees, verbatim
                val pp = (cA + cB).toDouble / (nA + nB)
                val theta = cB.toDouble / nB - cA.toDouble / nA
                val v = pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB)
                val lambda: Option[Double] =
                  if (v > 0.0)
                    Some(math.sqrt(v / (v + tauSq))
                      * math.exp(theta * theta * tauSq
                        / (2.0 * v * (v + tauSq))))
                  else None
                lambda.foreach { l =>
                  val inv = 1.0 / l
                  if (!hasMin || inv < minInv) { minInv = inv; hasMin = true }
                }
                val p = if (hasMin) math.min(1.0, minInv) else 1.0
                out += MsprtPoint(exp, day.d, nA, cA, nB, cB,
                  round6(theta), lambda.map(round6),
                  round6(p), p < alpha)
              }
              s = MsprtState(day.d, nA, cA, nB, cB, minInv, hasMin)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** LIVE always-valid inference for CONTINUOUS metrics — batch
    * q273's pooled-variance NORMAL-likelihood mSPRT (Johari et al.
    * KDD'17's normal-mixture Λ, the revenue-shaped twin of the binary
    * [[msprtMonitor]]) maintained as bounded per-experiment state
    * over a stream of completed daily two-arm increments.
    *
    * The observation unit is the (user, day) winsorized spend
    * increment, winsorized at a PRE-REGISTERED cap upstream (q273's
    * dial) — a data-dependent cap (q259's pooled p95) is fine for a
    * fixed-horizon readout but would peek at the future here and void
    * the anytime validity. State per experiment is SEVEN longs + one
    * double however long it runs: cumulative (n, Σx, Σx²) per arm,
    * the last scored day, and the running min of 1/Λ. Each day's θ̂,
    * pooled V, and Λ are the SAME fixed double trees as batch q273 on
    * the same cumulative longs, and the rounding replicates Spark's
    * `round()` (BigDecimal HALF_UP), so the streamed p-sequence is
    * bit-identical to the batch on the same increments (StreamingSpec
    * proves it).
    *
    * Ordering contract mirrors [[msprtMonitor]]: days score in (d)
    * order within a micro-batch; a day at or before the last scored
    * one is late and dropped. Days before both arms have observations
    * update the cumulative state but emit nothing; V = 0 days (all
    * observations identical — e.g. all zero-spend) emit a null Λ and
    * p holds at the running min.
    */
  def msprtNormalMonitor(days: Dataset[ArmDayNorm], tauSq: Double = 1e4,
                         alpha: Double = 0.05): Dataset[MsprtNormPoint] = {
    val spark = days.sparkSession
    import spark.implicits._
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    days
      .groupByKey(_.exp)
      .flatMapGroupsWithState[MsprtNormState, MsprtNormPoint](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (exp: String, batch: Iterator[ArmDayNorm],
         state: GroupState[MsprtNormState]) =>
          var s = state.getOption.getOrElse(
            MsprtNormState(Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L,
              0.0, has_min = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[MsprtNormPoint]
          batch.toSeq.sortBy(_.d).foreach { day =>
            if (day.d > s.last_d) {
              val nA = s.n_a + day.n_a
              val s1A = s.s1_a + day.s1_a; val s2A = s.s2_a + day.s2_a
              val nB = s.n_b + day.n_b
              val s1B = s.s1_b + day.s1_b; val s2B = s.s2_b + day.s2_b
              var minInv = s.min_inv; var hasMin = s.has_min
              if (nA > 0 && nB > 0) {
                // batch q273's double trees, verbatim
                val theta = s1B.toDouble / nB - s1A.toDouble / nA
                val vp = ((s2A.toDouble - s1A.toDouble * s1A.toDouble / nA)
                  + (s2B.toDouble - s1B.toDouble * s1B.toDouble / nB)) / (nA + nB)
                val v = vp * (1.0 / nA + 1.0 / nB)
                val lambda: Option[Double] =
                  if (v > 0.0)
                    Some(math.sqrt(v / (v + tauSq))
                      * math.exp(theta * theta * tauSq
                        / (2.0 * v * (v + tauSq))))
                  else None
                lambda.foreach { l =>
                  val inv = 1.0 / l
                  if (!hasMin || inv < minInv) { minInv = inv; hasMin = true }
                }
                val p = if (hasMin) math.min(1.0, minInv) else 1.0
                out += MsprtNormPoint(exp, day.d, nA, s1A, nB, s1B,
                  round6(theta), lambda.map(round6),
                  round6(p), p < alpha)
              }
              s = MsprtNormState(day.d, nA, s1A, s2A, nB, s1B, s2B,
                minInv, hasMin)
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
