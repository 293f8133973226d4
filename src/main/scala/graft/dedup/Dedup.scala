package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale corpus cleaning.
  *
  * Four families, in increasing fuzziness:
  *  - exact / bag-of-words fingerprint dedup (hash group-by — one shuffle)
  *  - MinHash + LSH banding (shingle → minhash → band bucket → bucket join)
  *  - n-gram Jaccard (token-shingle inverted-index join)
  *  - embedding-cosine near-dup lives in graft.ann.Knn
  *
  * MinHash here uses the "min of a keyed cryptographic hash" family:
  * h_i(doc) = min over tokens of md5(i ":" token). md5 is available and
  * bit-identical in every engine, the signature is computed per-row with
  * NO shuffle, and band equality then needs only one exchange on the
  * band key — the layout that survives a 100 TB corpus (bucket sizes,
  * not corpus size, drive the join fan-out).
  */
object Dedup {

  /** Drop LSH buckets with more than `cap` members before the self-join.
    * A degenerate bucket shared by k docs emits k² candidate pairs — one
    * hot band (empty-token docs hashing identically, boilerplate shared
    * by half the corpus) can dominate the whole stage at scale. Capping
    * is the df-threshold of LSH: buckets that common carry no blocking
    * signal anyway. The window count partitions on the same key as the
    * downstream self-join, so it rides the same exchange.
    * `cap = Int.MaxValue` (the default everywhere) skips the filter.
    */
  private[graft] def capBuckets(bands: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    if (cap == Int.MaxValue) bands
    else {
      val w = Window.partitionBy(keyCols.map(col): _*)
      bands.withColumn("_bsz", count(lit(1)).over(w))
        .where(col("_bsz") <= cap).drop("_bsz")
    }

  /** One minhash value: lexicographic min of md5("<seed>:" + token) over
    * the distinct tokens of the array column. This higher-order form is
    * the executable spec; [[minhashSignatures]] uses the native
    * [[graft.functions.MinHashSigs]] kernel (parity-tested against it).
    */
  def minhash(tokens: Column, seed: Int): Column =
    array_min(transform(array_distinct(tokens),
      t => md5(concat(lit(s"$seed:"), t))))

  /** Signature frame: (id, mh0..mh{n-1}) — entirely map-side, computed
    * by the native kernel in one pass over the distinct tokens (the
    * per-seed higher-order chains were CodegenFallback and rebuilt the
    * distinct set n times). The array is staged in its own projection so
    * the n `element_at` references hit one evaluation, not n.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, tokensCol: String,
                        nHashes: Int): DataFrame =
    docs.select(col(idCol),
        graft.functions.MinHashSigs(col(tokensCol), nHashes).as("_mhs"))
      .select(col(idCol) +:
        (0 until nHashes).map(i => element_at(col("_mhs"), i + 1).as(s"mh$i")): _*)

  /** LSH candidate pairs: docs sharing any (band, minhash) bucket.
    * One row per band per doc → self equi-join on (band, mh) → distinct.
    * Band size 1 here (each hash is its own band) — recall-oriented.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, tokensCol: String,
                        nHashes: Int, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, tokensCol, nHashes)
    val bands = capBuckets(sigs.select(col(idCol),
      posexplode(array((0 until nHashes).map(i => col(s"mh$i")): _*))
        .as(Seq("band", "mh"))), Seq("band", "mh"), maxBucketSize)
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.mh") === col("b.mh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** One row per (doc, band) with the band's minhash chunk — the
    * map-side blocking table behind banded LSH (self-joined by
    * [[lshBandedCandidatePairs]], cross-side-joined by
    * [[incrementalNearDupCandidates]]).
    */
  private[dedup] def bandedChunkRows(docs: DataFrame, idCol: String, tokensCol: String,
                                     nBands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, tokensCol, nBands * rowsPerBand)
    // `concat`, NOT concat_ws: a token-less doc has NULL minhashes, and
    // NULL must propagate into the chunk so the doc produces no joinable
    // band rows. concat_ws would silently skip NULLs, give every empty
    // doc the chunk "", and make all empty docs mutual LSH candidates —
    // while a SQL engine's `mh0 || '|' || mh1` yields NULL and never
    // joins. NULL chunks fall out of the equi-join on both sides.
    val chunks = (0 until nBands).map { b =>
      concat((0 until rowsPerBand).flatMap(r =>
        Seq(lit("|"), col(s"mh${b * rowsPerBand + r}"))).tail: _*)
    }
    sigs.select(col(idCol), posexplode(array(chunks: _*)).as(Seq("band", "chunk")))
  }

  /** Banded MinHash-LSH: nBands bands × rowsPerBand minhashes. Two docs
    * become candidates iff they agree on EVERY minhash of at least one
    * band — P(candidate) ≈ 1−(1−J^r)^b, the standard precision/recall
    * dial (single-hash bands, as in [[lshCandidatePairs]], are the
    * r=1 recall-oriented corner). Signatures are map-side; the only
    * shuffle is the (band, chunk) bucket self-join.
    */
  def lshBandedCandidatePairs(docs: DataFrame, idCol: String, tokensCol: String,
                              nBands: Int, rowsPerBand: Int,
                              maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val bands = capBuckets(bandedChunkRows(docs, idCol, tokensCol, nBands, rowsPerBand),
      Seq("band", "chunk"), maxBucketSize)
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** INCREMENTAL near-dup blocking — the production shape at 100 TB:
    * a new crawl/batch is checked against the EXISTING corpus without
    * ever re-pairing the corpus with itself (corpus×corpus is the cost
    * a steady-state pipeline cannot pay per batch; in practice the
    * corpus side's band table is the stored dedup index, appended as
    * batches are accepted). Candidates are (fresh id, corpus id) pairs
    * sharing any banded minhash chunk. The bucket-skew cap counts BOTH
    * sides' members — a boilerplate bucket is degenerate regardless of
    * which side its members came from. Ids must be disjoint across the
    * two sides (same contract as any dedup universe).
    */
  def incrementalNearDupCandidates(corpus: DataFrame, fresh: DataFrame,
                                   idCol: String, tokensCol: String,
                                   nBands: Int, rowsPerBand: Int,
                                   maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val tagged = bandedChunkRows(corpus, idCol, tokensCol, nBands, rowsPerBand)
      .withColumn("_side", lit(0))
      .union(bandedChunkRows(fresh, idCol, tokensCol, nBands, rowsPerBand)
        .withColumn("_side", lit(1)))
    val kept = capBuckets(tagged, Seq("band", "chunk"), maxBucketSize)
    val c = kept.where(col("_side") === 0)
    val f = kept.where(col("_side") === 1)
    f.alias("f")
      .join(c.alias("c"),
        col("f.band") === col("c.band") && col("f.chunk") === col("c.chunk"))
      .select(col(s"f.$idCol").as("id_new"), col(s"c.$idCol").as("id_corpus"))
      .distinct()
  }

  /** Bag-of-words fingerprint dedup: md5 of the sorted distinct token
    * set; returns fingerprint groups with >1 member. Exact-dup detection
    * is the same with fingerprint = md5(normalized text).
    */
  def bowFingerprintDups(docs: DataFrame, idCol: String, tokensCol: String): DataFrame =
    docs.select(col(idCol),
        md5(concat_ws(" ", array_sort(array_distinct(col(tokensCol))))).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("min_id"))
      .where(col("cnt") > 1)

  /** 32-bit SimHash rendered as a '0'/'1' string. Position i's bit is the
    * sign of the majority vote, over the doc's distinct tokens, of the
    * high bit of hex digit i of md5(token): each nibble-high-bit is an
    * independent-ish hash bit, so near-identical token sets land at small
    * Hamming distance. Entirely map-side (no shuffle), built from
    * codegen'd expressions, and engine-portable (md5 is bit-identical
    * everywhere) — the portability constraint that rules out xxhash64.
    */
  def simhash(tokens: Column): Column =
    graft.functions.SimHash32(tokens)

  /** [[simhash]]'s 32 bits packed into a LONG (MSB-first, bit-identical
    * to the string form) — banding becomes shift-and-mask and Hamming
    * distance `bit_count(a ^ b)`, all codegen'd integer ops.
    */
  def simhashBits(tokens: Column): Column =
    graft.functions.SimHashBits32(tokens)

  /** Reference formulation of [[simhash]] out of built-in higher-order
    * functions — same output bit-for-bit; kept as the executable spec
    * the native kernel is tested against (HOFs are CodegenFallback, so
    * this is ~10× slower: md5 is bound to a lambda variable to hash once
    * per token, then per-position ±1 votes are zip-summed).
    */
  def simhashHof(tokens: Column, nBits: Int = 32): Column = {
    val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val contribs = transform(transform(array_distinct(tokens), t => md5(t)), h =>
      transform(sequence(lit(1), lit(nBits)), i =>
        when(h.substr(i, lit(1)).isInCollection(highHex), 1).otherwise(-1)))
    val bitSums = aggregate(contribs,
      array_repeat(lit(0), nBits),
      (acc, arr) => zip_with(acc, arr, (a, b) => a + b))
    concat_ws("", transform(bitSums, s => when(s >= 0, "1").otherwise("0")))
  }

  /** SimHash near-duplicate pairs: band the signature (nBands contiguous
    * chunks), bucket-join docs sharing any band verbatim, then keep pairs
    * within `maxHamming` overall. Same LSH shape as minhash banding —
    * bucket sizes, not corpus size, drive the join fan-out at 100 TB.
    *
    * Runs on the bit-packed LONG signature: band chunks are
    * shift-and-mask, Hamming distance is `bit_count(a ^ b)` — single
    * codegen'd integer ops per candidate pair, replacing the per-
    * character split/zip of the string form (which was the dominant
    * cost of this query, interpreted per pair).
    */
  def simhashNearDups(docs: DataFrame, idCol: String, tokensCol: String,
                      nBands: Int = 4, maxHamming: Int = 3,
                      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val nBits = 32
    val bandLen = nBits / nBands
    val mask = (1L << bandLen) - 1
    val sigs = docs.select(col(idCol), simhashBits(col(tokensCol)).as("sig"))
    // band 0 = most-significant chunk, matching substr(1, bandLen) of
    // the string form
    val chunks = (0 until nBands).map { b =>
      shiftright(col("sig"), (nBands - 1 - b) * bandLen).bitwiseAND(mask)
    }
    val bands = capBuckets(sigs.select(col(idCol), col("sig"),
      posexplode(array(chunks: _*)).as(Seq("band", "chunk"))),
      Seq("band", "chunk"), maxBucketSize)
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Word-bigram shingles (distinct) of a token array column — the n=2
    * case of [[wordShingles]] (native kernel; parity with the HOF spec
    * covered by the wordShingles tests).
    */
  def bigramShingles(tokens: Column): Column = wordShingles(tokens, 2)

  /** Distinct word n-gram shingles (space-joined) of a token array —
    * the unit of n-gram–overlap decontamination checks (flagging
    * training docs that share shingles with an eval/benchmark set).
    * Computed by the native [[graft.functions.WordShingles]] kernel:
    * the HOF form ([[wordShinglesHof]], the executable spec) is
    * CodegenFallback, and the optimizer's inferred explode filters clone
    * it below the projection — ~3 interpreted evaluations per row that
    * dominated the decontamination query.
    */
  def wordShingles(tokens: Column, n: Int): Column = {
    require(n >= 1)
    graft.functions.WordShingles(tokens, n)
  }

  /** Reference formulation of [[wordShingles]] out of built-in
    * higher-order functions — same output bit-for-bit; kept as the
    * executable spec the native kernel is tested against.
    */
  def wordShinglesHof(tokens: Column, n: Int): Column = {
    require(n >= 1)
    val sz = size(tokens)
    when(sz < n, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(1), sz - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(tokens, i + j)): _*))))
  }

  /** Exact bigram-Jaccard verification of CANDIDATE pairs (the step
    * between LSH blocking and clustering): join each (id_a, id_b) pair
    * to its two shingle sets and score the intersection map-side.
    * Cost is O(|candidates|) — never the all-shared-shingle-pairs blowup
    * of [[bigramJaccardPairs]], which is why this is the verify path at
    * corpus scale. Pairs where both shingle sets are empty (sub-bigram
    * docs) get NULL, not a 0/0 ANSI error. Pairs referencing an id
    * absent from `docs` are dropped (inner joins) — candidates must
    * come from the same corpus being verified.
    */
  def verifyJaccard(docs: DataFrame, idCol: String, tokensCol: String,
                    pairs: DataFrame): DataFrame = {
    val sh = docs.select(col(idCol), bigramShingles(col(tokensCol)).as("sh"))
    val scored = pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
    scored.select(col("id_a"), col("id_b"),
      when(col("na") + col("nb") - col("inter") === 0, lit(null).cast("double"))
        .otherwise(col("inter") / (col("na") + col("nb") - col("inter")))
        .as("jaccard"))
  }

  /** Connected components over verified near-dup pairs — the step that
    * turns pairwise dup evidence into dup CLUSTERS with one canonical
    * survivor each: (id, cluster_id, keep) where cluster_id is the
    * smallest member id reachable within `iters` hops and keep marks the
    * cluster representative (the q51 keep-list contract, extended from
    * exact to fuzzy dups).
    *
    * Algorithm: hash-min label propagation. Every doc starts labeled
    * with its own id; each iteration takes the min of its label and its
    * neighbors' labels (one equi-join + one partial-aggregable min — no
    * driver-side edge list, no windows). One iteration spreads the min
    * one hop, so `iters` must reach the component diameter; LSH/SimHash
    * near-dup components are near-cliques (every member pairs with most
    * others), so small bounds converge at any corpus size — q72 uses 3.
    * The edge list is materialized ONCE via `localCheckpoint` before the
    * loop: the pair-generation pipeline upstream (LSH + verification) is
    * typically the dominant cost, and without materialization each
    * iteration's join re-derives it from scratch (measured 3× the whole
    * SRP pipeline on q76 — exchange reuse does NOT rescue repeated
    * subplans across iterations). Labels stay pure-plan (bounded rows per
    * doc); [[nearDupClustersConverged]] also truncates label lineage.
    *
    * @param ids   one row per member of the universe (docs with no pair
    *              become singleton clusters, keep = true)
    * @param pairs (id_a, id_b) verified near-dup pairs
    */
  def nearDupClusters(ids: DataFrame, idCol: String, pairs: DataFrame,
                      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val edges = pairs.select(col("id_a").as("e_src"), col("id_b").as("e_dst"))
      .union(pairs.select(col("id_b").as("e_src"), col("id_a").as("e_dst")))
      .localCheckpoint()
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("label"))
    (1 to iters).foreach { _ =>
      val nbrMin = edges.join(labels, edges("e_dst") === labels("id"))
        .groupBy(col("e_src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      labels = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    }
    labels.select(col("id").as(idCol), col("label").as("cluster_id"),
      (col("id") === col("label")).as("keep"))
  }

  /** [[nearDupClusters]] with pointer doubling and convergence detection
    * — the production form, and the q72/q76 implementation. Each
    * doubling round runs TWO steps:
    *
    *  1. hash-min propagation — take the min of a node's label and its
    *     neighbors' labels (one equi-join + partial-aggregable min), and
    *  2. pointer jump — `label ← label(label)` (one self-join on the
    *     label table): the label a node points to has itself been
    *     chasing the component min, so composing the two pointers
    *     roughly DOUBLES the distance covered per round.
    *
    * Plain hash-min needs O(diameter) rounds — fine for the near-clique
    * components LSH verification produces, but a chained component
    * (A~B~C~… under threshold transitivity, common in web-scale dup
    * graphs) with diameter ≫ the round budget would silently
    * undercluster. With the jump step, per-round hop coverage goes
    * 2, 6, 14, 30, 62, … — O(log D); a 50-hop path labels fully in 5
    * rounds plus one confirming round. At the fixpoint every label
    * provably equals its component's minimum id: labels only ever hold
    * same-component ids and never increase, an un-labeled smaller
    * neighbor would trigger step 1, and the min-id node itself can
    * never be overwritten.
    *
    * Each round materializes exactly one table (the half-step labels,
    * via the `checkpoint`-mode [[graft.operators.Checkpointer]] —
    * local blocks by default, reliable checkpoint or parquet for
    * cluster-grade durability; superseded rounds are released) so
    * the next round reads rows instead of re-deriving the whole lineage
    * — the truncation a long-running 100 TB job needs anyway — and
    * runs one bounded driver-side existence probe (the only driver
    * traffic) to detect the round that changed NO label, up to
    * `maxIters` rounds. Returns (labels, roundsRun).
    */
  def nearDupClustersConverged(ids: DataFrame, idCol: String, pairs: DataFrame,
                               maxIters: Int = 20,
                               checkpoint: graft.operators.CheckpointMode =
                                 graft.operators.CheckpointMode.Local,
                               resume: Boolean = false): (DataFrame, Int) = {
    require(maxIters >= 1, s"maxIters must be positive, got $maxIters")
    // `checkpoint` dials per-iteration durability (see operators.
    // Checkpointer): Local is right for a single node; Reliable/Path
    // survive executor loss on a long cluster run, where lineage
    // truncation otherwise makes one lost executor fatal. Path +
    // `resume = true` survives DRIVER loss too: step 1 = symmetrized
    // edges (never released), step 2 = seed labels, step 2+i = round
    // i's half-step WITH its `_chg` flag. A restart re-enters at the
    // highest committed half-step, replays that round's tail (the
    // convergence probe + lazy pointer jump — both pure functions of
    // the cached half), and continues — bit-identical labels AND round
    // count vs the uninterrupted run (ResumeSpec). Falls back to a
    // fresh run when the dir has no usable frontier.
    val cp = new graft.operators.Checkpointer(checkpoint, "cc")
    val spark = ids.sparkSession
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        for {
          (s, frontier) <- graft.operators.Checkpointer
            .lastCompleteStep(spark, dir, "cc")
          // budget guard (every sibling operator has one): step 2+i is
          // round i's half, so a frontier beyond 2 + maxIters belongs
          // to a LARGER previous budget — serving it would return more
          // rounds than this call allows; fall back to a fresh run
          if s >= 2 && s <= 2 + maxIters
          edgesF <- graft.operators.Checkpointer.completeStep(spark, dir, "cc", 1)
        } yield (s, frontier, edgesF)
      case _ => None
    }
    // superseded iterations release their materialized step (blocks or
    // files) — a long convergence run must not pin every iteration's
    // full label table in storage

    // Per-round cost discipline: exactly ONE materialization (the
    // half-step table — it must exist as rows because the pointer jump
    // self-joins it, and an un-materialized self-join re-derives the
    // whole upstream once per branch: measured 25 shuffles / 0 reuses
    // when fused lazily) and ONE convergence probe, which only reads
    // cached rows: the change flag rides the checkpointed half-step and
    // the jump output stays lazy (a shallow join over the cached table,
    // re-derived cheaply by whoever reads it next).
    // the seed labels materialize too: `ids` may carry an arbitrary
    // upstream pipeline (q72 feeds the tokenization read), and round 1
    // references it in two join branches — un-materialized, a broadcast
    // plan would derive that upstream twice
    val (edges, labels0, prevHalf0, it0, conv0) = resumed match {
      case Some((s, frontier, edgesF)) =>
        val f = cp.resumeAt(s, frontier)
        if (s == 2) (edgesF, f, Option(f), 0, false)
        else {
          // f is round (s−2)'s half-step: replay that round's tail —
          // was it the converging round?
          val c = f.where(col("_chg")).limit(1).isEmpty
          val lab = if (c) f.drop("_chg") else jump(f)
          (edgesF, lab, Option(f), s - 2, c)
        }
      case None =>
        val e = cp.materialize(
          pairs.select(col("id_a").as("e_src"), col("id_b").as("e_dst"))
            .union(pairs.select(col("id_b").as("e_src"), col("id_a").as("e_dst"))))
        val l = cp.materialize(ids.select(col(idCol).as("id"), col(idCol).as("label")))
        (e, l, Option(l), 0, false)
    }
    var labels = labels0
    var prevHalf = prevHalf0
    var it = it0
    var converged = conv0
    while (it < maxIters && !converged) {
      // step 1: hash-min over neighbors, materialized WITH its change flag
      val nbrMin = edges.join(labels, edges("e_dst") === labels("id"))
        .groupBy(col("e_src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val half = cp.materialize( // eager; the only per-round materialization
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
            (col("nbr_label") < col("label")).as("_chg")))
      // convergence probes the HASH-MIN flag alone — one early-exit scan
      // of the just-cached rows. Sound: if no neighbor offered a smaller
      // label, labels are already constant per component (= the min), so
      // the jump below would be a no-op too.
      converged = half.where(col("_chg")).limit(1).isEmpty
      // step 2: pointer jump (label ← label(label)) — lazy over the
      // cached half-step; skipped on the confirming round
      labels = if (converged) half.drop("_chg") else jump(half)
      // the previous round's half-step is dead once this round's is
      // materialized (everything downstream reads the new one)
      prevHalf.foreach(cp.release)
      prevHalf = Some(half)
      it += 1
    }
    (labels.select(col("id").as(idCol), col("label").as("cluster_id"),
      (col("id") === col("label")).as("keep")), it)
  }

  /** The pointer jump (label ← label(label)) over a materialized
    * half-step — lazy: a shallow self-join over cached rows, shared by
    * the live loop and the resume replay.
    */
  private def jump(half: DataFrame): DataFrame =
    half.alias("h")
      .join(half.select(col("id").as("p_id"), col("label").as("p_label")).alias("p"),
        col("h.label") === col("p_id"), "left")
      .select(col("h.id").as("id"),
        least(col("h.label"), coalesce(col("p_label"), col("h.label"))).as("label"))

  /** Pairwise n-gram Jaccard similarity via a shingle inverted-index
    * self-join (only pairs sharing ≥1 shingle ever meet):
    * J = |A∩B| / (|A| + |B| − |A∩B|). Exact integer division → bit-exact.
    *
    * `maxShingleDf` drops shingles shared by more than that many docs
    * before the join (the intersection count then UNDERCOUNTS for pairs
    * whose only overlap was hot shingles — acceptable for candidate
    * generation, NOT for exact Jaccard; the default keeps it exact).
    * The uncapped default is the exact/parity path (q29) and k²-blows
    * up on a hot shingle at scale; the capped variant is the declared
    * 100 TB route and is itself oracle-gated (q137, cap mirrored in
    * SQL, score emitted as `jaccard_lb`).
    */
  def bigramJaccardPairs(docs: DataFrame, idCol: String, tokensCol: String,
                         maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs.select(col(idCol), bigramShingles(col(tokensCol)).as("sh"))
    val sizes = sh.select(col(idCol), size(col("sh")).as("n"))
    val ex = capBuckets(sh.select(col(idCol), explode(col("sh")).as("s")),
      Seq("s"), maxShingleDf)
    val inter = ex.alias("a")
      .join(ex.alias("b"), col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** EXACT Jaccard similarity join at threshold `num/den` via AllPairs
    * prefix filtering (Bayardo, Ma & Srikant, WWW'07) — the scale route
    * for pairwise Jaccard that stays EXACT, unlike the df-cap
    * ([[bigramJaccardPairs]]'s `maxShingleDf`, q137) which turns the
    * score into a lower bound.
    *
    * The filter: fix any global total order on shingles and sort each
    * doc's shingle set by it. If J(A,B) ≥ t then |A∩B| ≥ t·|A∪B| ≥
    * t·|A|, so B must hit one of the first p(A) = |A| − ⌈t·|A|⌉ + 1
    * shingles of A (were the whole intersection confined to A's last
    * ⌈t·|A|⌉ − 1 positions it would be too small) — and symmetrically
    * for B. Indexing ONLY those prefixes therefore loses no qualifying
    * pair: candidates = prefix-table self-join, then exact verification
    * on the full sets. The order used here is ascending global document
    * frequency (ties lexicographic) — the classic heuristic that puts
    * hot shingles LAST, so a boilerplate shingle shared by half the
    * corpus lands in almost no prefix and the k² blow-up that motivates
    * q137's cap never forms, while the result is still bit-for-bit the
    * naive all-pairs answer (the oracle is the NAIVE exact SQL — the
    * prefix filter is invisible in the gate, like q126's salt).
    *
    * Size filter: J ≤ min/max of the two set sizes, so candidate pairs
    * with den·min < num·max are pruned in the join condition (integer
    * cross-product, no float boundary). The threshold itself is tested
    * as `inter·den ≥ num·(na+nb−inter)` on exact ints; the emitted
    * jaccard is one exact int/int IEEE division.
    *
    * Scale shape: one df hash-agg, one per-doc bounded window sort (rank
    * shingles within a doc — partitioned by doc, never corpus-wide),
    * one equi-join on prefix shingles whose fan-out the df ordering
    * keeps near-linear in practice (worst case remains quadratic for a
    * corpus of near-identical docs — which IS the output size then),
    * and O(|candidates|) verification.
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, tokensCol: String,
                         num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold must be a fraction in (0,1], got $num/$den")
    val sh = docs.select(col(idCol), bigramShingles(col(tokensCol)).as("sh"))
      .select(col(idCol), col("sh"), size(col("sh")).as("n"))
      .where(col("n") > 0)
    val ex = sh.select(col(idCol), col("n"), explode(col("sh")).as("s"))
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df"))
    // rank each doc's shingles rare-first; keep the first n - ceil(t*n) + 1
    val w = Window.partitionBy(idCol).orderBy(col("df"), col("s"))
    val prefix = ex.join(dfTab, "s")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("n") - expr(s"(($num * n + ${den - 1}) div $den)") + 1)
      .select(col(idCol), col("n"), col("s"))
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol") &&
          least(col("a.n"), col("b.n")) * den >= greatest(col("a.n"), col("b.n")) * num)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val scored = cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("n").as("na")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        col("na"), col("nb"))
    scored
      .where(col("inter") * den >= lit(num) * (col("na") + col("nb") - col("inter")))
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** Directed shingle CONTAINMENT via the same inverted-index self-join
    * as [[bigramJaccardPairs]]: C(A→B) = |A∩B| / |A|. Asymmetric by
    * design — a short document wholly quoted inside a long one scores
    * C≈1 in that direction while Jaccard (normalized by the union)
    * stays low, which is why sub-document duplication screens use
    * containment, not Jaccard. Emits both directions of every
    * shingle-sharing pair whose containment clears `num/den`
    * (threshold tested as the integer cross-product `inter·den ≥
    * num·|A|` — no float boundary); the emitted `containment` itself is
    * one exact int/int IEEE division.
    *
    * Scale shape: identical to Jaccard — only pairs sharing ≥1 shingle
    * meet (band equi-join on the shingle), `maxShingleDf` caps hot
    * shingles before the join.
    */
  def shingleContainmentPairs(docs: DataFrame, idCol: String, tokensCol: String,
                              num: Int, den: Int,
                              maxShingleDf: Int = Int.MaxValue): DataFrame = {
    require(den > 0 && num >= 0, s"threshold must be a valid fraction, got $num/$den")
    val sh = docs.select(col(idCol), bigramShingles(col(tokensCol)).as("sh"))
    val sizes = sh.select(col(idCol), size(col("sh")).as("n")).where(col("n") > 0)
    val ex = capBuckets(sh.select(col(idCol), explode(col("sh")).as("s")),
      Seq("s"), maxShingleDf)
    val inter = ex.alias("a")
      .join(ex.alias("b"), col("a.s") === col("b.s") && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
      .where(col("inter") * den >= lit(num) * col("na"))
      .select(col("id_a"), col("id_b"), (col("inter") / col("na")).as("containment"))
  }

  /** Merge per-doc n-gram hit POSITIONS into contiguous character-free
    * token spans (gaps-and-islands): two positions belong to one span
    * when their n-gram windows touch or overlap (gap ≤ n). Emits
    * (doc_id, span_start, span_end inclusive token index, n_hits).
    *
    * Scale shape: both windows partition by doc — bounded by a single
    * document's hit count, never corpus-wide. Shared by span
    * decontamination (q73, hits = eval-set matches) and corpus
    * self-dedup (q109, hits = cross-doc duplicated n-grams).
    */
  def mergeSpans(hits: DataFrame, n: Int): DataFrame = {
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hits
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("pos")).over(wPrev) + (n - 1), lit(-2)) + 1,
          lit(1)).otherwise(lit(0)))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_hits"))
  }
}
