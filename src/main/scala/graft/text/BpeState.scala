package graft.text

import graft.operators.{VersionedModel, VersionedState}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TRAINED BPE tokenizer as durable
  * [[graft.operators.VersionedState]] — the [[QualityModel]] pattern
  * applied to the LAST one-shot trained artifact in the pipeline:
  * q136/q145 prove the merge table trains deterministically, but it
  * re-trained per run, so the tokenizer that every downstream batch
  * must agree on (token counts, budget selection, dedup shingles over
  * subwords) had no stored form, no pinning, and no drift gate. Here a
  * [[fit]] COMMITS the merge table (rank order IS the artifact —
  * encode replays it greedily left-to-right exactly like reference
  * BPE replays its merge file), readers [[encode]] any later batch off
  * the PINNED version (`asOf` — a manifest-cut member like any index),
  * and [[maintain]] turns "did the corpus outgrow the tokenizer?" into
  * a gated verdict (OOV rate above / compression below the dial ⇒
  * BuildNeeded — never a silent vocabulary drift).
  *
  * == State layout ==
  *
  * One versioned-state directory; each version's payload is
  * `merges/` (the full q136 record: merge_rank, left_sym, right_sym,
  * pair_count, vocab_size_after) plus `vocab/` — the serving
  * vocabulary: every distinct symbol of the final training
  * representation UNION every merge product (an intermediate symbol
  * like `lo` inside `low` may be fully merged away in training yet
  * legitimately surface on a held-out word, so merge products count as
  * known). A tokenizer never evolves incrementally — BPE merges are
  * order-sensitive, so every commit is a full retrain — which means no
  * count algebra, no compaction, no base horizon: versions are
  * self-contained, labels are `model` / `model:<id>` (the id
  * replay-guards a retrain exactly like a family refresh; the
  * delivered-id sidecar rides every commit so the guard survives
  * [[gc]], and a replay whose version was gc'd past retention fails
  * LOUDLY).
  *
  * == Scale shape (100 TB) ==
  *
  * Training touches the corpus ONCE (the word-count table is
  * vocabulary-sized); all merge rounds run on that small table
  * ([[BpeTrain]]). The stored artifact is merge-count + vocab-sized
  * (thousands of rows). Encoding a batch is map-side only — the
  * pinned merges fold into a literal-replace chain, zero joins, zero
  * shuffles — and the OOV probe broadcasts the bounded vocab.
  */
object BpeState {

  /** Train `merges` rounds on the (wordCol, cntCol) table and COMMIT
    * the merge table + serving vocabulary as a new version. `deltaId`
    * replay-guards the trainer; the guard, its gc-proof sidecar and
    * the loud past-retention refusal are
    * [[graft.operators.VersionedModel]]'s shared protocol. Old
    * versions stay readable for pinned cuts; bound them with [[gc]].
    */
  def fit(words: DataFrame, wordCol: String, cntCol: String, merges: Int,
          stateDir: String, deltaId: String = ""): Long = {
    val spark = words.sparkSession
    VersionedModel.fitCommit(spark, stateDir, deltaId) { vdir =>
      val table = BpeTrain.train(words, wordCol, cntCol, merges)
        .localCheckpoint() // the commit write AND the vocab derivation read it
      val list = mergeListOf(table)
      // serving vocabulary: final-rep symbols ∪ merge products — ONE
      // extra pass over the vocab-sized word table, not the corpus
      val finalSyms = BpeTrain.encode(
          words.where(length(col(wordCol)) >= 1), wordCol, list)
        .select(explode(col("syms")).as("sym")).distinct()
      val products = list.map { case (a, b) => a + b }
      val vocabDf = finalSyms.unionByName(
          spark.createDataFrame(spark.sparkContext.parallelize(
            products.map(org.apache.spark.sql.Row(_)), 1),
            finalSyms.schema))
        .distinct()
      table.coalesce(1).write.mode("overwrite").parquet(s"$vdir/merges")
      vocabDf.coalesce(1).write.mode("overwrite").parquet(s"$vdir/vocab")
    }
  }

  private def mergeListOf(table: DataFrame): Seq[(String, String)] =
    table.orderBy("merge_rank").select("left_sym", "right_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** The stored merge table (the full q136 record). `asOf` pins a
    * committed version (a manifest cut).
    */
  def mergeTable(spark: SparkSession, stateDir: String,
                 asOf: Option[Long] = None): Option[DataFrame] =
    VersionedModel.pinned(spark, stateDir, asOf).map { n =>
      spark.read.parquet(s"${VersionedState.versionPath(stateDir, n)}/merges")
    }

  /** The stored serving vocabulary (one `sym` column). */
  def vocab(spark: SparkSession, stateDir: String,
            asOf: Option[Long] = None): Option[DataFrame] =
    VersionedModel.pinned(spark, stateDir, asOf).map { n =>
      spark.read.parquet(s"${VersionedState.versionPath(stateDir, n)}/vocab")
    }

  /** The pinned merge list, rank order, driver-side — the bounded
    * artifact an [[encode]] plan bakes in as a literal-replace chain.
    */
  def mergeList(spark: SparkSession, stateDir: String,
                asOf: Option[Long] = None): Seq[(String, String)] =
    mergeListOf(mergeTable(spark, stateDir, asOf).getOrElse(
      throw new IllegalStateException(s"no committed tokenizer at $stateDir")))

  /** Encode a word column under the PINNED merges: map-side only (the
    * merge chain rides as literals — zero joins, zero shuffles), so
    * every batch of the pipeline tokenizes under the SAME vocabulary
    * until a retrain is an explicit versioned event.
    */
  def encode(words: DataFrame, wordCol: String, stateDir: String,
             asOf: Option[Long] = None): DataFrame =
    BpeTrain.encode(words, wordCol,
      mergeList(words.sparkSession, stateDir, asOf))

  /** Drift metrics of a fresh (wordCol, cntCol) batch under the pinned
    * tokenizer — ONE row: (n_words, n_syms, n_oov_syms, oov_rate,
    * compression_ratio). Symbol occurrences weight by the word count;
    * `oov_rate` is the weighted fraction of emitted symbols missing
    * from the serving vocabulary; `compression_ratio` is weighted
    * chars-per-symbol where each word contributes length+1 (the `</w>`
    * boundary) — 1.0 under an untrained tokenizer, rising with merge
    * coverage. Both are exact-int ratios (one IEEE division each), so
    * gates and oracles derive identical numbers.
    */
  def metrics(words: DataFrame, wordCol: String, cntCol: String,
              stateDir: String, asOf: Option[Long] = None): DataFrame = {
    val enc = encode(words.where(length(col(wordCol)) >= 1), wordCol, stateDir,
      asOf)
    val voc = vocab(words.sparkSession, stateDir, asOf).getOrElse(
      throw new IllegalStateException(s"no committed tokenizer at $stateDir"))
    // the char total aggregates at WORD grain (a per-symbol-row weight
    // would replicate each word's chars once per emitted symbol); the
    // OOV side needs the symbol explode — two aggs, one cross of two
    // 1-row frames
    val sym = enc.select(col(cntCol).cast("long").as("cnt"),
        explode(col("syms")).as("sym"))
      .join(broadcast(voc.withColumn("known", lit(1))), Seq("sym"), "left")
      .agg(sum(col("cnt")).as("n_syms"),
        sum(when(col("known").isNull, col("cnt")).otherwise(0L))
          .as("n_oov_syms"))
    val chars = enc.agg(
      sum(col(cntCol).cast("long")
        * (length(col(wordCol)) + 1).cast("long")).as("n_chars"))
    sym.crossJoin(chars)
      .select(col("n_syms"), col("n_oov_syms"),
        (col("n_oov_syms").cast("double") / col("n_syms")).as("oov_rate"),
        (col("n_chars").cast("double") / col("n_syms"))
          .as("compression_ratio"))
  }

  /** Reclaim versions below the newest `keepLast` (pinned cuts must be
    * within the retained window).
    */
  def gc(spark: SparkSession, stateDir: String, keepLast: Int = 2): Unit =
    VersionedModel.gc(spark, stateDir, keepLast)

  /** The runbook as code: tokenize the fresh batch with the STORED
    * merges and gate on vocabulary drift — OOV rate above `maxOovRate`
    * or compression below `minCompression` ⇒ BuildNeeded (the corpus
    * outgrew the tokenizer; retrain with [[fit]] as an explicit
    * versioned event), never a silent drift. An empty batch gates Ok
    * (nothing to tokenize ⇒ nothing drifted).
    */
  def maintain(words: DataFrame, wordCol: String, cntCol: String,
               stateDir: String, maxOovRate: Double,
               minCompression: Double,
               asOf: Option[Long] = None):
      graft.operators.MaintainReport = {
    import graft.operators.{GateVerdict, MaintainReport}
    val spark = words.sparkSession
    val committed = VersionedState.committed(spark, stateDir)
    require(committed.nonEmpty, s"no committed tokenizer at $stateDir")
    val v = asOf.fold(committed.last._1) { a =>
      val sub = committed.filter(_._1 <= a)
      require(sub.nonEmpty, s"no committed tokenizer at $stateDir as of $a")
      sub.last._1
    }
    val m = metrics(words, wordCol, cntCol, stateDir, asOf)
      .select("n_syms", "oov_rate", "compression_ratio").collect()
    // an empty batch aggregates to one all-null row (sum over zero
    // rows), so null and 0 both mean "nothing to tokenize"
    val empty = m.isEmpty || m(0).isNullAt(0) || m(0).getLong(0) == 0L
    val gate =
      if (empty)
        GateVerdict.Ok("fit", "empty batch — nothing to gate on")
      else {
        val (oov, comp) = (m(0).getDouble(1), m(0).getDouble(2))
        if (oov > maxOovRate)
          GateVerdict.BuildNeeded("fit",
            f"OOV rate $oov%.4f > $maxOovRate%.4f — the corpus outgrew " +
              "the vocabulary; retrain with fit()")
        else if (comp < minCompression)
          GateVerdict.BuildNeeded("fit",
            f"compression $comp%.4f < $minCompression%.4f — the merges " +
              "no longer cover the corpus; retrain with fit()")
        else
          GateVerdict.Ok("fit",
            f"OOV $oov%.4f ≤ $maxOovRate%.4f, compression $comp%.4f ≥ " +
              f"$minCompression%.4f")
      }
    MaintainReport(v, replayed = false, compacted = false,
      committed.length, Seq(gate),
      measured = if (empty) Map.empty
        else Map("n_syms" -> m(0).getLong(0).toDouble,
          "oov_rate" -> m(0).getDouble(1),
          "compression_ratio" -> m(0).getDouble(2)))
  }
}
