package graft.text

import graft.operators.{CheckpointMode, Checkpointer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-training stage of a corpus pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * re-expressed as iterative relational algebra:
  *
  * each merge round is ONE hash aggregation (adjacent-pair counts over
  * the distinct-word table, weighted by word frequency), a 1-row top-1
  * (count desc, then pair lexicographic — fully deterministic), and a
  * map-side merge application with the winning pair broadcast. The
  * corpus itself is touched ONCE (to build the word-count table, which
  * is vocabulary-sized, not corpus-sized); all training rounds run on
  * that small table — the shape that survives 100 TB, where the word
  * table is millions of rows while the corpus is billions.
  *
  * Words are represented as padded symbol strings — `" l  o  w</w> "`,
  * one space at each edge, TWO between symbols — so that applying a
  * merge is a literal (non-regex) `replace` of `" a  b "` with
  * `" ab "`: each match consumes one of the two separator spaces on
  * either side, restoring the invariant, and left-to-right
  * non-overlapping replacement is exactly BPE's greedy merge order.
  * Both engines implement literal `replace` identically, which is what
  * makes the unrolled-CTE oracle bit-exact.
  *
  * Per-round tables are materialized via the shared [[Checkpointer]]
  * (superseded rounds released) — the same durability dial as
  * connected components / k-means / PageRank.
  *
  * @return one row per learned merge: (merge_rank, left_sym, right_sym,
  *         pair_count, vocab_size_after) — the merge table IS the
  *         trained tokenizer artifact, and vocab_size_after pins the
  *         application step (not just the count step) under the oracle.
  */
object BpeTrain {

  /** Pad a word column into the two-space symbol representation. */
  private def padded(wordCol: String): Column =
    concat(lit(" "), regexp_replace(col(wordCol), "(.)", "$1  "), lit("</w> "))

  /** Path-mode resume bookkeeping shared by both trainers: the word
    * table rides checkpointer `tag` (step 1 = initial rep, step r+1 =
    * rep after round r), the per-round merge records ride `tag`-rec
    * (step r = round r's record) and are NEVER released — so after a
    * driver loss the records double as the durable output log. A round
    * writes its rep BEFORE its record, so a complete record r implies
    * a complete rep r+1; the resume frontier is the highest committed
    * record, and an orphan rep whose record never committed is simply
    * overwritten when its round re-runs. Returns (rep frontier,
    * completed rounds, union of completed-round records), or None when
    * the dir has no usable frontier.
    */
  private def resumeState(spark: org.apache.spark.sql.SparkSession,
                          checkpoint: CheckpointMode, resume: Boolean,
                          tag: String, rounds: Int,
                          repCp: Checkpointer, recCp: Checkpointer)
      : Option[(DataFrame, Int, DataFrame)] = (checkpoint, resume) match {
    case (CheckpointMode.Path(dir), true) =>
      Checkpointer.lastCompleteStep(spark, dir, s"$tag-rec")
        .filter { case (r0, _) => r0 <= rounds }
        .flatMap { case (r0, lastRec) =>
          // ONE flat multi-path read of records 1..r0 — a per-step
          // union would nest O(r0) deep and stall the analyzer at the
          // 32k-merge scale this trainer is documented for
          val recsU = Checkpointer.completeSteps(spark, dir, s"$tag-rec", 1, r0)
          val repF = Checkpointer.completeStep(spark, dir, tag, r0 + 1)
          if (repF.isDefined && recsU.isDefined) {
            recCp.resumeAt(r0, lastRec)
            Some((repCp.resumeAt(r0 + 1, repF.get), r0, recsU.get))
          } else None
        }
    case _ => None
  }

  def train(words: DataFrame, wordCol: String, cntCol: String, merges: Int,
            checkpoint: CheckpointMode = CheckpointMode.Local,
            resume: Boolean = false): DataFrame = {
    require(merges >= 1, s"merges must be positive, got $merges")
    val repCp = new Checkpointer(checkpoint, "bpe")
    val recCp = new Checkpointer(checkpoint, "bpe-rec")
    val resumed = resumeState(words.sparkSession, checkpoint, resume,
      "bpe", merges, repCp, recCp)
    var (rep, done, out) = resumed match {
      case Some((repF, r0, recU)) => (repF, r0, Option(recU))
      case None =>
        (repCp.materialize(words
          .where(length(col(wordCol)) >= 1)
          .select(padded(wordCol).as("s"), col(cntCol).cast("long").as("cnt"))),
          0, Option.empty[DataFrame])
    }
    var prevRep: Option[DataFrame] = Some(rep)
    for (r <- done + 1 to merges) {
      val syms = split(trim(col("s")), "  ")
      // a fully-merged word (one symbol left) contributes no pairs —
      // without the guard, sequence(0, -1) counts DOWN in Spark and
      // get() past the end mints null pseudo-pairs
      val pairs = rep.where(size(syms) >= 2).select(col("cnt"),
        explode(transform(sequence(lit(0), size(syms) - 2),
          i => struct(get(syms, i).as("a"), get(syms, i + 1).as("b")))).as("p"))
      // the round's winning pair: one hash agg + a 1-row TakeOrdered
      val top = pairs.groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
      // merge application: map-side literal replace, winner broadcast
      val next = repCp.materialize(rep.crossJoin(broadcast(top))
        .select(expr(
          "replace(s, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))").as("s"),
          col("cnt")))
      val vocab = next.select(explode(split(trim(col("s")), "  ")).as("sym"))
        .agg(countDistinct("sym").as("vocab_size_after"))
      // 1-row round record — materialized BEFORE the old rep is
      // released (it reads the old rep through `top`)
      val round = recCp.materialize(top.crossJoin(vocab)
        .select(lit(r).as("merge_rank"), col("a").as("left_sym"),
          col("b").as("right_sym"), col("c").as("pair_count"),
          col("vocab_size_after")))
      out = Some(out.map(_.union(round)).getOrElse(round))
      prevRep.foreach(repCp.release)
      prevRep = Some(next)
      rep = next
    }
    out.get
  }

  /** Batched-merge BPE training — the scale fix for [[train]]'s
    * sequential-round ceiling: a production 32k-merge vocabulary as 32k
    * one-merge Spark jobs dies on job-scheduling wall-clock, not data.
    * Here each round still runs ONE pair-count hash aggregation over
    * the vocab-sized word table, but learns up to `batch` merges:
    * take the top-`batch` candidates (count desc, then pair
    * lexicographic), greedily KEEP each candidate in rank order unless
    * it shares a symbol with an already-KEPT pick of this round (the
    * q145 oracle unrolls the greedy chain as one NOT-EXISTS CTE per
    * rank), and apply the survivors in one literal-replace chain in
    * rank order. Survivors are pairwise symbol-disjoint by
    * construction, so their replaces cannot consume each other's
    * separators; symbols minted by an earlier replace in the chain are
    * only ever re-merged in a LATER round, exactly like sequential BPE.
    *
    * `rounds` is fixed (so the oracle's unrolled-CTE structure is
    * data-independent); the learned-merge count per round is
    * data-dependent (1..batch). `batch = 1` degenerates EXACTLY to
    * [[train]] with `merges = rounds` — BpeSpec proves bit-identical
    * output. The ≤batch-row round winners ride the driver as a bounded
    * model artifact (the q138 stored-model pattern), which also makes
    * the apply step a pure map-side expression — no join at all.
    *
    * Emits one row per learned merge: (merge_rank — global, in learn
    * order —, left_sym, right_sym, pair_count — the count at the
    * round's start; for batch-mates past rank 1 it is not recounted
    * after earlier merges of the same round, that is the documented
    * batch semantics —, vocab_size_after — measured after the whole
    * round's chain; batch-mates share it).
    */
  def trainBatched(words: DataFrame, wordCol: String, cntCol: String,
                   rounds: Int, batch: Int,
                   checkpoint: CheckpointMode = CheckpointMode.Local,
                   resume: Boolean = false): DataFrame =
    trainBatchedWithDiag(words, wordCol, cntCol, rounds, batch,
      checkpoint, resume)._1

  /** [[trainBatched]] plus its per-round conflict diagnostic — the SRP
    * `candidate_fraction` pattern for batched BPE: the effective batch
    * is data-dependent (1..batch), and at batch = 32+ on a real corpus
    * the greedy conflict drop can collapse rounds back toward
    * sequential with no visibility. The second frame has one row per
    * round run: (round, n_candidates — the ≤ batch candidate window —,
    * n_kept — survivors of the greedy drop —, n_dropped). Zero extra
    * Spark work: both counts are already driver-side values (the
    * candidate window is the collected bounded model artifact).
    * On a resumed run the diagnostic covers only the rounds THIS
    * invocation executed — the pre-crash rounds' windows died with the
    * previous driver (their learned merges are durable; their
    * candidate counts were never part of the artifact).
    */
  def trainBatchedWithDiag(words: DataFrame, wordCol: String, cntCol: String,
                           rounds: Int, batch: Int,
                           checkpoint: CheckpointMode = CheckpointMode.Local,
                           resume: Boolean = false): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    require(batch >= 1, s"batch must be positive, got $batch")
    val spark = words.sparkSession
    import spark.implicits._
    val repCp = new Checkpointer(checkpoint, "bpeb")
    val recCp = new Checkpointer(checkpoint, "bpeb-rec")
    val resumed = resumeState(spark, checkpoint, resume, "bpeb", rounds,
      repCp, recCp)
    var (rep, done, out) = resumed match {
      case Some((repF, r0, recU)) => (repF, r0, Option(recU))
      case None =>
        (repCp.materialize(words
          .where(length(col(wordCol)) >= 1)
          .select(padded(wordCol).as("s"), col(cntCol).cast("long").as("cnt"))),
          0, Option.empty[DataFrame])
    }
    // global merge_rank continues where the recovered records left off
    // (their union is bounded: ≤ batch rows per completed round)
    var learned = out.map(_.agg(max("merge_rank")).collect()(0).getInt(0)).getOrElse(0)
    var prevRep: Option[DataFrame] = Some(rep)
    val diag = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (r <- done + 1 to rounds) {
      val syms = split(trim(col("s")), "  ")
      val pairs = rep.where(size(syms) >= 2).select(col("cnt"),
        explode(transform(sequence(lit(0), size(syms) - 2),
          i => struct(get(syms, i).as("a"), get(syms, i + 1).as("b")))).as("p"))
      // the round's candidate window: ≤ batch rows — a bounded model
      // artifact, collected like q138's merge list
      val topB = pairs.groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(batch)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // greedy conflict drop: keep in rank order unless the candidate
      // shares a symbol with an already-KEPT pick (a dropped candidate
      // blocks nothing)
      val kept = topB.foldLeft(Vector.empty[(String, String, Long)]) {
        case (acc, (a, b, c)) =>
          if (acc.exists { case (x, y, _) =>
            x == a || x == b || y == a || y == b }) acc
          else acc :+ ((a, b, c))
      }
      diag += ((r, topB.length.toLong, kept.length.toLong))
      if (kept.nonEmpty) {
        val applied = kept.foldLeft(col("s")) { case (s, (a, b, _)) =>
          replace(s, lit(s" $a  $b "), lit(s" $a$b "))
        }
        val next = repCp.materialize(rep.select(applied.as("s"), col("cnt")))
        val vocab = next.select(explode(split(trim(col("s")), "  ")).as("sym"))
          .agg(countDistinct("sym").as("vocab_size_after"))
        val recs = kept.zipWithIndex.map { case ((a, b, c), i) =>
          (learned + i + 1, a, b, c)
        }.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
        val round = recCp.materialize(recs.crossJoin(vocab))
        learned += kept.length
        out = Some(out.map(_.union(round)).getOrElse(round))
        prevRep.foreach(repCp.release)
        prevRep = Some(next)
        rep = next
      }
    }
    (out.getOrElse(throw new IllegalStateException(
      "trainBatched: no mergeable pair in any round (corpus fully merged?)")),
      diag.toSeq.map { case (r, c, k) => (r, c, k, c - k) }
        .toDF("round", "n_candidates", "n_kept", "n_dropped"))
  }

  /** SERVE side of the trained tokenizer: apply a learned merge list
    * (rank order — the artifact [[train]] emits) to a word column,
    * yielding the subword symbol array per word. The merge table is a
    * bounded model artifact (hundreds to tens of thousands of rows in
    * real tokenizers), so it folds into a map-side literal-replace
    * chain — zero joins, zero shuffles, applies to held-out words the
    * trainer never saw exactly like the reference BPE algorithm
    * (merges replayed in rank order, greedy left-to-right each).
    */
  def encode(words: DataFrame, wordCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val padded = concat(lit(" "), regexp_replace(col(wordCol), "(.)", "$1  "),
      lit("</w> "))
    val applied = merges.foldLeft(padded) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    words.withColumn("syms", split(trim(applied), "  "))
  }
}
