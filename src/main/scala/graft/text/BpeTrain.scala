package graft.text

import graft.operators.{CheckpointMode, Checkpointer}
import org.apache.spark.sql.DataFrame
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

  def train(words: DataFrame, wordCol: String, cntCol: String, merges: Int,
            checkpoint: CheckpointMode = CheckpointMode.Local): DataFrame = {
    require(merges >= 1, s"merges must be positive, got $merges")
    val cp = new Checkpointer(checkpoint, "bpe")
    var rep = cp.materialize(words
      .where(length(col(wordCol)) >= 1)
      .select(concat(lit(" "), regexp_replace(col(wordCol), "(.)", "$1  "),
        lit("</w> ")).as("s"),
        col(cntCol).cast("long").as("cnt")))
    var prevRep: Option[DataFrame] = Some(rep)
    var out: Option[DataFrame] = None
    for (r <- 1 to merges) {
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
      val next = cp.materialize(rep.crossJoin(broadcast(top))
        .select(expr(
          "replace(s, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))").as("s"),
          col("cnt")))
      val vocab = next.select(explode(split(trim(col("s")), "  ")).as("sym"))
        .agg(countDistinct("sym").as("vocab_size_after"))
      // 1-row round record — materialized BEFORE the old rep is
      // released (it reads the old rep through `top`)
      val round = cp.materialize(top.crossJoin(vocab)
        .select(lit(r).as("merge_rank"), col("a").as("left_sym"),
          col("b").as("right_sym"), col("c").as("pair_count"),
          col("vocab_size_after")))
      out = Some(out.map(_.union(round)).getOrElse(round))
      prevRep.foreach(cp.release)
      prevRep = Some(next)
      rep = next
    }
    out.get
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
