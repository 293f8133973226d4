package graft

import graft.text.BpeTrain

class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("BPE learns the hand-computed merge sequence, tie broken lexicographically") {
    // words: ab x3, abc x2
    //   round 1 pairs: (a,b)=5, (b,</w>)=3, (b,c)=2, (c,</w>)=2 → merge (a,b)
    //   round 2 pairs: (ab,</w>)=3, (ab,c)=2, (c,</w>)=2        → merge (ab,</w>)
    //   round 3 pairs: (ab,c)=2, (c,</w>)=2 — TIE on count; the
    //     lexicographic tie-break picks ("ab","c") since 'a' < 'c'
    val words = Seq(("ab", 3L), ("abc", 2L)).toDF("word", "cnt")
    val got = BpeTrain.train(words, "word", "cnt", merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got === Seq(
      (1, "a", "b", 5L, 3L),      // vocab after: {ab, c, </w>}
      (2, "ab", "</w>", 3L, 4L),  // vocab after: {ab</w>, ab, c, </w>}
      (3, "ab", "c", 2L, 3L)))    // vocab after: {ab</w>, abc, </w>}
  }

  test("greedy left-to-right application: overlapping pair occurrences don't double-merge") {
    // "aaa" = a a a </w>: pair (a,a) occurs at positions 0-1 and 1-2 but
    // the count is per-adjacency (2); applying the merge consumes
    // non-overlapping occurrences left-to-right → aa a </w>, NOT aa aa
    val words = Seq(("aaa", 1L)).toDF("word", "cnt")
    val got = BpeTrain.train(words, "word", "cnt", merges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // round 1: (a,a)=2 wins over (a,</w>)=1; after: [aa, a, </w>] → vocab 3
    // round 2: pairs (aa,a)=1, (a,</w>)=1 — tie; ("a","</w>") < ("aa","a")
    //   lexicographically ('a...' then "</w>" vs "a"): "a"=="a" prefix —
    //   "a" < "aa" → winner (a, </w>); after: [aa, a</w>] → vocab 2
    assert(got === Seq(
      (1, "a", "a", 2L, 3L),
      (2, "a", "</w>", 1L, 2L)))
  }

  test("encode replays merges in rank order on words the trainer never saw") {
    // merges learned in test 1; "abd" is held-out: (a,b) applies, then
    // (ab,</w>) finds no adjacency (d intervenes) and (ab,c) no c —
    // exactly reference BPE's merge-file replay
    val merges = Seq(("a", "b"), ("ab", "</w>"), ("ab", "c"))
    val held = Seq(("abd", 1L), ("ab", 2L), ("cab", 3L)).toDF("word", "cnt")
    val got = BpeTrain.encode(held, "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(got("abd") === List("ab", "d", "</w>"))
    assert(got("ab") === List("ab</w>"))           // both merges chain
    // c a b </w> → (a,b) → c ab </w> → (ab,</w>) → c ab</w>
    assert(got("cab") === List("c", "ab</w>"))
  }

  test("batched(batch=1) is bit-identical to sequential train") {
    // mixed corpus with ties and chained merges — exercises the
    // tie-break and the round-to-round recount the batch window skips
    val words = Seq(("ab", 3L), ("abc", 2L), ("aaa", 1L), ("cab", 2L))
      .toDF("word", "cnt")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val seqRows = rows(BpeTrain.train(words, "word", "cnt", merges = 4))
    val batRows = rows(BpeTrain.trainBatched(words, "word", "cnt",
      rounds = 4, batch = 1))
    assert(batRows === seqRows,
      "a batch window of 1 must degenerate exactly to sequential BPE")
  }

  test("batched round drops candidates sharing a symbol with a higher-ranked one") {
    // round-1 pair counts over {ab x5, bc x3, cd x2}:
    //   (a,b)=5 rk1, (b,</w>)=5 rk2 (shares b with rk1 → DROPPED),
    //   (b,c)=3 rk3 (shares b → DROPPED), (c,</w>)=3 rk4 (shares
    //   nothing with rk1 → KEPT; dropped rk2/rk3 don't block it)
    val words = Seq(("ab", 5L), ("bc", 3L), ("cd", 2L)).toDF("word", "cnt")
    val got = BpeTrain.trainBatched(words, "word", "cnt", rounds = 1, batch = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ===
      Seq((1, "a", "b", 5L), (2, "c", "</w>", 3L)),
      s"conflict rule must judge against KEPT picks only — dropped " +
        s"higher-ranked candidates block nothing; got $got")
    // vocab after the round's one replace chain, shared by batch-mates
    assert(got.map(_._5).distinct.size === 1)
  }

  test("conflict diagnostic reports per-round candidate/kept/dropped counts") {
    // same fixture as the conflict-drop test: round 1 sees 4 candidates
    // ((a,b)=5, (b,</w>)=5, (b,c)=3, (c,</w>)=3), keeps 2, drops 2
    val words = Seq(("ab", 5L), ("bc", 3L), ("cd", 2L)).toDF("word", "cnt")
    val (_, diag) = BpeTrain.trainBatchedWithDiag(words, "word", "cnt",
      rounds = 1, batch = 4)
    val got = diag.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((1, 4L, 2L, 2L)),
      s"diag must expose the round's effective batch; got $got")
  }

  test("single-char words still train (word → char + end marker)") {
    val words = Seq(("x", 4L), ("y", 1L)).toDF("word", "cnt")
    val got = BpeTrain.train(words, "word", "cnt", merges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("x", "</w>", 4L, 3L))) // vocab {x</w>, y, </w>}
  }
}
