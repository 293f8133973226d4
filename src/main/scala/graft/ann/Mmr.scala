package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998) — the diversity step between retrieval and a context
  * window: greedily pick k results where each pick maximizes
  * `lambda·rel(c) − (1−lambda)·max_{s∈picked} sim(c, s)`, so a
  * near-duplicate of something already picked is penalized by exactly
  * its similarity to it. This is the RAG-shape complement of the
  * retrieval tiers (q95/q98): retrieval bounds the candidate pool,
  * MMR spends the k-slot budget on non-redundant evidence.
  *
  * Scale shape: every round touches only candidate-pool-sized tables
  * (queries × poolSize rows — the pool is the dial, bounded by the
  * upstream top-k retrieval), so the driver loop is k−1 rounds of
  * candidate-pool algebra, NEVER corpus work: one anti-join (drop
  * picked), one equi-join onto the pairwise-sim table restricted to
  * picked partners, one partial-aggregable MAX, one mergeable argmax.
  * The pairwise-sim table is per-query quadratic in poolSize (10 → 90
  * rows/query) — priced by the pool dial, not the corpus.
  *
  * Determinism & oracle parity: `rel` and `s` must arrive ROUNDED
  * (round 6 — the cosine adjudication), so the score is an identical
  * double tree in any engine; the argmax orders by `2.0 − score`
  * (strictly positive for cosine-range scores: never a −0.0/0.0
  * ordering flip between engines' comparators) with the smallest
  * cand_id breaking ties — ≡ `ORDER BY score DESC, cand_id`. An
  * engine mirroring `1.0 − lambda` must compute it in IEEE double the
  * same way (or use exactly-representable lambda; q151 uses 0.5).
  */
object Mmr {

  /** `cands`: (q_id, cand_id, rel) — the retrieval pool, rel rounded.
    * `sims`: (q_id, id_a, id_b, s) — pairwise candidate cosines within
    * each query's pool, BOTH directions, s rounded.
    * Returns (q_id, pick, cand_id, rel, score) with pick ∈ 1..k; a
    * query whose pool is exhausted before k simply stops picking.
    */
  def rerank(cands: DataFrame, sims: DataFrame, k: Int,
             lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sm = sims.select(col("q_id").as("sq"), col("id_a").as("ia"),
      col("id_b").as("ib"), col("s"))
    var sel = argmaxPick(cands.withColumn("score", col("rel")), 1)
      .localCheckpoint() // re-read by every later round (anti join + partner join)
    for (t <- 2 to k) {
      val selPrev = sel.select(col("q_id").as("pq"), col("cand_id").as("pc"))
      val m = cands
        .join(sel.select("q_id", "cand_id"), Seq("q_id", "cand_id"), "left_anti")
        .join(sm, col("q_id") === col("sq") && col("cand_id") === col("ia"))
        .join(selPrev, col("sq") === col("pq") && col("ib") === col("pc"))
        .groupBy(col("q_id"), col("cand_id"), col("rel"))
        .agg(max(col("s")).as("ms"))
        .select(col("q_id"), col("cand_id"), col("rel"),
          (lit(lambda) * col("rel") - lit(1.0 - lambda) * col("ms"))
            .as("score"))
      sel = sel.unionByName(argmaxPick(m, t)).localCheckpoint()
    }
    sel.select("q_id", "pick", "cand_id", "rel", "score")
  }

  /** Mergeable per-query argmax: min over (2.0 − score, cand_id) —
    * highest score, smallest id on ties, no window, no negated-zero.
    */
  private def argmaxPick(scored: DataFrame, pick: Int): DataFrame =
    scored.groupBy("q_id")
      .agg(min_by(
        struct(col("cand_id"), col("rel"), col("score")),
        struct(lit(2.0) - col("score"), col("cand_id"))).as("w"))
      .select(col("q_id"), lit(pick).as("pick"),
        col("w.cand_id").as("cand_id"), col("w.rel").as("rel"),
        col("w.score").as("score"))
}
