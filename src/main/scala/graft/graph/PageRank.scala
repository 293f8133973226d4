package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the second iterative graph
  * primitive next to `Dedup.nearDupClustersConverged`'s connected
  * components: authority scoring of documents inside a near-dup /
  * citation / link graph (e.g. pick the canonical page of a dup
  * cluster by rank rather than by min id).
  *
  * Each iteration is one equi-join + one hash aggregation:
  * contribution of u→v is rank(u)/outdeg(u), and
  * rank'(v) = (1−d)/N + d·Σ contributions. Dangling nodes (no out
  * edges) keep receiving the teleport term but redistribute nothing —
  * the standard simplification, mirrored verbatim by the SQL oracle.
  * N rides a one-row broadcast (never a driver-side count); each
  * iteration's rank table is materialized (checkpoint-mode dial —
  * local blocks, reliable checkpoint, or parquet) so a deep run
  * re-reads |V| rows instead of re-deriving the whole lineage (the
  * kmeans-iteration lesson), and superseded iterations are released.
  *
  * Float determinism: per-node contribution sums are order-dependent,
  * so callers round the EMITTED rank (6 decimals) — intermediate ulps
  * are ~1e-15 relative, far below the rounding granularity.
  */
object PageRank {

  /** Ranks after `iters` rounds from a uniform start. `nodes` must
    * have one `id` column; `edges` (src, dst) are directed — pass both
    * directions for an undirected graph. Returns (id, rank).
    *
    * `resume = true` (Path mode only) re-enters a previous run's
    * checkpoint dir after a driver loss: step 1 = ids, step 2 =
    * adjacency (never released), step 3+i = ranks after iteration i.
    * The restart picks up at the highest COMMITTED rank step (an
    * uncommitted in-flight step is ignored and overwritten) and runs
    * only the remaining iterations — bit-identical to the
    * uninterrupted run, since each iteration is a pure function of the
    * previous rank table (CheckpointModeSpec proves it). Falls back to
    * a fresh run when the dir has no usable frontier.
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int,
          damping: Double = 0.85,
          checkpoint: graft.operators.CheckpointMode =
            graft.operators.CheckpointMode.Local,
          resume: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    // `checkpoint` dials per-iteration durability (operators.
    // Checkpointer): Reliable/Path make a deep cluster run survive
    // executor loss after lineage truncation; Path + resume survives
    // driver loss too.
    val cp = new graft.operators.Checkpointer(checkpoint, "pagerank")
    val spark = nodes.sparkSession
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        for {
          (s, frontier) <- graft.operators.Checkpointer
            .lastCompleteStep(spark, dir, "pagerank")
          if s >= 3 && s <= 3 + iters
          idsF <- graft.operators.Checkpointer.completeStep(spark, dir, "pagerank", 1)
          adjF <- graft.operators.Checkpointer.completeStep(spark, dir, "pagerank", 2)
        } yield (s, frontier, idsF, adjF)
      case _ => None
    }
    resumed match {
      case Some((s, frontier, _, _)) if s == 3 + iters =>
        frontier // previous run already finished all requested rounds
      case Some((s, frontier, idsF, adjF)) =>
        iterate(cp, idsF, adjF, cp.resumeAt(s, frontier),
          rounds = iters - (s - 3), damping)
      case None =>
        val ids = cp.materialize(nodes.select(col(nodes.columns.head).as("id")))
        val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("n")))
        val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
        // (src, dst, outdeg) materialized once — every iteration joins it
        val adj = cp.materialize(edges.select(col("src"), col("dst"))
          .join(deg, col("src") === col("id")).drop("id"))
        val rank0 = cp.materialize(ids.crossJoin(nRow)
          .select(col("id"), (lit(1.0) / col("n")).as("rank")))
        iterate(cp, ids, adj, rank0, rounds = iters, damping)
    }
  }

  /** WEIGHTED PageRank — the TextRank form (Mihalcea & Tarau, EMNLP
    * 2004): contribution of u→v is rank(u)·w(u,v)/W(u) with W(u) the
    * sum of u's outgoing edge weights, so heavily co-occurring
    * neighbors pull proportionally more mass than rare ones (the
    * unweighted [[run]] treats a 1000-count edge and a 1-count edge
    * identically). `edges` must carry (src, dst, w) with w > 0: edges
    * with NULL or non-positive weight are FILTERED before the
    * adjacency is built (a zero-ΣW source would otherwise divide its
    * mass by zero and silently vanish it — distinct from the
    * documented dangling-node semantics — and mixed-sign weights make
    * the fixpoint unbounded); a node all of whose out-edges are
    * dropped becomes an ordinary dangling node. Pass both
    * directions for an undirected graph. Same per-iteration shape as
    * [[run]] — one equi-join + one hash agg, W(u) folded into the
    * materialized adjacency — and the same float discipline: callers
    * round the EMITTED rank (6 decimals).
    *
    * Path-mode resume mirrors [[run]]: step 1 = ids, step 2 =
    * weighted adjacency (never released), step 3+i = ranks after
    * iteration i.
    */
  def runWeighted(nodes: DataFrame, edges: DataFrame, iters: Int,
                  damping: Double = 0.85,
                  checkpoint: graft.operators.CheckpointMode =
                    graft.operators.CheckpointMode.Local,
                  resume: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val cp = new graft.operators.Checkpointer(checkpoint, "pagerank-w")
    val spark = nodes.sparkSession
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        for {
          (s, frontier) <- graft.operators.Checkpointer
            .lastCompleteStep(spark, dir, "pagerank-w")
          if s >= 3 && s <= 3 + iters
          idsF <- graft.operators.Checkpointer.completeStep(spark, dir, "pagerank-w", 1)
          adjF <- graft.operators.Checkpointer.completeStep(spark, dir, "pagerank-w", 2)
        } yield (s, frontier, idsF, adjF)
      case _ => None
    }
    resumed match {
      case Some((s, frontier, _, _)) if s == 3 + iters => frontier
      case Some((s, frontier, idsF, adjF)) =>
        iterateWeighted(cp, idsF, adjF, cp.resumeAt(s, frontier),
          rounds = iters - (s - 3), damping)
      case None =>
        val ids = cp.materialize(nodes.select(col(nodes.columns.head).as("id")))
        val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("n")))
        // w > 0 enforced here (see scaladoc): drops NULL/zero/negative
        // weights so wsum is strictly positive for every surviving src
        val posEdges = edges.where(col("w") > 0)
        val ws = posEdges.groupBy(col("src").as("id"))
          .agg(sum(col("w")).cast("double").as("wsum"))
        val adj = cp.materialize(posEdges.select(col("src"), col("dst"), col("w"))
          .join(ws, col("src") === col("id")).drop("id"))
        val rank0 = cp.materialize(ids.crossJoin(nRow)
          .select(col("id"), (lit(1.0) / col("n")).as("rank")))
        iterateWeighted(cp, ids, adj, rank0, rounds = iters, damping)
    }
  }

  private def iterateWeighted(cp: graft.operators.Checkpointer, ids: DataFrame,
                              adj: DataFrame, rank0: DataFrame, rounds: Int,
                              damping: Double): DataFrame = {
    val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("n")))
    var rank = rank0
    var prev: Option[DataFrame] = Some(rank)
    for (_ <- 1 to rounds) {
      val contrib = adj.join(rank, adj("src") === rank("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") * col("w") / col("wsum")).as("c"))
      rank = cp.materialize(ids.join(contrib, Seq("id"), "left").crossJoin(nRow)
        .select(col("id"),
          ((lit(1.0) - damping) / col("n")
            + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
      prev.foreach(cp.release)
      prev = Some(rank)
    }
    rank
  }

  /** PERSONALIZED PageRank (Page et al. 1999 §6; the random walk
    * restarts into a seed set instead of teleporting uniformly):
    * rank'(v) = (1−d)·p0(v) + d·Σ contributions, with p0 = 1/|seeds|
    * on the seed ids and 0 elsewhere — so rank mass concentrates on
    * the seeds' neighborhood and the result ranks every node by
    * multi-hop relatedness TO THE SEEDS (the "expand this labeled set
    * / find docs like these" primitive single-source BFS can't give:
    * PPR weighs all paths, not just shortest ones). Same per-iteration
    * shape as [[run]] — one equi-join + one hash agg — plus a join
    * against the materialized teleport table instead of the uniform
    * 1-row broadcast. Seeds must be a subset of `nodes` (mass is
    * normalized over the seed table as given).
    *
    * Path-mode resume mirrors [[run]]: step 1 = teleport table,
    * step 2 = adjacency (both never released), step 3+i = ranks after
    * iteration i.
    */
  def runPersonalized(nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
                      iters: Int, damping: Double = 0.85,
                      checkpoint: graft.operators.CheckpointMode =
                        graft.operators.CheckpointMode.Local,
                      resume: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val cp = new graft.operators.Checkpointer(checkpoint, "ppr")
    val spark = nodes.sparkSession
    val resumed = (checkpoint, resume) match {
      case (graft.operators.CheckpointMode.Path(dir), true) =>
        for {
          (s, frontier) <- graft.operators.Checkpointer
            .lastCompleteStep(spark, dir, "ppr")
          if s >= 3 && s <= 3 + iters
          teleF <- graft.operators.Checkpointer.completeStep(spark, dir, "ppr", 1)
          adjF <- graft.operators.Checkpointer.completeStep(spark, dir, "ppr", 2)
        } yield (s, frontier, teleF, adjF)
      case _ => None
    }
    resumed match {
      case Some((s, frontier, _, _)) if s == 3 + iters => frontier
      case Some((s, frontier, teleF, adjF)) =>
        iteratePersonalized(cp, teleF, adjF, cp.resumeAt(s, frontier),
          rounds = iters - (s - 3), damping)
      case None =>
        val sRow = broadcast(seeds.agg(count(lit(1)).cast("double").as("ns")))
        val tele = cp.materialize(nodes.select(col(nodes.columns.head).as("id"))
          .join(seeds.select(col(seeds.columns.head).as("id"),
            lit(1).as("_s")), Seq("id"), "left")
          .crossJoin(sRow)
          .select(col("id"), when(col("_s").isNotNull, lit(1.0) / col("ns"))
            .otherwise(lit(0.0)).as("p0")))
        val adj = {
          val deg = edges.groupBy(col("src").as("id"))
            .agg(count(lit(1)).as("outdeg"))
          cp.materialize(edges.select(col("src"), col("dst"))
            .join(deg, col("src") === col("id")).drop("id"))
        }
        val rank0 = cp.materialize(
          tele.select(col("id"), col("p0").as("rank")))
        iteratePersonalized(cp, tele, adj, rank0, rounds = iters, damping)
    }
  }

  /** [[iterate]] with a per-node teleport table instead of the uniform
    * 1-row broadcast; the teleport join keys on id, so Catalyst
    * shuffles it once and reuses the partitioning.
    */
  private def iteratePersonalized(cp: graft.operators.Checkpointer,
                                  tele: DataFrame, adj: DataFrame,
                                  rank0: DataFrame, rounds: Int,
                                  damping: Double): DataFrame = {
    var rank = rank0
    var prev: Option[DataFrame] = Some(rank)
    for (_ <- 1 to rounds) {
      val contrib = adj.join(rank, adj("src") === rank("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      rank = cp.materialize(tele.join(contrib, Seq("id"), "left")
        .select(col("id"),
          ((lit(1.0) - damping) * col("p0")
            + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
      prev.foreach(cp.release)
      prev = Some(rank)
    }
    rank
  }

  /** The power-iteration loop proper, from an arbitrary starting rank
    * table — shared by fresh runs (uniform start) and resumed runs
    * (the recovered frontier).
    */
  private def iterate(cp: graft.operators.Checkpointer, ids: DataFrame,
                      adj: DataFrame, rank0: DataFrame, rounds: Int,
                      damping: Double): DataFrame = {
    val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("n")))
    var rank = rank0
    var prev: Option[DataFrame] = Some(rank)
    for (_ <- 1 to rounds) {
      val contrib = adj.join(rank, adj("src") === rank("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      rank = cp.materialize(ids.join(contrib, Seq("id"), "left").crossJoin(nRow)
        .select(col("id"),
          ((lit(1.0) - damping) / col("n")
            + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
      prev.foreach(cp.release)
      prev = Some(rank)
    }
    rank
  }
}
