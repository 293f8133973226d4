package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HyperLogLog

/** HyperBall (Boldi & Vigna 2013, "In-Core Computation of Geometric
  * Centralities with HyperBall"): the neighborhood function
  * N(v, r) = |{u : dist(v, u) ≤ r}| for EVERY vertex at once, carried
  * as one [[HyperLogLog]] sketch per vertex instead of one BFS per
  * vertex. The ball recurrence
  *
  *   B(v, r+1) = B(v, r) ∪ ⋃_{u ∈ N(v)} B(u, r)
  *
  * is pure set union, and union is exactly what HLL registers merge
  * under (register-wise MAX) — so each round is relational algebra:
  * ship every vertex's registers across its edges, then group-max.
  * From the per-round ball sizes come the geometric centralities —
  * [[harmonicCentrality]] sums (N(v,r) − N(v,r−1))/r, the
  * disconnected-safe closeness variant (unreachable vertices
  * contribute 0 instead of an infinite distance).
  *
  * Scale shape: state is one (id, j, mreg) register table bounded by
  * V·min(m, |ball|) rows no matter how large the balls grow — the
  * whole point vs. materializing B(v, r) as vertex sets, which is
  * Θ(V²) on a small-diameter graph (every social/dup graph). Per
  * round: ONE equi-join of the register table against the edge list
  * plus ONE hash aggregation whose MAX partial-aggregates collapse
  * each map side to ≤ m rows per vertex before the exchange. Nothing
  * is collected; the driver never sees a ball.
  *
  * Determinism: registers come from the md5 chain of
  * [[HyperLogLog.register]]/[[HyperLogLog.rank]] over the DECIMAL
  * STRING form of the vertex id, so the whole table — and every
  * estimate derived from it — hash-matches the unrolled DuckDB mirror
  * (q163/q164) bit for bit; the only rounding is `est`'s round(·,6)
  * covering the libm ln of the linear-counting branch.
  *
  * Durability: rides the shared [[graft.operators.Checkpointer]] dial.
  * Unlike the other iterative operators, every round's register table
  * is PART OF THE OUTPUT (the centralities need the whole ball
  * series), so no step is ever released; path-mode `resume = true`
  * re-reads the committed prefix (step 1 = edges, step 2+r = ball r)
  * and recomputes only the missing rounds.
  */
object HyperBall {

  /** One ball-growth round: every vertex's registers ride its OUT
    * edges to the neighbor, then merge with the neighbor's own —
    * register-wise MAX, a mergeable hash agg. (`private[graft]` so
    * PlanQualitySpec can lock the partial-MAX shape of the round
    * itself — the materialization between rounds hides it from the
    * final plan.)
    */
  private[graft] def step(edges: DataFrame, regs: DataFrame): DataFrame =
    edges.join(regs.withColumnRenamed("id", "src"), "src")
      .select(col("dst").as("id"), col("j"), col("mreg"))
      .unionByName(regs)
      .groupBy("id", "j").agg(max("mreg").as("mreg"))

  /** B(v, 0) = {v}: each vertex's single-element sketch. */
  private def seed(nodes: DataFrame, idCol: String, m: Int): DataFrame = {
    val id = col(idCol).cast("long")
    nodes.select(id.as("id"),
        HyperLogLog.register(id.cast("string"), m).as("j"),
        HyperLogLog.rank(id.cast("string")).as("rho"))
      .groupBy("id", "j").agg(max("rho").as("mreg"))
  }

  /** The per-round register tables for r = 0..rounds, in order.
    * `edges` must be directed pairs (src, dst) — pass both directions
    * for an undirected graph; `nodes` must contain every vertex
    * (isolated ones included, or their balls never exist). All rounds
    * stay materialized (they are all output — see class doc).
    *
    * `resume = true` (Path mode only) re-enters a dead run: committed
    * ball steps are read back instead of recomputed, and iteration
    * continues from the highest contiguous one — bit-identical to the
    * uninterrupted run since each round is a pure function of the
    * previous register table (ResumeSpec proves it). A dir whose
    * committed prefix doesn't even contain the seed falls back to a
    * fresh run.
    */
  def registers(nodes: DataFrame, idCol: String, edges: DataFrame, rounds: Int,
                m: Int,
                checkpoint: graft.operators.CheckpointMode =
                  graft.operators.CheckpointMode.Local,
                resume: Boolean = false): Seq[DataFrame] = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val cp = new graft.operators.Checkpointer(checkpoint, "hyperball")
    val spark = nodes.sparkSession
    val resumed: Option[(Seq[DataFrame], DataFrame)] =
      (checkpoint, resume) match {
        case (graft.operators.CheckpointMode.Path(dir), true) =>
          // committed contiguous ball prefix: step 2 = ball 0, 2+r = ball r
          val prefix = (0 to rounds).iterator
            .map(r => graft.operators.Checkpointer
              .completeStep(spark, dir, "hyperball", 2 + r))
            .takeWhile(_.isDefined).flatten.toVector
          if (prefix.isEmpty) None
          else if (prefix.size == rounds + 1) Some((prefix, prefix.last))
          else graft.operators.Checkpointer
            .completeStep(spark, dir, "hyperball", 1) // edges, never released
            .map { _ => (prefix, cp.resumeAt(1 + prefix.size, prefix.last)) }
        case _ => None
      }
    resumed match {
      case Some((prefix, _)) if prefix.size == rounds + 1 => prefix
      case Some((prefix, frontier)) =>
        val dir = checkpoint.asInstanceOf[graft.operators.CheckpointMode.Path].dir
        val e = graft.operators.Checkpointer
          .completeStep(spark, dir, "hyperball", 1).get
        prefix ++ iterate(cp, e, frontier, rounds + 1 - prefix.size)
      case None =>
        val e = cp.materialize(
          edges.select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst")))
        val b0 = cp.materialize(seed(nodes, idCol, m))
        b0 +: iterate(cp, e, b0, rounds)
    }
  }

  /** `n` more rounds from `cur`, materializing (and keeping) each. */
  private def iterate(cp: graft.operators.Checkpointer, edges: DataFrame,
                      cur: DataFrame, n: Int): Seq[DataFrame] = {
    val out = Vector.newBuilder[DataFrame]
    var b = cur
    for (_ <- 1 to n) {
      b = cp.materialize(step(edges, b))
      out += b
    }
    out.result()
  }

  /** The ball-size series: (id, r, v0, n_present, s_hi, s_lo, est) for
    * r = 0..rounds — [[HyperLogLog.estimate]] over each round's
    * registers, stacked. `est` at r is the estimated |B(v, r)|.
    */
  def run(nodes: DataFrame, idCol: String, edges: DataFrame, rounds: Int,
          m: Int,
          checkpoint: graft.operators.CheckpointMode =
            graft.operators.CheckpointMode.Local,
          resume: Boolean = false): DataFrame = {
    val regs = registers(nodes, idCol, edges, rounds, m, checkpoint, resume)
    regs.zipWithIndex.map { case (b, r) =>
      HyperLogLog.estimate(b, Seq("id"), m).withColumn("r", lit(r))
        .select("id", "r", "v0", "n_present", "s_hi", "s_lo", "est")
    }.reduce(_ unionByName _)
  }

  /** Harmonic centrality from a [[run]] ball series:
    * HC(v) = Σ_{r=1..rounds} (N(v,r) − N(v,r−1))/r — each distance-r
    * shell weighted 1/r, estimated from consecutive ball sizes
    * (Boldi & Vigna §3.2). Truncated at `rounds` (exact once r reaches
    * the graph's eccentricity). The sum is a FIXED left-associated
    * expression over the per-round `est` columns (not a float
    * aggregation), so it is bit-identical wherever the `est`s are —
    * and therefore NOT rounded: rounding an already-deterministic
    * double only invites half-way-tie disagreement between engines'
    * round() algorithms (exact-decimal HALF_UP vs float scaling).
    */
  def harmonicCentrality(balls: DataFrame, rounds: Int): DataFrame = {
    val bCols = (0 to rounds).map(r =>
      max(when(col("r") === r, col("est"))).as(s"b$r"))
    val piv = balls.groupBy("id").agg(bCols.head, bCols.tail: _*)
    val hc = (1 to rounds).map { r =>
      (col(s"b$r") - col(s"b${r - 1}")) / lit(r.toDouble)
    }.reduceLeft(_ + _)
    piv.select(col("id"), hc.as("hc"))
  }
}
