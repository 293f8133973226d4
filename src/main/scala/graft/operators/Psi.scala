package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population stability index over bucket counter tables — the
  * industry-standard "has the scored population shifted?" drift number
  * (conventional gates: < 0.1 stable, 0.1–0.25 watch, > 0.25 act).
  *
  * Input is a (bucket, n_ref, n_cur) counter relation — which is why
  * this is an operator and not just a query: the same computation runs
  * over a batch split (q213), over two independently-built histograms,
  * or straight off LIVE streaming histogram state (the weighted-KS /
  * live-MAD residency pattern — StreamingSpec proves live ≡ batch).
  *
  * Exactness: each bin term (p_i − q_i)·ln(p_i/q_i) takes its ln over
  * the RATIO OF RATIOS (n_ref/nr)/(n_cur/nc) — each division a single
  * correctly-rounded IEEE op both engines share, so the ln argument is
  * bit-identical cross-engine AND overflow-free at any count (the
  * cross-multiplied integer form n_ref·nc wraps a long silently past
  * ~3e9 counts per side, exactly the live-streaming-state scale this
  * operator advertises) — and nano-scales to a long immediately (the
  * q166 discipline), so the total is an exact order-free sum. Bins
  * with one-sided support get NULL terms but their MASS rides every
  * output row — silently excluding mass is how PSI lies.
  */
object Psi {

  /** (bucket, n_ref, n_cur) → per-bucket rows plus (psi_total,
    * one_sided_mass) repeated on each: the per-bin attribution AND the
    * gate number in one relation. Counter-table algebra only.
    */
  def fromCounters(c0: DataFrame, bCol: String, refCol: String,
                   curCol: String): DataFrame = {
    val c = c0.select(col(bCol).as("bucket"), col(refCol).cast("long").as("n_ref"),
        col(curCol).cast("long").as("n_cur"))
      .localCheckpoint() // totals AND per-bin terms read it
    val tot = c.agg(sum("n_ref").as("nr"), sum("n_cur").as("nc"))
    val t = c.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round((col("n_ref").cast("double") / col("nr")
              - col("n_cur").cast("double") / col("nc"))
            * log((col("n_ref").cast("double") / col("nr"))
              / (col("n_cur").cast("double") / col("nc")))
            * lit(1000000000.0)).cast("long"))
          .otherwise(lit(null).cast("long")).as("term_nanos"))
      .localCheckpoint() // the global sum AND the row output read it
    val ps = t.agg(
      sum(coalesce(col("term_nanos"), lit(0L))).as("psi_nanos"),
      sum(when(col("term_nanos").isNull, col("n_ref") + col("n_cur"))
        .otherwise(lit(0L))).as("one_sided_mass"))
    t.crossJoin(broadcast(ps))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("term_nanos"),
        (col("psi_nanos").cast("double") / lit(1000000000.0)).as("psi_total"),
        col("one_sided_mass"))
  }
}
