package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ — the production ANN index layout (FAISS's default at
  * billion scale): a coarse quantizer routes each vector to its
  * nearest bucket, and product quantization encodes the RESIDUAL
  * (vector − bucket centroid), which is far better-conditioned than
  * the raw vector (residual norms are bucket-radius-sized, so the
  * same k-entry codebooks spend their resolution where vectors
  * actually are). A query probes its `nprobe` nearest buckets; in
  * each, its residual w.r.t. THAT bucket's centroid drives an ADC
  * table, because candidate codes encode residuals from their own
  * bucket.
  *
  * Scale shape (100 TB): the coarse table is bucket-count-sized
  * (broadcast); routing is one broadcast join + mergeable min-struct
  * argmin; the code table is the only corpus-sized artifact (m bytes
  * per vector); search touches only probed buckets' codes via an
  * equi-join on bucket id — the inverted-file pruning — and reduces
  * with the partial-aggregable top-k. Raw candidate vectors are never
  * read at query time.
  */
object IvfPq {

  /** Coarse routing + residuals: (id, bid, rv) — per vector, its L2-
    * nearest centroid (ties to smaller bid) and the per-element double
    * residual. `centroids`: (bid, bvec).
    */
  def residuals(emb: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val best = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .groupBy("id")
      .agg(min(struct(Pq.sqdist(col("v"), col("bvec")).as("d2"), col("bid")))
        .as("b"))
      .select(col("id"), col("b.bid").as("bid"))
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(best, "id").join(broadcast(centroids), "bid")
      .select(col("id"), col("bid"),
        zip_with(col("v"), col("bvec"),
          (x, y) => x.cast("double") - y.cast("double")).as("rv"))
  }

  /** Query-side probe list: (q_id, bid, rv) for the `nprobe` nearest
    * buckets per query — one row per probed bucket, each with the
    * residual w.r.t. that bucket's centroid.
    */
  def probeResiduals(queries: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be positive, got $nprobe")
    queries.select(col(idCol).as("q_id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("q_id"), col("bid"), col("v"),
        Pq.sqdist(col("v"), col("bvec")).as("d2"))
      .groupBy("q_id")
      .agg(graft.functions.TopKAggregator.topK(nprobe)(
        -col("d2"), col("bid").cast("long")).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("sc"))
      .select(col("q_id"), col("sc.cand_id").as("bid"))
      .join(queries.select(col(idCol).as("q_id"), col(vecCol).as("v")), "q_id")
      .join(broadcast(centroids), "bid")
      .select(col("q_id"), col("bid"),
        zip_with(col("v"), col("bvec"),
          (x, y) => x.cast("double") - y.cast("double")).as("rv"))
  }

  /** ADC search over probed buckets: (q_id, rk, cand_id, adc_d2).
    * `codes`: (id, bid, sub, code); `codebooks`: (sub, code, cvec);
    * the probe table carries (q_id, bid, rv). Distance tables are
    * |probes|·nprobe·m·k rows — broadcast; candidate selection is the
    * bucket equi-join; the final cut is the mergeable top-k.
    */
  def searchAdc(probes: DataFrame, codes: DataFrame, codebooks: DataFrame,
                m: Int, k: Int): DataFrame = {
    val qsv = probes.select(col("q_id"), col("bid"),
      posexplode(expr(
        s"transform(sequence(0, ${m - 1}), j -> slice(rv, j * (size(rv) div $m) + 1, size(rv) div $m))"))
        .as(Seq("sub", "sv")))
    val dtab = qsv.join(codebooks, "sub")
      .select(col("q_id"), col("bid"), col("sub"), col("code"),
        Pq.sqdist(col("sv"), col("cvec")).as("d2"))
    val terms = codes.select("id", "bid", "sub", "code")
      .join(broadcast(dtab), Seq("bid", "sub", "code"))
      .where(col("id") =!= col("q_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(max(when(col("sub") === 0, col("d2"))).as("d0"),
        (1 until m).map(j =>
          max(when(col("sub") === j, col("d2"))).as(s"d$j")): _*)
    val adc = terms.withColumn("adc_d2",
      (0 until m).map(j => col(s"d$j")).reduce(_ + _))
    adc.groupBy("q_id")
      .agg(graft.functions.TopKAggregator.topK(k)(
        -col("adc_d2"), col("id").cast("long")).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "sc")))
      .select(col("q_id"), (col("pos") + 1).as("rk"),
        col("sc.cand_id").as("cand_id"), (-col("sc.sim")).as("adc_d2"))
  }

  /** Stage-2 exact reranking of an ADC shortlist — the standard
    * two-stage serve (PQ recall is bounded by code resolution; exact
    * distance on the k survivors fixes the ORDER at negligible cost):
    * raw vectors are read for exactly k·|probes| candidate rows plus
    * the probe batch — never the corpus — and the re-rank window runs
    * over ≤ k rows per probe (the bounded-window shape). Emits
    * (q_id, rk, cand_id, exact_d2, adc_d2) ordered by exact distance.
    */
  def rerankExact(adcResults: DataFrame, vectors: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val cand = vectors.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val qv = vectors.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val exact = adcResults.select("q_id", "cand_id", "adc_d2")
      .join(cand, "cand_id")
      .join(qv, "q_id")
      .select(col("q_id"), col("cand_id"), col("adc_d2"),
        Pq.sqdist(col("qv"), col("cv")).as("exact_d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("exact_d2"), col("cand_id"))
    exact.withColumn("rk", row_number().over(w))
      .select(col("q_id"), col("rk"), col("cand_id"),
        col("exact_d2"), col("adc_d2"))
  }
}
