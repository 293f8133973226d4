package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for dense embeddings: map
  * every `dims`-dim float vector to `outDims` signed sums against
  * deterministic ±1 hyperplanes (Achlioptas 2003 — ±1 entries satisfy
  * the JL lemma with the same concentration as Gaussian planes and
  * multiply-free arithmetic). Cosine geometry survives approximately,
  * so a 4× narrower projected space can PREFILTER similarity search:
  * score everything cheaply at `outDims`, then re-rank only the
  * survivors exactly at `dims` — the brute-force-with-a-discount rung
  * between q34's exact scan and the IVF/LSH index paths (q41/q36).
  *
  * Scale shape: projection is map-side only (one codegen'd `vec_dot`
  * per output dim against a literal plane — no shuffle, no state, no
  * fit step), so it parallelizes like a projection should: at 100 TB
  * the projected corpus is written once and every downstream retrieval
  * pays `outDims/dims` of the scan-and-score cost. The planes are
  * md5-seeded (seed space "p:j:i", disjoint from the SRP bit planes'
  * "j:i") so any engine regenerates them bit-identically — same
  * portability contract as the SRP/minhash families.
  */
object Project {

  /** Deterministic ±1 projection planes: plane `j`, dim `i` is +1 iff
    * the high bit of the first byte of md5("p:j:i") is set. Disjoint
    * seed space from [[Knn.srpPlanes]] ("j:i") so reducing and
    * bit-hashing the same corpus never silently share planes.
    */
  private[graft] def planes(outDims: Int, dims: Int): Seq[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDims).map { j =>
      Array.tabulate(dims) { i =>
        md.reset()
        val h = md.digest(s"p:$j:$i".getBytes("UTF-8"))
        if ((h(0) & 0x80) != 0) 1.0f else -1.0f
      }
    }
  }

  /** Projected corpus: (idCol, proj ARRAY<DOUBLE>). Each component is
    * the exact-per-element dot with one ±1 plane, rounded to 6 decimals
    * (the house float-reduction contract) so both engines carry
    * IDENTICAL projected vectors — everything computed ON the
    * projection downstream is then deterministic.
    */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              dims: Int, outDims: Int): DataFrame = {
    require(outDims >= 1 && dims >= 1, s"need positive dims, got $dims -> $outDims")
    val ps = planes(outDims, dims)
    val comps = ps.map(p => round(Knn.dot(col(vecCol), typedlit(p.toSeq)), 6))
    emb.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** In-order-fold dot product of two double-array columns (the
    * projected space is DOUBLE; [[Knn.dot]] is the float-array kernel).
    * `outDims` is small by construction, so the HOF fold stays cheap.
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a double-array column. */
  def l2normD(a: Column): Column = sqrt(dotD(a, a))

  /** Prefilter-and-rerank kNN: per query, take `prefilterK` candidates
    * by PROJECTED cosine (ranked on the 6-rounded score — determinism
    * over the rounded projections, ties broken by id), then re-rank
    * only those exactly at full dimension and keep `k`. Recall < 1 by
    * JL distortion; raise `prefilterK` (or `outDims`) to buy it back —
    * q160 measures exactly that against the q34 exact answer.
    *
    * Both stages select via the mergeable top-k buffers (never a
    * corpus-wide window); the projected corpus is materialized once for
    * its two consumers (query side + candidate side).
    */
  def projectedRerankKnn(emb: DataFrame, idCol: String, vecCol: String,
                         dims: Int, outDims: Int, queryPred: Column,
                         prefilterK: Int, k: Int): DataFrame = {
    require(prefilterK >= k, s"prefilterK ($prefilterK) must be >= k ($k)")
    val idType = emb.schema(idCol).dataType
    val pn = project(emb, idCol, vecCol, dims, outDims)
      .select(col(idCol), col("proj"), l2normD(col("proj")).as("pnrm"))
      .where(col("pnrm") > 0)
      .localCheckpoint()
    val q = pn.where(queryPred).select(
      col(idCol).as("q_id"), col("proj").as("q_proj"), col("pnrm").as("q_pnrm"))
    val c = pn.select(
      col(idCol).as("cand_id"), col("proj").as("c_proj"), col("pnrm").as("c_pnrm"))
    val psims = broadcast(q).join(c, col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
        round(dotD(col("q_proj"), col("c_proj")) / (col("q_pnrm") * col("c_pnrm")), 6)
          .as("sim"))
    val cand = Knn.topKSelect(psims, idType, prefilterK)
      .select(col("q_id"), col("cand_id"))
    // exact re-rank of the survivors only: ≤ prefilterK rows per query
    val e = emb.select(col(idCol), col(vecCol), Knn.l2norm(col(vecCol)).as("nrm"))
      .where(col("nrm") > 0)
    val qv = e.where(queryPred).select(
      col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    val cv = e.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"), col("nrm").as("c_nrm"))
    val exact = cand.join(broadcast(qv), "q_id")
      .join(cv, "cand_id")
      .select(col("q_id"), col("cand_id"),
        (Knn.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm"))).as("sim"))
    Knn.topKSelect(exact, idType, k)
  }
}
