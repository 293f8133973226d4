package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-hashing ("hashing trick") document embeddings: project the
  * long-form TF-IDF weight table onto a fixed d-dimensional dense
  * vector, dim(token) = md5-derived hash % d, component = Σ weights of
  * the tokens landing in that dim. No trained model, no vocabulary
  * broadcast — the classic scale move when the vocabulary outgrows
  * memory (hash collisions trade a little fidelity for O(1) space),
  * and the bridge from the text pipeline into the embedding machinery
  * (SRP near-dup, IVF/kNN) for corpora with no external encoder.
  *
  * Determinism: the dim hash is the first FOUR hex nibbles of
  * md5(token) (16 bits) mod d — pure ascii arithmetic, expressible
  * bit-identically in any engine (same technique as the q48 oracle).
  * Use a d that is NOT a power of 16, or only the low nibbles
  * participate (the default 13 is prime).
  */
object HashedEmbedding {

  /** Value 0-15 of hex digit `i` (1-based) of a lowercase hex string. */
  private def hexNibble(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    a - 48 - when(a >= 97, 39).otherwise(0)
  }

  /** Engine-portable dim hash: 16-bit md5 prefix mod d. */
  def dimHash(token: Column, d: Int): Column = {
    val h = md5(token)
    pmod(hexNibble(h, 1) * 4096 + hexNibble(h, 2) * 256 +
      hexNibble(h, 3) * 16 + hexNibble(h, 4), lit(d))
  }

  /** Dense d-dim embedding per doc from long-form `(id, token, weight)`
    * rows. One shuffle on (id, dim) with map-side partial sums, then a
    * per-doc rebuild; the d-row dims scaffold broadcasts so absent dims
    * densify to 0.0 without a second wide join.
    */
  def embed(weights: DataFrame, idCol: String, d: Int = 13): DataFrame = {
    require(d >= 1, s"d must be positive, got $d")
    val spark = weights.sparkSession
    val sums = weights
      .groupBy(col(idCol), dimHash(col("token"), d).as("dim"))
      .agg(sum(col("weight")).as("w"))
    val dims = spark.range(0, d).select(col("id").cast("int").as("dim"))
    sums.select(idCol).distinct()
      .crossJoin(broadcast(dims))
      .join(sums, Seq(idCol, "dim"), "left")
      .select(col(idCol), col("dim"), coalesce(col("w"), lit(0.0)).as("w"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("dim"), col("w")))).as("dw"))
      .select(col(idCol),
        transform(col("dw"), x => x.getField("w").cast("float")).as("vec"))
  }
}
