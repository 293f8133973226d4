package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of dense embedding columns — the storage
  * path at 100 TB: a 64-dim float vector (256 B) becomes 64 bytes + two
  * floats of scale metadata (~4× smaller, and int8 SIMD-dots on modern
  * CPUs). Per-vector min/max scaling; everything is column arithmetic,
  * so quantize/dequantize run map-side at any scale.
  */
object Quantize {

  /** Codes 0..255 per element: round((x − min) / scale); constant
    * vectors (scale 0) map to all-zero codes (ANSI-safe).
    */
  def quantizeCodes(vec: Column): Column = {
    val mn = array_min(vec).cast("double")
    val mx = array_max(vec).cast("double")
    val scale = (mx - mn) / 255.0
    when(mx === mn, transform(vec, _ => lit(0).cast("int")))
      .otherwise(transform(vec,
        x => round((x.cast("double") - mn) / scale).cast("int")))
  }

  /** Reconstruction: min + code * scale (doubles). */
  def dequantize(vec: Column, codes: Column): Column = {
    val mn = array_min(vec).cast("double")
    val mx = array_max(vec).cast("double")
    val scale = (mx - mn) / 255.0
    transform(codes, c => mn + c.cast("double") * scale)
  }

  private def ddot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine between the original vector and its int8 reconstruction —
    * the fidelity metric that decides whether quantized search is
    * usable (≈1.0 for well-spread vectors).
    */
  def reconstructionCosine(vec: Column): Column = {
    val orig = transform(vec, _.cast("double"))
    val recon = dequantize(vec, quantizeCodes(vec))
    // zero-norm guard: an all-zero vector reconstructs to all-zero and
    // 0/0 is a DIVIDE_BY_ZERO error under ANSI mode — yield NULL (the
    // DuckDB oracle's x/0 result) instead
    val denom = sqrt(ddot(orig, orig)) * sqrt(ddot(recon, recon))
    when(denom === 0, lit(null).cast("double"))
      .otherwise(ddot(orig, recon) / denom)
  }

  /** Per-row fidelity frame `(idCol, code_sum, recon_cos)` — computed by
    * the native one-pass [[graft.functions.Int8QuantFidelity]] kernel.
    * The higher-order formulation ([[fidelityHof]]) is the executable
    * spec the kernel is parity-tested against; as CodegenFallback with
    * no CSE it re-interprets the quantization chain several times per
    * row and was this query's dominant cost.
    */
  def fidelity(df: org.apache.spark.sql.DataFrame, idCol: String,
               vecCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        graft.functions.Int8QuantFidelity(col(vecCol)).as("_q"))
      .select(col(idCol), col("_q.code_sum").as("code_sum"),
        col("_q.recon_cos").as("recon_cos"))

  /** Reference formulation of [[fidelity]] out of built-in higher-order
    * functions — same output bit-for-bit (same HALF_UP rounding, same
    * sequential summation order); kept as the executable spec. The codes
    * and reconstruction are staged as columns between projections:
    * higher-order expressions are CodegenFallback and get no common-
    * subexpression elimination, so inlining them into one projection
    * evaluates the quantization chain three times (measured ~3×).
    */
  def fidelityHof(df: org.apache.spark.sql.DataFrame, idCol: String,
                  vecCol: String): org.apache.spark.sql.DataFrame = {
    val orig = transform(col(vecCol), _.cast("double"))
    df.select(col(idCol), col(vecCol),
        quantizeCodes(col(vecCol)).as("_codes"))
      .select(col(idCol), orig.as("_orig"),
        dequantize(col(vecCol), col("_codes")).as("_recon"),
        aggregate(col("_codes"), lit(0L), (acc, v) => acc + v).as("code_sum"))
      .select(col(idCol), col("code_sum"),
        ddot(col("_orig"), col("_recon")).as("_dot"),
        sqrt(ddot(col("_orig"), col("_orig"))).as("_na"),
        sqrt(ddot(col("_recon"), col("_recon"))).as("_nb"))
      // zero-norm guard (all-zero vectors): NULL, not ANSI DIVIDE_BY_ZERO
      .select(col(idCol), col("code_sum"),
        when(col("_na") * col("_nb") === 0, lit(null).cast("double"))
          .otherwise(col("_dot") / (col("_na") * col("_nb"))).as("recon_cos"))
  }
}
