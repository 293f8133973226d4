package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[MinHashSigs]]: all n minhashes of a token array
  * in ONE pass over the distinct tokens. Semantics are EXACTLY the
  * higher-order formulation in graft.dedup.Dedup.minhash (the
  * executable spec this kernel is parity-tested against):
  * h_s = lexicographic min over distinct non-null tokens of the
  * lowercase-hex md5("<s>:" + token); NULL when the doc has no tokens.
  * Hex lexicographic order equals unsigned byte order of the digest,
  * so the comparison runs on raw digests and only the n winners are
  * hex-encoded.
  */
object MinHashKernel {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val prefixCache: Array[Array[Byte]] =
    Array.tabulate(64)(s => s"$s:".getBytes("UTF-8"))

  private def prefix(s: Int): Array[Byte] =
    if (s < prefixCache.length) prefixCache(s) else s"$s:".getBytes("UTF-8")

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexChars(b >>> 4).toByte
      out(2 * i + 1) = hexChars(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def compute(tokens: ArrayData, nHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    val mins = new Array[Array[Byte]](nHashes)
    val md = digest.get()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && seen.add(t)) {
        val tb = t.getBytes
        var s = 0
        while (s < nHashes) {
          md.reset()
          md.update(prefix(s))
          md.update(tb)
          val h = md.digest()
          if (mins(s) == null || lessUnsigned(h, mins(s))) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](nHashes)
    var s = 0
    while (s < nHashes) {
      out(s) = if (mins(s) == null) null else hex(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Native n-seed MinHash of an `ARRAY<STRING>` token column →
  * `ARRAY<STRING>` of n hex signatures.
  *
  * Why: the higher-order formulation re-interprets
  * `array_min(transform(array_distinct(tokens), md5(...)))` per seed —
  * n CodegenFallback chains each rebuilding the distinct set and
  * allocating an intermediate hash array. This kernel builds the
  * distinct set once and keeps n running minima over raw digests in a
  * single compiled loop.
  */
case class MinHashSigs(child: Expression, nHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if nHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> and nHashes > 0, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(tokens: Any): Any =
    MinHashKernel.compute(tokens.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel.compute($c, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  def apply(tokens: Column, nHashes: Int): Column =
    ColumnShim.column(MinHashSigs(ColumnShim.expression(tokens), nHashes))
}
