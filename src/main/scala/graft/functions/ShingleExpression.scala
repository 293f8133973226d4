package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[WordShingles]]: distinct word n-gram shingles
  * (space-joined, first-occurrence order) of a token array, in one
  * compiled pass. Semantics are EXACTLY the higher-order formulation in
  * graft.dedup.Dedup.wordShingles (the executable spec this kernel is
  * parity-tested against): windows shorter than n yield an empty array;
  * `concat_ws` semantics — null tokens inside a window are skipped, not
  * propagated.
  *
  * Why a kernel: the HOF chain is CodegenFallback, and Spark's
  * InferFiltersFromGenerate clones the generator input into a
  * `size(..) > 0 AND isnotnull(..)` filter pushed below the projection —
  * so the interpreted chain ran ~3× per row (measured ~1 ms/doc,
  * dominating the decontamination query). The kernel makes each
  * evaluation microseconds, so even the optimizer's clones stay cheap.
  */
object ShingleKernel {
  def compute(tokens: ArrayData, n: Int): ArrayData = compute(tokens, n, distinct = true)

  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val seen =
      if (distinct) new java.util.LinkedHashSet[UTF8String]((len - n + 1) * 2) else null
    val all = if (distinct) null else new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      // concat_ws semantics: nulls are skipped, remaining parts joined
      var parts = List.empty[UTF8String]
      var j = n - 1
      while (j >= 0) {
        val t = tokens.getUTF8String(i + j)
        if (t != null) parts = t :: parts
        j -= 1
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      if (distinct) seen.add(s) else all(i) = s
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native distinct word n-gram shingles of an `ARRAY<STRING>` column →
  * `ARRAY<STRING>` (the unit of n-gram-overlap decontamination and
  * shingle-based dedup).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> and n >= 1, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(tokens: Any): Any =
    ShingleKernel.compute(tokens.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(tokens: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(tokens), n))

  def apply(tokens: Column, n: Int, distinct: Boolean): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(tokens), n, distinct))
}
