package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Shared kernel for [[Int8QuantFidelity]]: one pass computing the int8
  * scalar-quantization fidelity stats of a float vector. Semantics are
  * EXACTLY the higher-order-function formulation in graft.ann.Quantize
  * (the executable spec this kernel is parity-tested against):
  *
  *  - mn/mx = min/max element (widened to double), scale = (mx−mn)/255
  *  - code_i = HALF_UP-round((x_i − mn)/scale) — Spark's `round` on a
  *    double goes through BigDecimal.valueOf(...).setScale(0, HALF_UP),
  *    reproduced verbatim so results stay bit-identical; constant
  *    vectors (scale 0) quantize to all-zero codes
  *  - recon_i = mn + code_i · scale
  *  - recon_cos = Σ x·recon / (√Σx² · √Σrecon²), sums sequential (the
  *    same order as `aggregate(zip_with(...))` and DuckDB `list_sum`);
  *    NULL when a norm is 0 (all-zero vector)
  */
object Int8QuantKernel {
  def compute(vec: ArrayData): InternalRow = {
    val n = vec.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val scale = (mx - mn) / 255.0
    val constant = mx == mn
    var codeSum = 0L
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      val code =
        if (constant) 0L
        else java.math.BigDecimal.valueOf((x - mn) / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      codeSum += code
      val recon = mn + code * scale
      dot += x * recon
      na += x * x
      nb += recon * recon
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    val cos: Any = if (denom == 0) null else dot / denom
    new GenericInternalRow(Array[Any](codeSum, cos))
  }
}

/** Native one-pass int8 quantization fidelity of an `ARRAY<FLOAT>`
  * column → `STRUCT<code_sum: BIGINT, recon_cos: DOUBLE>`.
  *
  * Why: the higher-order formulation (graft.ann.Quantize.fidelity) is
  * `CodegenFallback` — min/max/transform/aggregate chains interpret a
  * lambda tree per row with intermediate array allocations, and get no
  * common-subexpression elimination across the staged projections. This
  * kernel fuses the whole computation into one compiled loop pair.
  */
case class Int8QuantFidelity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("code_sum", LongType, nullable = false),
    StructField("recon_cos", DoubleType, nullable = true)))

  override def prettyName: String = "int8_quant_fidelity"

  override def nullSafeEval(vec: Any): Any =
    Int8QuantKernel.compute(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Int8QuantKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantFidelity =
    copy(child = newChild)
}

object Int8QuantFidelity {
  def apply(vec: Column): Column =
    ColumnShim.column(Int8QuantFidelity(ColumnShim.expression(vec)))
}
