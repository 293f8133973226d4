package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[SimHash32]]: one md5 per distinct token, majority
  * vote over the high bit of each of the 32 hex nibbles. Pure JVM code —
  * called from both the interpreted `eval` and generated code, so the
  * two paths cannot diverge.
  */
object SimHashKernel {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def bitSums(tokens: ArrayData): Array[Int] = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    val sums = new Array[Int](32)
    val md = digest.get()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && seen.add(t)) {
        md.reset()
        val h = md.digest(t.getBytes)
        var j = 0
        while (j < 16) {
          val b = h(j) & 0xff
          // high bit of the high nibble and of the low nibble
          sums(2 * j) += (if ((b & 0x80) != 0) 1 else -1)
          sums(2 * j + 1) += (if ((b & 0x08) != 0) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    sums
  }

  def compute(tokens: ArrayData): UTF8String = {
    val sums = bitSums(tokens)
    val out = new Array[Byte](32)
    var k = 0
    while (k < 32) {
      out(k) = if (sums(k) >= 0) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Same 32 bits packed into a long (MSB-first: string position k+1 is
    * bit 31−k), value in [0, 2³²). An INT signature makes banding a
    * shift-and-mask and Hamming distance a single `bit_count(a ^ b)` —
    * both codegen'd integer ops — instead of per-character array
    * comparisons over the string form.
    */
  def computeBits(tokens: ArrayData): Long = {
    val sums = bitSums(tokens)
    var bits = 0L
    var k = 0
    while (k < 32) {
      if (sums(k) >= 0) bits |= 1L << (31 - k)
      k += 1
    }
    bits
  }
}

/** Native 32-bit SimHash of an `ARRAY<STRING>` token column — output and
  * semantics identical to the higher-order-function formulation in
  * graft.dedup.Dedup.simhash (one md5 per distinct token; bit i = sign of
  * the majority over tokens of the high bit of md5 hex digit i), but runs
  * as a single compiled kernel: no per-token lambda interpretation, no
  * intermediate arrays (measured ~10× faster at 5k docs).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(tokens: Any): Any =
    SimHashKernel.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def apply(tokens: Column): Column =
    ColumnShim.column(SimHash32(ColumnShim.expression(tokens)))
}

/** [[SimHash32]]'s bits as a LONG in [0, 2³²) (MSB-first, bit-identical
  * to the string form) — the representation that makes LSH banding a
  * shift-and-mask and Hamming distance `bit_count(a ^ b)`, all inside
  * whole-stage codegen.
  */
case class SimHashBits32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash32_bits"

  override def nullSafeEval(tokens: Any): Any =
    SimHashKernel.computeBits(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashKernel.computeBits($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits32 =
    copy(child = newChild)
}

object SimHashBits32 {
  def apply(tokens: Column): Column =
    ColumnShim.column(SimHashBits32(ColumnShim.expression(tokens)))
}
