package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: KMV sketch resemblance of two SORTED
  * DISTINCT `ARRAY<BIGINT>` hash buffers — J = |u ∩ a ∩ b| / |u| with
  * u the k smallest of the union, in ONE merge walk.
  *
  * Why not the HOF formulation ([[Kmv.jaccard]], kept as the
  * executable spec): higher-order functions are `CodegenFallback` —
  * per call they interpret a lambda tree and allocate the
  * concat/distinct/sort intermediates, ~0.2 ms per pair at k = 256,
  * which dominated q158's per-document routing (5 audiences × every
  * doc). The inputs are ALREADY sorted and distinct (every producer —
  * [[KmvAggregator]], [[BottomKHeapAggregator]].finish,
  * [[Kmv.arraySketch]], [[Kmv.mergeArrays]] — emits exactly that), so
  * the union's bottom-k and the both-membership count fall out of a
  * single two-pointer merge: O(k), no allocation. Counts are identical
  * to the HOF form (KmvSpec pins kernel ≡ spec on random buffers), so
  * the emitted double — one IEEE division of the same two ints — is
  * bit-identical and the DuckDB mirror ([[Kmv.jaccardSql]]) is
  * unchanged.
  *
  * Semantics: empty union → 0.0; NULL input → NULL.
  */
case class KmvJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_jaccard"

  /** The merge walk's precondition — sorted ascending, distinct,
    * no null slots — is CHECKED as it walks (two compares + a null
    * probe per consumed element, negligible next to the walk itself):
    * a violated contract raises loudly instead of silently corrupting
    * the similarity, which matters now that the kernel is reachable
    * from ad-hoc SQL text, not just from the sketch builders that
    * construct conforming buffers.
    */
  private def fail(which: String): Nothing =
    throw new IllegalArgumentException(
      s"kmv_jaccard: $which input must be a sorted-ascending DISTINCT " +
        "ARRAY<BIGINT> with no null elements (a KMV sketch buffer)")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0
    var taken = 0; var inter = 0
    var lastX = Long.MinValue; var lastY = Long.MinValue
    var seenX = false; var seenY = false
    while (taken < k && (i < nx || j < ny)) {
      if (i < nx && j < ny) {
        if (x.isNullAt(i)) fail("left")
        if (y.isNullAt(j)) fail("right")
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (seenX && i < nx && xv <= lastX) fail("left")
        if (seenY && j < ny && yv <= lastY) fail("right")
        if (xv == yv) { inter += 1; lastX = xv; seenX = true; lastY = yv; seenY = true; i += 1; j += 1 }
        else if (xv < yv) { lastX = xv; seenX = true; i += 1 }
        else { lastY = yv; seenY = true; j += 1 }
      } else if (i < nx) {
        if (x.isNullAt(i)) fail("left")
        val xv = x.getLong(i)
        if (seenX && xv <= lastX) fail("left")
        lastX = xv; seenX = true; i += 1
      } else {
        if (y.isNullAt(j)) fail("right")
        val yv = y.getLong(j)
        if (seenY && yv <= lastY) fail("right")
        lastY = yv; seenY = true; j += 1
      }
      taken += 1
    }
    if (taken == 0) 0.0 else inter.toDouble / taken.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val taken = ctx.freshName("taken"); val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val lastX = ctx.freshName("lastX"); val lastY = ctx.freshName("lastY")
      val seenX = ctx.freshName("seenX"); val seenY = ctx.freshName("seenY")
      val err = classOf[IllegalArgumentException].getName
      def guard(arr: String, idx: String, v: String, last: String, seen: String, side: String) =
        s"""if ($arr.isNullAt($idx)) throw new $err("kmv_jaccard: $side input must have no null elements");
            final long $v = $arr.getLong($idx);
            if ($seen && $v <= $last) throw new $err("kmv_jaccard: $side input must be sorted ascending and distinct");"""
      s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $taken = 0; int $inter = 0;
        long $lastX = Long.MIN_VALUE; long $lastY = Long.MIN_VALUE;
        boolean $seenX = false; boolean $seenY = false;
        while ($taken < $k && ($i < $nx || $j < $ny)) {
          if ($i < $nx && $j < $ny) {
            ${guard(a, i, xv, lastX, seenX, "left")}
            ${guard(b, j, yv, lastY, seenY, "right")}
            if ($xv == $yv) { $inter++; $lastX = $xv; $seenX = true; $lastY = $yv; $seenY = true; $i++; $j++; }
            else if ($xv < $yv) { $lastX = $xv; $seenX = true; $i++; }
            else { $lastY = $yv; $seenY = true; $j++; }
          } else if ($i < $nx) {
            ${guard(a, i, xv + "o", lastX, seenX, "left")}
            $lastX = ${xv}o; $seenX = true; $i++;
          } else {
            ${guard(b, j, yv + "o", lastY, seenY, "right")}
            $lastY = ${yv}o; $seenY = true; $j++;
          }
          $taken++;
        }
        ${ev.value} = ($taken == 0) ? 0.0D : ((double) $inter) / ((double) $taken);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KmvJaccard =
    copy(left = newLeft, right = newRight)
}

object KmvJaccard {
  /** Column form over two sorted distinct sketch arrays. */
  def apply(a: Column, b: Column, k: Int): Column =
    ColumnShim.column(
      new KmvJaccard(ColumnShim.expression(a), ColumnShim.expression(b), k))
}
