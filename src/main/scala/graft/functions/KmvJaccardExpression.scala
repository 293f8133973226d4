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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0
    var taken = 0; var inter = 0
    while (taken < k && (i < nx || j < ny)) {
      if (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      } else if (i < nx) i += 1
      else j += 1
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
      s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $taken = 0; int $inter = 0;
        while ($taken < $k && ($i < $nx || $j < $ny)) {
          if ($i < $nx && $j < $ny) {
            final long $xv = $a.getLong($i);
            final long $yv = $b.getLong($j);
            if ($xv == $yv) { $inter++; $i++; $j++; }
            else if ($xv < $yv) { $i++; } else { $j++; }
          } else if ($i < $nx) { $i++; } else { $j++; }
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
