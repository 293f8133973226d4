package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: eliminate the all-pairs cross join from the naive
  * cosine pipeline when a positive similarity threshold makes it
  * unobservable (SURVEY.md §7.1's "genuine optimizer demonstration").
  *
  * The naive strategy (graft.similarity.DocSimilarity.cartesianCosine,
  * mirroring the reference's small-sample path) materializes EVERY
  * (a, b) pair by cross-joining the norm tables, left-joining the
  * token-intersection dot products, and defaulting absent pairs to
  * sim = 0.0. Under `WHERE sim > θ` with θ ≥ 0 those defaulted rows can
  * never survive — so the cross join only manufactures rows the filter
  * deletes. Spark's own EliminateOuterJoin cannot prove this: under
  * ANSI mode the division can throw, so the null-intolerance check
  * refuses to evaluate the predicate.
  *
  * Matched (optimized) shape:
  * {{{
  * Project [..., Divide(Coalesce(dot, 0.0), na * nb) AS sim]
  * +- Filter Divide(Coalesce(dot, 0.0), na * nb) > θ         (θ ≥ 0)
  *    +- Join LeftOuter, (la = ra AND lb = rb)
  *       :- Join Cross (normsA, normsB)
  *       +- dots                                  (aggregated products)
  * }}}
  * is rewritten to
  * {{{
  * Project [... unchanged ...]
  * +- Filter ... unchanged ...
  *    +- Join Inner (rb = lb)
  *       :- Join Inner (ra = la) (dots, normsA)
  *       +- normsB
  * }}}
  * Every attribute the Filter/Project reference (left keys, norms, dot)
  * is still produced, so expressions and exprIds are untouched — only
  * the join tree changes. Row multiplicity, the dropped-id semantics of
  * the original left join, and the coalesce (now over a never-null dot)
  * are all preserved; O(|A|·|B|) becomes a pair of equi-joins bounded
  * by the token-blocked candidate set.
  *
  * Installed via `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `spark.experimental.extraOptimizations`); fires only on this
  * exact shape, so it can never misfire on user cross joins whose
  * all-pairs output is observable.
  *
  * == Known ANSI divergence (contract) ==
  * For a pair whose norm product is ZERO, the original plan evaluates
  * `0.0 / 0` inside the Filter and raises DIVIDE_BY_ZERO under ANSI
  * mode; the rewritten plan never manufactures that defaulted row, so
  * the query silently succeeds without it. The rule therefore assumes
  * norms are non-zero — true by construction for TF-IDF L2 norms in
  * this library (every doc in the weight table has ≥ 1 token with
  * weight > 0; zero-norm embedding rows are pre-dropped in graft.ann),
  * but a GraftExtensions user feeding zero or NULL norms into this
  * exact plan shape trades an ANSI error for a dropped row. We document
  * rather than guard: demanding a provable `norm > 0` filter below the
  * norms inputs would stop the rule firing on the very pipelines it
  * exists for, which never carry one.
  */
object CosineCrossJoinElimination extends Rule[LogicalPlan] {

  /** sim > θ (θ ≥ 0) or sim ≥ θ (θ > 0): rows defaulted to sim = 0 by
    * the outer join can never pass.
    */
  private def thresholdExcludesZero(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThan(e, Literal(t: Double, DoubleType)) if t >= 0 => Some(e)
    case GreaterThanOrEqual(e, Literal(t: Double, DoubleType)) if t > 0 => Some(e)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case proj @ Project(projList,
        filter @ Filter(cond,
          join @ Join(
            cross @ Join(normsA, normsB, Cross | Inner, None, _),
            dots, LeftOuter, Some(joinCond), _))) =>
      val rewritten = for {
        simExpr <- thresholdExcludesZero(cond)
        // the filtered expression must be the zero-defaulted cosine:
        // Divide(Coalesce(dot, 0.0), na * nb) with dot from the dots
        // side and the norms from the cross side
        (dot, na, nb) <- simExpr match {
          case Divide(Coalesce(Seq(d: AttributeReference, Literal(0.0, DoubleType))),
              Multiply(x: AttributeReference, y: AttributeReference, _), _)
              if dots.outputSet.contains(d) &&
                cross.outputSet.contains(x) && cross.outputSet.contains(y) =>
            Some((d, x, y))
          case _ => None
        }
        // join condition: one key pair per norms side, in either order
        keyPairs <- joinCond match {
          case And(EqualTo(a1, a2), EqualTo(b1, b2)) =>
            def orient(l: Expression, r: Expression): Option[(Attribute, Attribute)] =
              (l, r) match {
                case (la: AttributeReference, ra: AttributeReference)
                    if cross.outputSet.contains(la) && dots.outputSet.contains(ra) =>
                  Some((la, ra))
                case (ra: AttributeReference, la: AttributeReference)
                    if cross.outputSet.contains(la) && dots.outputSet.contains(ra) =>
                  Some((la, ra))
                case _ => None
              }
            for (p1 <- orient(a1, a2); p2 <- orient(b1, b2)) yield Seq(p1, p2)
          case _ => None
        }
        // classify each key pair to its norms side: exactly one per side
        aPair <- keyPairs.find(p => normsA.outputSet.contains(p._1))
        bPair <- keyPairs.find(p => normsB.outputSet.contains(p._1))
        if aPair ne bPair
      } yield {
        val j1 = Join(dots, normsA, Inner,
          Some(EqualTo(aPair._2, aPair._1)), JoinHint.NONE)
        val j2 = Join(j1, normsB, Inner,
          Some(EqualTo(bPair._2, bPair._1)), JoinHint.NONE)
        Project(projList, Filter(cond, j2))
      }
      rewritten.getOrElse(proj)
  }
}
