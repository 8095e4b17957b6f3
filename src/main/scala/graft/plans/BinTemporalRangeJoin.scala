package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite a key-less temporal range join
  * `abs(l.ts − r.ts) <= w` into the binned equi-join
  * [[graft.ops.RangeJoin]] implements by hand.
  *
  * Without an equality conjunct, Spark can only plan such a join as a
  * broadcast-nested-loop / cartesian product — O(|L|·|R|) comparisons.
  * This rule restores an equi-key mechanically: the left side is
  * replicated to its 3 covering `w`-sized time bins (a `Generate` over
  * [-1, 0, 1]), the right side is tagged with its own bin, and the join
  * gains a `_graft_bin = _graft_rbin` conjunct. Any pair within ±w shares
  * one of the 3 candidate bins (exactly one — each right row has one
  * bin), so the result multiset is unchanged while the planner now sees
  * a shuffled/broadcast HASH join. The original |Δts| <= w predicate is
  * kept to prune false bin-mates, and a final `Project` restores the
  * original output schema.
  *
  * Fires only on INNER joins whose condition has the abs-distance
  * conjunct on integral (int/long) columns, one side from each input,
  * with a positive literal bound, and NO existing equi-conjunct (with
  * one, Spark already plans a hash join and the rewrite would only
  * triple the left side). Registered via
  * `SparkSessionExtensions.injectOptimizerRule` —
  * [[graft.functions.GraftExtensions]].
  */
object BinTemporalRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BinCol = "_graft_bin"
  private val RBinCol = "_graft_rbin"

  private def literalSeconds(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  private def integralAttr(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (leftTs, rightTs, w) when `conjunct` is abs(a − b) <= w with a/b
    * split across the join sides. */
  private def absDistance(conjunct: Expression, left: LogicalPlan,
                          right: LogicalPlan): Option[(Expression, Expression, Long)] =
    conjunct match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), wExpr) =>
        literalSeconds(wExpr).flatMap { w =>
          if (!integralAttr(a) || !integralAttr(b)) None
          else if (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) Some((a, b, w))
          else if (b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet)) Some((b, a, w))
          else None
        }
      case _ => None
    }

  private def isEqui(conjunct: Expression, left: LogicalPlan,
                     right: LogicalPlan): Boolean = conjunct match {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    case _ => false
  }

  private def binOf(ts: Expression, w: Long): Expression =
    Floor(Divide(Cast(ts, DoubleType), Literal(w.toDouble)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(_.name == BinCol) &&
          !left.output.exists(_.name == BinCol) &&
          !right.output.exists(_.name == RBinCol) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.collectFirst(Function.unlift(
        (c: Expression) => absDistance(c, left, right).map(c -> _)))
      hit match {
        case Some((_, (lTs, rTs, w)))
            if !conjuncts.exists(isEqui(_, left, right)) =>
          // left × {-1, 0, 1}: the 3 candidate bins
          val dAttr = AttributeReference("_graft_d", LongType, nullable = false)()
          val gen = Generate(
            Explode(CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(dAttr), child = left)
          val lBin = Alias(Add(binOf(lTs, w), dAttr), BinCol)()
          val lProj = Project(left.output :+ lBin, gen)
          val rBin = Alias(binOf(rTs, w), RBinCol)()
          val rProj = Project(right.output :+ rBin, right)
          val newCond = And(
            EqualTo(lBin.toAttribute, rBin.toAttribute), cond)
          Project(j.output,
            Join(lProj, rProj, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
