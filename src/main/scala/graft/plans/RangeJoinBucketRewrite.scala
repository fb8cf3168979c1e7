package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure theta range join —
  * `l JOIN r ON r.t >= l.t + lo AND r.t <= l.t + hi` with NO equi
  * conjunct — into the bucketed form that admits a shuffled equi-join.
  *
  * Spark plans an inequality-only inner join as BroadcastNestedLoopJoin:
  * every left partition × the whole broadcast right side, O(|l|·|r|)
  * comparisons — the classic 100 TB cliff. The rewrite buckets the left
  * time by `width = hi − lo`, replicates each right row to the ≤ 3
  * buckets its match window can touch (explode of a 2-3 element
  * sequence), and joins on the bucket id with the original predicate
  * kept as a residual — same rows out (each matching pair shares exactly
  * one bucket id), shuffle volume linear in the inputs. This is the rule
  * form of [[graft.operators.Joins.rangeJoin]], applied automatically to
  * any eligible join in the plan.
  *
  * Scope guards (all checked, otherwise the join is left untouched):
  * inner join, no equi conjunct already present (then hash joins work
  * without help), both time sides resolve to LongType attributes of
  * opposite children plus foldable offsets, hi > lo. Integer floor
  * division is done as `(x − pmod(x, w)) div w`, correct for negative
  * times too. Fires once: the rewritten join contains an equi conjunct,
  * which makes it ineligible on the optimizer's next pass. */
object RangeJoinBucketRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (attribute, constant offset) from `a`, `a + c`, or `a − c`. */
  private def asOffset(e: Expression): Option[(Attribute, Long)] = e match {
    case a: Attribute if a.dataType == LongType => Some((a, 0L))
    case Add(a: Attribute, o, _) if a.dataType == LongType && o.foldable =>
      evalLong(o).map(v => (a, v))
    case Subtract(a: Attribute, o, _) if a.dataType == LongType && o.foldable =>
      evalLong(o).map(v => (a, -v))
    case _ => None
  }

  private def evalLong(e: Expression): Option[Long] = e.eval() match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  /** Normalize a conjunct to (left side attr, right side attr, bound,
    * isLower) meaning `rAttr >= lAttr + bound` (isLower) or
    * `rAttr <= lAttr + bound`. */
  private def asBound(
      c: Expression,
      lOut: AttributeSet,
      rOut: AttributeSet): Option[(Attribute, Attribute, Long, Boolean)] = {
    def split(x: Expression, y: Expression, lower: Boolean) = // x >= y
      (asOffset(x), asOffset(y)) match {
        case (Some((rt, ro)), Some((lt, lo)))
            if rOut.contains(rt) && lOut.contains(lt) =>
          Some((lt, rt, lo - ro, lower)) // rt + ro >= lt + lo  ⇒  rt >= lt + (lo−ro)
        case (Some((lt, lo)), Some((rt, ro)))
            if lOut.contains(lt) && rOut.contains(rt) =>
          Some((lt, rt, lo - ro, !lower)) // lt + lo >= rt + ro  ⇒  rt <= lt + (lo−ro)
        case _ => None
      }
    c match {
      case GreaterThanOrEqual(x, y) => split(x, y, lower = true)
      case LessThanOrEqual(x, y) => split(y, x, lower = true) // x <= y ⇔ y >= x
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty) ||
            (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet) &&
              a.references.nonEmpty && b.references.nonEmpty)
        case _ => false
      }
      if (hasEqui) j
      else {
        val bounds = conjuncts.flatMap(c => asBound(c, l.outputSet, r.outputSet))
        // one lower and one upper bound on the same (lt, rt) attribute pair
        val pair = bounds.collect { case (lt, rt, lo, true) =>
          bounds.collectFirst {
            case (lt2, rt2, hi, false)
                if lt2.semanticEquals(lt) && rt2.semanticEquals(rt) && hi > lo =>
              (lt, rt, lo, hi)
          }
        }.flatten.headOption
        pair match {
          case Some((lt, rt, lo, hi)) =>
            val w = Literal(hi - lo, LongType)
            def floorDiv(x: Expression): Expression =
              IntegralDivide(Subtract(x, Pmod(x, w)), w)
            val lbAlias = Alias(floorDiv(lt), "__range_lb")()
            val newLeft = Project(l.output :+ lbAlias, l)
            // Sequence is TimeZoneAwareExpression: `resolved` demands a
            // timezone even for long sequences — the analyzer's
            // ResolveTimeZone normally fills it; post-analysis we must
            val seq = Sequence(
              floorDiv(Subtract(rt, Literal(hi, LongType))),
              floorDiv(Subtract(rt, Literal(lo, LongType))),
              Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
            val rbAttr = AttributeReference("__range_rb", LongType, nullable = false)()
            val gen = Generate(ExplodeBase(seq, position = false), Nil,
              outer = false, None, Seq(rbAttr), r)
            val newCond = And(EqualTo(lbAlias.toAttribute, rbAttr), cond)
            Project(j.output, Join(newLeft, gen, Inner, Some(newCond), hint))
          case None => j
        }
      }
  }

  /** Explode without companion sugar (Explode is a case class; this
    * helper only exists to keep the construction site readable). */
  private def ExplodeBase(child: Expression, position: Boolean): Generator =
    if (position) PosExplode(child) else Explode(child)
}
