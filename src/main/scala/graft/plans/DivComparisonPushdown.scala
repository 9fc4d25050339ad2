package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Derives parquet-pushable bounds from integral-division comparisons.
  *
  * The engine's point frames expose `ts` as `raw_ts div F` (epoch-ns
  * parquet scaled to the query precision), so a time-range predicate
  * reaches the scan as `(raw_ts div F) >= A` — an expression Parquet
  * cannot evaluate, leaving `PushedFilters: [IsNotNull(ts)]` and NO
  * row-group pruning on the dominant access pattern. At 100 TB that
  * is the difference between reading a time slice and reading the
  * whole table.
  *
  * This rule conjoins the implied raw-column bound (e.g.
  * `raw_ts >= A*F`) next to the original predicate. It only ADDS
  * conjuncts that are implied by the original (sound for any input,
  * including negatives, because implications are restricted to
  * thresholds where Spark's truncate-toward-zero `div` agrees with
  * floor); the original predicate stays, so results are unchanged
  * while the derived bound pushes into the parquet row-group index.
  *
  * Implications used (k > 0; `div` truncates toward zero):
  *   (a div k) >= c, c >= 1  ⇒  a >= c*k
  *   (a div k) >  c, c >= 0  ⇒  a >= (c+1)*k
  *   (a div k) <  c, c >= 1  ⇒  a <  c*k
  *   (a div k) <= c, c >= 0  ⇒  a <  (c+1)*k
  *   (a div k) == c, c >= 1  ⇒  both bounds
  */
class DivComparisonPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduceLeft(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** a div k with literal positive k, on longs. */
  private object DivByConst {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case d: IntegralDivide if d.dataType == LongType =>
        d.right match {
          case Literal(k: Long, LongType) if k > 0 && d.left.deterministic =>
            Some((d.left, k))
          case _ => None
        }
      case _ => None
    }
  }

  private def mul(c: Long, k: Long): Option[Long] =
    try Some(Math.multiplyExact(c, k)) catch { case _: ArithmeticException => None }

  private def mulSucc(c: Long, k: Long): Option[Long] =
    if (c == Long.MaxValue) None else mul(c + 1, k)

  private def derive(e: Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 1 =>
      mul(c, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))).toSeq
    case GreaterThan(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 0 =>
      mulSucc(c, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))).toSeq
    case LessThan(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 1 =>
      mul(c, k).map(v => LessThan(a, Literal(v, LongType))).toSeq
    case LessThanOrEqual(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 0 =>
      mulSucc(c, k).map(v => LessThan(a, Literal(v, LongType))).toSeq
    case EqualTo(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 1 =>
      (mul(c, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))) ++
        mulSucc(c, k).map(v => LessThan(a, Literal(v, LongType)))).toSeq
    // literal-on-left mirror forms
    case GreaterThanOrEqual(lit: Literal, d @ DivByConst(_, _)) =>
      derive(LessThanOrEqual(d, lit))
    case GreaterThan(lit: Literal, d @ DivByConst(_, _)) =>
      derive(LessThan(d, lit))
    case LessThan(lit: Literal, d @ DivByConst(_, _)) =>
      derive(GreaterThan(d, lit))
    case LessThanOrEqual(lit: Literal, d @ DivByConst(_, _)) =>
      derive(GreaterThanOrEqual(d, lit))
    case _ => Nil
  }
}
