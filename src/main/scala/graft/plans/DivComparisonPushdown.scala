package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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

  /** ceil(v / m) for m > 0, exact for any sign of v. */
  private def ceilDiv(v: Long, m: Long): Option[Long] =
    try Some(Math.floorDiv(Math.addExact(v, m - 1), m))
    catch { case _: ArithmeticException => None }

  /** True when a zone id denotes plain UTC (fixed zero offset), i.e.
    * a TimestampNTZ→Timestamp cast under it preserves the internal
    * micros value exactly. */
  private def zoneIsUtc(tz: Option[String]): Boolean = tz.exists { id =>
    try {
      val rules = java.time.ZoneId.of(id).getRules
      rules.isFixedOffset &&
        rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
    } catch { case _: Exception => false }
  }

  /** Rewrites the bound `e >= v` (low=true) or `e < v` (low=false),
    * with `v` in `tp`'s internal long space, through exact monotone
    * wrappers toward the underlying scan column, so the derived
    * conjunct lands on an attribute parquet can prune on. Every peel
    * is an equivalence:
    *   x*m >= v  ⇔  x >= ceil(v/m)   (m>0, exact under ANSI)
    *   x*m <  v  ⇔  x <  ceil(v/m)
    *   unix_micros(t) cmp v  ⇔  t cmp timestamp(micros=v)
    *   cast(ntz as timestamp) cmp w  ⇔  ntz cmp w   (UTC session only)
    * The engine's normalized events frame exposes
    * `ts = unix_micros(cast(ts_ntz)) * 1000` (core/Tables.events), so
    * a `(ts div F) >= A` predicate peels all the way to the raw NTZ
    * parquet column. Fixed-point re-runs resolve div-of-div chains. */
  private def lower(e: Expression, v: Long, low: Boolean, tp: DataType): Seq[Expression] = {
    def emit(x: Expression) = Seq[Expression](
      if (low) GreaterThanOrEqual(x, Literal(v, tp)) else LessThan(x, Literal(v, tp)))
    e match {
      case Multiply(x, Literal(m: Long, LongType), _) if m > 0 && tp == LongType =>
        ceilDiv(v, m).toSeq.flatMap(w => lower(x, w, low, LongType))
      case Multiply(Literal(m: Long, LongType), x, _) if m > 0 && tp == LongType =>
        ceilDiv(v, m).toSeq.flatMap(w => lower(x, w, low, LongType))
      case u: UnixMicros if tp == LongType =>
        lower(u.child, v, low, TimestampType)
      case c: Cast if tp == TimestampType && c.dataType == TimestampType &&
          c.child.dataType == TimestampNTZType && zoneIsUtc(c.timeZoneId) =>
        lower(c.child, v, low, TimestampNTZType)
      case x => emit(x)
    }
  }

  /** Wrapper heads `lower` can peel — gate for the direct
    * (division-free) comparison cases so untouched predicates are
    * never re-emitted verbatim. */
  private def peelable(e: Expression): Boolean = e match {
    case Multiply(_, Literal(m: Long, LongType), _) => m > 0
    case Multiply(Literal(m: Long, LongType), _, _) => m > 0
    case _: UnixMicros => true
    case _ => false
  }

  private def derive(e: Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 1 =>
      mul(c, k).toSeq.flatMap(v => lower(a, v, low = true, LongType))
    case GreaterThan(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 0 =>
      mulSucc(c, k).toSeq.flatMap(v => lower(a, v, low = true, LongType))
    case LessThan(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 1 =>
      mul(c, k).toSeq.flatMap(v => lower(a, v, low = false, LongType))
    case LessThanOrEqual(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 0 =>
      mulSucc(c, k).toSeq.flatMap(v => lower(a, v, low = false, LongType))
    case EqualTo(DivByConst(a, k), Literal(c: Long, LongType)) if c >= 1 =>
      mul(c, k).toSeq.flatMap(v => lower(a, v, low = true, LongType)) ++
        mulSucc(c, k).toSeq.flatMap(v => lower(a, v, low = false, LongType))
    // division-free comparisons on a peelable wrapper chain (the
    // ns-precision frames compare the affine ts expression directly)
    case GreaterThanOrEqual(a, Literal(c: Long, LongType)) if peelable(a) =>
      lower(a, c, low = true, LongType)
    case GreaterThan(a, Literal(c: Long, LongType)) if peelable(a) =>
      if (c == Long.MaxValue) Nil else lower(a, c + 1, low = true, LongType)
    case LessThan(a, Literal(c: Long, LongType)) if peelable(a) =>
      lower(a, c, low = false, LongType)
    case LessThanOrEqual(a, Literal(c: Long, LongType)) if peelable(a) =>
      if (c == Long.MaxValue) Nil else lower(a, c + 1, low = false, LongType)
    case EqualTo(a, Literal(c: Long, LongType)) if peelable(a) =>
      lower(a, c, low = true, LongType) ++
        (if (c == Long.MaxValue) Nil else lower(a, c + 1, low = false, LongType))
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
