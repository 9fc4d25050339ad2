package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The point-pipeline algebra of the reference's `select` statement:
  * `select f1(..) => f2(..) ... from <match> ...` — each stage consumes
  * the previous stage's points per series
  * (src/siri/db/aggregate.c; chain loop src/siri/db/listener.c:5676-5695).
  *
  * Every stage is a declarative DataFrame transform over a typed long
  * table (series, ts, val [, pid]), so Catalyst gets full plans:
  * bucketed aggregates become 2-phase HashAggregate keyed on
  * (series, bucket); pairwise stages become a single window per series.
  * All stages key on `series`, so chained stages reuse one shuffle
  * partitioning.
  *
  * Value typing follows the input frame (LONG for integer series,
  * DOUBLE for float, STRING for log series), which reproduces the
  * reference's per-function output-type matrix (SURVEY §2.5): count is
  * int64, sum/min/max/first/last preserve the input type,
  * mean/median/variance/stddev/derivative are float, timeval/interval
  * are int64 (aggregate.c:838-910).
  */
object Pipeline {

  sealed trait AggFn { def name: String }
  case object Count extends AggFn { val name = "count" }
  case object Sum extends AggFn { val name = "sum" }
  case object Mean extends AggFn { val name = "mean" }
  case object Median extends AggFn { val name = "median" }
  case object MedianLow extends AggFn { val name = "median_low" }
  case object MedianHigh extends AggFn { val name = "median_high" }
  case object Min extends AggFn { val name = "min" }
  case object Max extends AggFn { val name = "max" }
  case object Variance extends AggFn { val name = "variance" }
  case object PVariance extends AggFn { val name = "pvariance" }
  case object Stddev extends AggFn { val name = "stddev" }
  case object First extends AggFn { val name = "first" }
  case object Last extends AggFn { val name = "last" }
  case object DifferenceAgg extends AggFn { val name = "difference" }
  final case class DerivativeAgg(unit: Long) extends AggFn { val name = "derivative" }

  sealed trait Stage
  /** Bucketed aggregate (`fn(gb)`), or whole-series collapse (`fn()`)
    * when groupBy is None — AGGREGATE_group_by / AGGREGATE_to_one. */
  final case class Agg(fn: AggFn, groupBy: Option[Long], offset: Long = 0) extends Stage
  /** Pairwise delta vs previous point — AGGREGATE_difference
    * (aggregate.c:760-836). */
  case object Difference extends Stage
  /** Pairwise (v-v_prev)/(ts-ts_prev)*unit — AGGREGATE_derivative
    * (aggregate.c:696-758). */
  final case class Derivative(unit: Double) extends Stage
  /** ts - ts_prev — AGGREGATE_interval (aggregate.c:838-876). */
  case object Interval extends Stage
  /** value := ts (int64 output) — AGGREGATE_timeval (aggregate.c:878-910). */
  case object Timeval extends Stage
  /** Point-value predicate — AGGREGATE_filter (aggregate.c:926-1066).
    * op ∈ == != < > <= >= (numeric); on an integer series a fractional
    * literal is truncated toward zero first (aggregate.c:952). */
  final case class FilterNum(op: String, value: Double) extends Stage
  /** String-series filter: == != < > <= >= plus ~ (contains) and
    * !~ (not-contains) — aggregate.c:596-675. */
  final case class FilterStr(op: String, value: String) extends Stage
  /** filter(/regex/[i]) on a string series. */
  final case class FilterRegex(pattern: String, caseInsensitive: Boolean = false,
      negate: Boolean = false) extends Stage
  /** First/last N points per series (grammar head_expr/tail_expr). */
  final case class Head(n: Int) extends Stage
  final case class Tail(n: Int) extends Stage
  /** `limit(N, fn)`: if a series has more than N points, re-bucket with
    * gb = span/N + 1, offset = (first_ts - 1) % gb (aggregate.c:677-694). */
  final case class LimitFn(n: Int, fn: AggFn) extends Stage
  /** Time-range restriction: after (>=), before (<), between [A,B). */
  final case class TimeRange(after: Option[Long], before: Option[Long]) extends Stage

  /** Right-aligned bucket label — GROUP_TS macro
    * (src/siri/db/aggregate.c:41-43):
    * (ts + gb - 1) / gb * gb + offset, integer division. */
  def bucket(gb: Long, offset: Long = 0): Column =
    expr(s"((ts + ${gb - 1L}) div $gb) * $gb" + (if (offset != 0) s" + $offset" else ""))

  /** DuckDB SQL for the same bucket label (oracle parity). */
  def bucketSql(gb: Long, offset: Long = 0): String =
    s"((ts + ${gb - 1L}) // $gb) * $gb" + (if (offset != 0) s" + $offset" else "")

  /** LimitFn's sequential greedy label scan over a typed tuple
    * Dataset. Input: (series, ts, val, pid, gb, off), each series
    * co-located in one partition and sorted by (series, ts [, pid]).
    * Output adds the bucket label; O(1) state, single streaming pass.
    * Typed tuple encoders are codegen'd per field — no generic-Row
    * `toSeq`/`fromSeq` allocation per point. */
  private def greedyLabels[T](prepped: DataFrame, encT: Encoder[T]): DataFrame = {
    val E = Encoders
    // Encoders.tuple tops out at 5 components — (gb, off) ride as one
    // nested pair
    val enc5in = E.tuple(E.STRING, E.scalaLong, encT, E.scalaLong,
      E.tuple(E.scalaLong, E.scalaLong))
    val enc5out = E.tuple(E.STRING, E.scalaLong, encT, E.scalaLong, E.scalaLong)
    prepped
      .select(col("series"), col("ts"), col("val"), col("pid"),
        struct(col("__gb"), col("__off")).as("gboff"))
      .toDF("_1", "_2", "_3", "_4", "_5").as(enc5in)
      .mapPartitions { it =>
        var cur: String = null
        var lbl = 0L
        it.map { case (s, ts, v, pid, (gb, off)) =>
          if (s != cur || ts > lbl) {
            cur = s
            lbl = (ts + gb - 1) / gb * gb + off
          }
          (s, ts, v, pid, lbl)
        }
      }(enc5out)
      .toDF("series", "ts", "val", "pid", "__lbl")
  }

  private def hasPid(df: DataFrame) = df.columns.contains("pid")
  private def isIntSeries(df: DataFrame) = df.schema("val").dataType == LongType

  /** Deterministic per-series point order: ts, then ingest order for
    * equal timestamps (points.c:226-245 keeps insertion order). */
  private def seriesOrder(df: DataFrame) = {
    val w = Window.partitionBy(col("series"))
    if (hasPid(df)) w.orderBy(col("ts"), col("pid")) else w.orderBy(col("ts"))
  }

  /** Columns to carry through a row-preserving stage (pid is kept so a
    * later order-dependent stage still has a deterministic tie-break). */
  private def carry(df: DataFrame, v: Column): Seq[Column] =
    if (hasPid(df)) Seq(col("series"), col("ts"), v.as("val"), col("pid"))
    else Seq(col("series"), col("ts"), v.as("val"))

  /** int64 sum with the reference's overflow error
    * (aggregate.c:1646-1652): the partials accumulate in DECIMAL —
    * exact far past int64, still whole-stage-codegen'd — and the final
    * value errors instead of wrapping when it leaves int64 range. */
  private def checkedSumLong: Column = {
    val s = sum(col("val").cast("decimal(20,0)"))
    when(s > lit(Long.MaxValue) || s < lit(Long.MinValue),
      raise_error(lit("Overflow detected while using sum().")))
      .otherwise(s.cast("long"))
  }

  /** a - b with the reference's overflow error (aggregate.c:804,1332):
    * try_subtract yields NULL exactly on int64 overflow (operands are
    * never null on this path), which becomes the reference's error. */
  private def checkedSubLong(a: Column, b: Column): Column = {
    val d = try_subtract(a, b)
    when(d.isNull,
      raise_error(lit("Overflow detected while using difference().")))
      .otherwise(d)
  }

  /** The aggregate value expression for a bucket/whole-series group.
    * After any aggregate stage (series, ts) is unique, so the pid
    * tie-break is only needed on the raw table. */
  private def aggValue(fn: AggFn, withPid: Boolean, intSeries: Boolean): Column = {
    val ord = if (withPid) "struct(ts, pid)" else "ts"
    fn match {
      case First => expr(s"min_by(val, $ord)")
      case Last => expr(s"max_by(val, $ord)")
      case DifferenceAgg | DerivativeAgg(_) if intSeries =>
        checkedSubLong(expr(s"max_by(val, $ord)"), expr(s"min_by(val, $ord)"))
      case DifferenceAgg | DerivativeAgg(_) =>
        expr(s"max_by(val, $ord) - min_by(val, $ord)")
      case Sum if intSeries => checkedSumLong
      case other => aggValueSimple(other)
    }
  }

  private def aggValueSimple(fn: AggFn): Column = fn match {
    case Count => count(lit(1))
    case Sum => sum(col("val"))
    case Mean => avg(col("val"))
    case Median => expr("percentile(val, 0.5)")
    // sorted-element medians — median.c:42-165: low = elem (n-1)/2,
    // high = elem n/2 (0-based)
    case MedianLow =>
      expr("element_at(sort_array(collect_list(val)), cast((count(val) + 1) div 2 as int))")
    case MedianHigh =>
      expr("element_at(sort_array(collect_list(val)), cast(count(val) div 2 + 1 as int))")
    case Min => min(col("val"))
    case Max => max(col("val"))
    // sample variance, 0.0 when n == 1 (variance.c:9-52; Spark: NULL)
    case Variance => coalesce(var_samp(col("val")), lit(0.0))
    case PVariance => var_pop(col("val"))
    case Stddev => coalesce(stddev_samp(col("val")), lit(0.0))
    case other => throw new IllegalArgumentException(s"order-dependent agg: ${other.name}")
  }

  /** Output timestamp of a whole-series collapse: last point's ts
    * (first point's for first()) — AGGREGATE_to_one. */
  private def toOneTs(fn: AggFn): Column =
    if (fn == First) min(col("ts")) else max(col("ts"))

  def applyStage(df: DataFrame, stage: Stage): DataFrame = stage match {
    case Agg(fn, Some(gb), off) =>
      val v0 = aggValue(fn, hasPid(df), isIntSeries(df))
      val v = fn match {
        case DerivativeAgg(unit) => v0 * lit(unit.toDouble) / lit(gb.toDouble)
        case _ => v0
      }
      df.groupBy(col("series"), bucket(gb, off).as("ts"))
        .agg(v.as("val"))
    case Agg(fn, None, _) =>
      val v0 = aggValue(fn, hasPid(df), isIntSeries(df))
      df.groupBy(col("series"))
        .agg(toOneTs(fn).as("ts"), v0.as("val"))
        .select(col("series"), col("ts"), col("val"))
    case Difference =>
      val w = seriesOrder(df)
      val stepped = df.withColumn("__prev", lag(col("val"), 1).over(w))
        .where(col("__prev").isNotNull)
      val delta =
        if (isIntSeries(df)) checkedSubLong(col("val"), col("__prev"))
        else col("val") - col("__prev")
      stepped.select(carry(stepped, delta): _*)
    case Derivative(unit) =>
      val w = seriesOrder(df)
      val stepped = df
        .withColumn("__pv", lag(col("val"), 1).over(w))
        .withColumn("__pt", lag(col("ts"), 1).over(w))
        .where(col("__pv").isNotNull)
      // the reference subtracts in DOUBLE (aggregate.c:732:
      // `(double) spt->val.int64 - prev->val.int64`) and C division by
      // a zero ts-delta yields IEEE inf/nan (duplicate timestamps are
      // legal, test_select.py:516 runs derivative over "equal ts") —
      // Spark's ANSI `/` throws instead, so branch the zero divisor
      val num = (col("val").cast("double") - col("__pv").cast("double")) *
        lit(unit)
      val dt = (col("ts") - col("__pt")).cast("double")
      val deriv = when(dt === 0D,
        when(num > 0D, lit(Double.PositiveInfinity))
          .when(num < 0D, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)))
        .otherwise(num / dt)
      stepped.select(carry(stepped, deriv): _*)
    case Interval =>
      val w = seriesOrder(df)
      val stepped = df.withColumn("__pt", lag(col("ts"), 1).over(w))
        .where(col("__pt").isNotNull)
      stepped.select(carry(stepped, col("ts") - col("__pt")): _*)
    case Timeval =>
      df.select(carry(df, col("ts")): _*)
    case FilterNum(op, v) if v.isNaN && !isIntSeries(df) =>
      // reference NaN semantics (itest/test_select.py:308-330): C
      // comparisons with NaN are false, and the filter special-cases
      // equality, so ==/>=/<= nan keep ONLY NaN points, != keeps the
      // rest, </> keep nothing. Spark's NaN-is-largest total order
      // would silently differ, so map explicitly.
      df.where(op match {
        case "==" | ">=" | "<=" => isnan(col("val"))
        case "!=" => !isnan(col("val"))
        case _ => lit(false)
      })
    case FilterNum(op, v) if v.isNaN => // int series never hold NaN
      df.where(if (op == "!=") lit(true) else lit(false))
    case FilterNum(op, v) =>
      // integer series truncate the literal toward zero
      // (AGGREGATE_filter, aggregate.c:952: value.int64 = (int64_t) real)
      val litv: Column = if (isIntSeries(df)) lit(v.toLong) else lit(v)
      val base = cmp(col("val"), op, litv)
      // C ordering comparisons are false for NaN operands; Spark sorts
      // NaN above +inf, so e.g. `filter(> 5)` must not keep NaN points
      val pred =
        if (isIntSeries(df)) base
        else op match {
          case "<" | "<=" | ">" | ">=" => base && !isnan(col("val"))
          case _ => base
        }
      df.where(pred)
    case FilterStr(op, v) => op match {
      case "~" => df.where(col("val").contains(v))
      case "!~" => df.where(!col("val").contains(v))
      case _ => df.where(cmp(col("val"), op, lit(v)))
    }
    case FilterRegex(p, ci, negate) =>
      // anchored full match on the value, like every reference regex
      // (aggregate.c:650 via re.c:31-44); != keeps the non-matching
      // points (itest/test_select.py:260-263)
      val m = col("val").rlike(SeriesMatch.anchored(p, ci))
      df.where(if (negate) !m else m)
    case Head(n) =>
      val w = seriesOrder(df)
      df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n).drop("__rn")
    case Tail(n) =>
      val descCols =
        if (hasPid(df)) Seq(col("ts").desc, col("pid").desc) else Seq(col("ts").desc)
      val wDesc = Window.partitionBy(col("series")).orderBy(descCols: _*)
      df.withColumn("__rn", row_number().over(wDesc)).where(col("__rn") <= n).drop("__rn")
    case LimitFn(n, fn) =>
      // per-series span decides the bucket width; series with <= n
      // points pass through unchanged (aggregate.c:677-694):
      //   gb = (last_ts - first_ts) / n + 1; offset = (first_ts-1) % gb
      // ONE explicit hash repartition on `series` feeds everything
      // downstream: the span aggregation (partial agg, no further
      // exchange), the span join (co-partitioned — spans is one row
      // per series, at 10M+ series too large to force-broadcast; if
      // AQE broadcasts it anyway the streamed side keeps this
      // partitioning), and the greedy label scan (which only needs
      // every series co-located). AQE partition coalescing merges
      // whole partitions and never splits one, so a series can never
      // straddle partitions after this point.
      val parted = df.repartition(col("series"))
      val spans = parted.groupBy(col("series")).agg(
        count(lit(1)).as("__len"), min(col("ts")).as("__t0"), max(col("ts")).as("__t1"))
        .withColumn("__gb", expr(s"(__t1 - __t0) div ${n.toLong} + 1"))
        .withColumn("__off", expr("(__t0 - 1) % __gb"))
        .select(col("series"), col("__len"), col("__gb"), col("__off"))
      val joined = parted.join(spans, Seq("series"))
      val small = joined.where(col("__len") <= n)
        .select(col("series"), col("ts"), col("val"))
      // Greedy bucket labels, EXACTLY the reference scan
      // (aggregate.c:691-692 + GROUP_TS loop :1188-1210): each group
      // is labeled GROUP_TS(first point of the group) =
      // ceil(ts/gb)*gb + off, and the next group starts at the first
      // point past that label. The boundary chain depends on the data
      // (a post-gap group start s with s mod gb in 1..off pushes its
      // label one gb past the dense grid), so it is not
      // window-expressible — an in-partition external sort orders each
      // series and a streaming O(1)-state mapPartitions pass assigns
      // labels; the existing grouped aggregation then runs per
      // (series, label). The pass runs on a typed tuple Dataset (val
      // dispatched per family: long/double/string), whose codegen'd
      // encoder is far cheaper than the generic Row encoder —
      // integer values never pass through a double.
      // PipelineSpec pins equality with a literal reimplementation of
      // the reference scan on both dense and sparse fixtures.
      val hasP = hasPid(df)
      val sortCols =
        if (hasP) Seq(col("series"), col("ts"), col("pid"))
        else Seq(col("series"), col("ts"))
      val prepped = joined.where(col("__len") > n)
        .sortWithinPartitions(sortCols: _*)
        .select(col("series"), col("ts"), col("val"),
          (if (hasP) col("pid") else lit(0L)).as("pid"),
          col("__gb"), col("__off"))
      val labeled = df.schema("val").dataType match {
        case LongType => greedyLabels[Long](prepped, Encoders.scalaLong)
        case org.apache.spark.sql.types.StringType =>
          greedyLabels[String](prepped, Encoders.STRING)
        case _ => greedyLabels[Double](prepped, Encoders.scalaDouble)
      }
      val bucketed = labeled
        .groupBy(col("series"), col("__lbl"))
        .agg(aggValue(fn, hasP, isIntSeries(df)).as("val"))
        .select(col("series"), col("__lbl").as("ts"), col("val"))
      small.unionByName(bucketed)
    case TimeRange(after, before) =>
      val f1 = after.map(a => col("ts") >= a).getOrElse(lit(true))
      val f2 = before.map(b => col("ts") < b).getOrElse(lit(true))
      df.where(f1 && f2)
  }

  private def cmp(c: Column, op: String, v: Column): Column = op match {
    case "==" => c === v
    case "!=" => c =!= v
    case "<" => c < v
    case ">" => c > v
    case "<=" => c <= v
    case ">=" => c >= v
    case other => throw new IllegalArgumentException(s"bad filter op: $other")
  }

  /** Run a full chain. Pairwise/window stages carry pid through so any
    * later order-dependent stage keeps a deterministic tie-break
    * (points.c:226-245 insertion order); aggregate outputs are unique
    * per (series, ts) so they drop it. With `keepPid` a row-preserving
    * chain exposes pid to the caller (the transports order duplicate-ts
    * points by insertion id — points.c:250-288). */
  def apply(points: DataFrame, stages: Seq[Stage], keepPid: Boolean = false): DataFrame = {
    val out = stages.foldLeft(points)(applyStage)
    if (keepPid && hasPid(out))
      out.select(col("series"), col("ts"), col("val"), col("pid"))
    else out.select(col("series"), col("ts"), col("val"))
  }

  /** `merge as "name" [using <chain>]` — all selected series become one
    * series (src/siri/db/points.c:338-451); the full `using` aggregate
    * chain is applied after the merge (listener.c:6727-6810).
    * Duplicated timestamps survive the merge until an aggregate
    * collapses them. */
  def merge(points: DataFrame, name: String, using: Seq[Stage] = Nil,
      keepPid: Boolean = false): DataFrame =
    apply(points.withColumn("series", lit(name)), using, keepPid)
}
