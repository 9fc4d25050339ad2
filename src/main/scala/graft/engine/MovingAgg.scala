package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing moving-window aggregates — the rolling smooth/envelope
  * pass of a monitoring dashboard (moving average and min/max bands
  * over the last k samples), which the reference's bucketed
  * aggregations cannot express: buckets tumble, a moving window
  * slides one sample at a time. Per series: ONE window pass (shuffle
  * on series, per-key sort only — no global sort) computes all four
  * aggregates over ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW; heads
  * shorter than k aggregate over what exists, as dashboards expect.
  *
  * Over the integer family every windowed sum/min/max is exact int64
  * (order-independent), and the moving average is ONE division of
  * exact integers — bit-identical in any engine — shipped
  * floor-quantized (×1e9 → `mov_avg_q9`) so no round() half-boundary
  * can diverge. Cost is O(k) per output row — Spark's sliding frame
  * replays the frame's rows into the aggregate buffers on each slide
  * — so keep k dashboard-sized; a huge-k smooth belongs on
  * [[trailingTime]]'s bucketed cousins instead. */
object MovingAgg {

  /** (series, ts, pid, val, mov_sum, mov_min, mov_max, mov_avg_q9)
    * over the trailing `k` samples, current row inclusive. */
  def trailing(points: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
      .rowsBetween(-(k - 1L), Window.currentRow)
    points.select(col("series"), col("ts"), col("pid"), col("val"))
      .withColumn("mov_sum", sum(col("val")).over(w))
      .withColumn("mov_min", min(col("val")).over(w))
      .withColumn("mov_max", max(col("val")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("mov_avg_q9", expr(
        "CAST(floor(CAST(mov_sum AS double) / CAST(__n AS double) * 1000000000.0) AS BIGINT)"))
      .drop("__n")
  }

  /** Running total per series — InfluxDB `cumulative_sum` /
    * Postgres `SUM() OVER (... ROWS UNBOUNDED PRECEDING)`: at every
    * point, the exact int64 sum of all values up to and including it
    * in (ts, pid) order. ONE growing-rows window frame per series
    * (growing frames are incremental — Spark carries the
    * accumulator, never recomputing the prefix per row), one shuffle
    * on hash(series), ANSI mode faults overflow loudly. */
  def cumulativeSum(points: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points.select(col("series"), col("ts"), col("pid"), col("val"))
      .withColumn("cum_sum", sum(col("val")).over(w))
  }

  /** Time-based variant — "activity in the trailing `horizon`
    * SECONDS at every point" (requests-in-the-last-hour, not
    * last-k-samples): a RANGE frame over the ts ordering, so the
    * window adapts to sampling density and every ts-peer row sees
    * the same frame (tie-order can't matter — no pid tiebreak needed
    * or allowed in a RANGE frame). Same exact-int64 / one-division /
    * floor-quantized output contract as [[trailing]]. */
  def trailingTime(points: DataFrame, horizon: Long): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc)
      .rangeBetween(-(horizon - 1L), Window.currentRow)
    points.select(col("series"), col("ts"), col("pid"), col("val"))
      .withColumn("mov_sum", sum(col("val")).over(w))
      .withColumn("mov_n", count(lit(1)).over(w))
      .withColumn("mov_avg_q9", expr(
        "CAST(floor(CAST(mov_sum AS double) / CAST(mov_n AS double) * 1000000000.0) AS BIGINT)"))
  }

  /** Exponentially-weighted moving average, truncated at the trailing
    * `k` samples — the low-latency smooth (recent samples dominate)
    * that [[trailing]]'s flat window cannot give. The exact EWMA
    * recursion y_t = α·x_t + (1−α)·y_{t−1} carries UNBOUNDED history
    * (inherently sequential — not a Spark shape); the standard
    * streaming truncation renormalizes the first k geometric weights
    * over the samples that exist:
    *
    *   y_t = Σ_{i<m} (1−α)^i · x_{t−i} / Σ_{i<m} (1−α)^i,  m = min(k, t+1)
    *
    * the weight an untruncated adjust-style EWMA gives its k newest
    * samples (tail weight (1−α)^k — under 6% for the defaults). With
    * rational α = num/den the weights scale to EXACT integers
    * c_i = (den−num)^i · den^(k−1−i) (a shorter head just drops
    * trailing terms — the common d^(k−m) factor cancels in the
    * ratio), so the whole op is k−1 lag columns off ONE per-series
    * window pass plus integer multiply-adds: codegen-friendly, no
    * arrays, no per-row allocation, and the quantized output is one
    * floor division of exact int64 — bit-identical in any engine.
    * Requires non-negative values (truncating DIV = floor) and
    * max|val| · Σc_i · 10⁶ within int64. The require below bounds only
    * the weight table (Σc_i ≤ 2⁶³/10¹², i.e. it assumes |val| ≤ 10⁶);
    * corpora with larger values are caught at runtime by ANSI-mode
    * arithmetic overflow, not at this API boundary — coarsen den/k or
    * pre-scale the values if that fires. */
  def ewma(points: DataFrame, num: Long = 1L, den: Long = 4L,
      k: Int = 8): DataFrame = {
    require(num > 0 && den > num, "alpha = num/den must be in (0,1)")
    require(k >= 1 && k <= 32, "truncation depth k must be in [1,32]")
    val cs = ewmaWeights(num, den, k)
    require(cs.sum <= Long.MaxValue / 1000000L / 1000000L,
      s"weights too large for exact int64 at num=$num den=$den k=$k")
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
    val lagged = cs.indices.foldLeft(
      points.select(col("series"), col("ts"), col("pid"), col("val"))) {
      (df, i) =>
        if (i == 0) df.withColumn("__x0", col("val"))
        else df.withColumn(s"__x$i", lag(col("val"), i).over(w))
    }
    val numSum = cs.indices
      .map(i => s"coalesce(__x$i * ${cs(i)}L, 0L)").mkString(" + ")
    val denSum = cs.indices
      .map(i => s"(CASE WHEN __x$i IS NOT NULL THEN ${cs(i)}L ELSE 0L END)")
      .mkString(" + ")
    lagged
      .withColumn("ewma_q6", expr(s"(($numSum) * 1000000L) DIV ($denSum)"))
      .select(col("series"), col("ts"), col("pid"), col("val"),
        col("ewma_q6"))
  }

  /** The exact integer weights c_i = (den−num)^i · den^(k−1−i),
    * newest first — shared with the oracle-SQL builder so both
    * engines multiply by the same constants. */
  def ewmaWeights(num: Long, den: Long, k: Int): Seq[Long] =
    (0 until k).map { i =>
      val r = (0 until i).foldLeft(1L)((a, _) =>
        Math.multiplyExact(a, den - num))
      (0 until (k - 1 - i)).foldLeft(r)((a, _) =>
        Math.multiplyExact(a, den))
    }
}
