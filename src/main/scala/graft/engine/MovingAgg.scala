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
}
