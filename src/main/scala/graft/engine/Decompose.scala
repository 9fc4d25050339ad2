package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition per series — the
  * statsmodels `seasonal_decompose` shape a monitoring stack runs to
  * separate "what is trending" from "what is daily rhythm" from "what
  * is actually unusual": val = trend + seasonal + residual, with the
  * trend a centered moving average, the seasonal component the
  * per-(series, hour-of-day) mean of the detrended points, and the
  * residual the exact remainder.
  *
  * Exactness: everything is ×10⁶ fixed point. The trend is one floor
  * division of exact int64 (sum over the centered frame; the frame
  * shrinks at series edges as in the classical method), the seasonal
  * mean one floor division of the exact detrended sum, and the
  * residual a subtraction of integers — so all three components are
  * bit-identical in any engine and recompose to val·10⁶ exactly
  * (minus the two floor remainders, carried in the residual). Floor
  * division uses the pmod form so NEGATIVE detrended sums floor
  * toward −∞ in both engines (truncating DIV would round them toward
  * zero; the [[BucketStats.valueHistogram]] precedent).
  *
  * Plan shape: ONE per-series window pass (shuffle on hash(series))
  * produces the trend; the detrended frame is persisted once — it
  * feeds the tiny (series × 24) seasonal aggregation AND the final
  * projection, and unpersisted the scan+window lineage would re-run
  * per consumer (the interpolate lesson) — the seasonal table comes
  * back as a broadcast join (points never shuffle for it), and the
  * point-sized output is pinned before the cache is released. */
object Decompose {

  /** (series, ts, pid, val, trend_q6, seasonal_q6, residual_q6);
    * `halfWindow` samples on each side of the centered trend frame.
    * `pin = false` skips the persist + eager checkpoint and returns
    * the raw plan (plan-shape tests; production callers keep the
    * default). */
  def seasonalDecompose(points: DataFrame,
      halfWindow: Int = 12, pin: Boolean = true): DataFrame = {
    require(halfWindow >= 1, "halfWindow must be at least 1")
    // exact-int64 headroom, enforced per row like bucketTwa's guard:
    // the trend sum holds ≤ (2·halfWindow+1) terms of val·10⁶, so
    // |val| must stay under MaxValue / 10⁶ / frame — out-of-range
    // values fault with the remedy named instead of a raw ANSI
    // overflow from inside the window aggregation. A codegen'd
    // comparison substituted for the value itself (prune-proof), not
    // an extra pass over the data.
    val frame = 2L * halfWindow + 1L
    val bound = Long.MaxValue / 1000000L / frame
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
      .rowsBetween(-halfWindow.toLong, halfWindow.toLong)
    def floorDiv(num: String, den: String) =
      s"($num - ((($num % $den) + $den) % $den)) DIV $den"
    val t0 = points.select(col("series"), col("ts"), col("pid"),
        expr(
          s"""CASE WHEN val >= ${-bound}L AND val <= ${bound}L THEN val
             |ELSE raise_error(concat('seasonalDecompose: val ',
             |  CAST(val AS STRING), ' outside [-$bound, $bound] — exact',
             |  ' int64 headroom for halfWindow=$halfWindow; shrink the',
             |  ' window or pre-scale the values')) END""".stripMargin)
          .as("val"))
      .withColumn("__s", sum(col("val") * lit(1000000L)).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("trend_q6", expr(floorDiv("__s", "__n")))
      .withColumn("__detr", col("val") * lit(1000000L) - col("trend_q6"))
      .withColumn("__hour", expr("(ts DIV 3600) % 24"))
      .drop("__s", "__n")
    val t = if (pin)
      t0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else t0
    val seasonal = t.groupBy(col("series"), col("__hour"))
      .agg(sum(col("__detr")).as("__ds"), count(lit(1)).as("__dn"))
      .select(col("series"), col("__hour"),
        expr(floorDiv("__ds", "__dn")).as("seasonal_q6"))
    val joined = t.join(broadcast(seasonal), Seq("series", "__hour"))
      .select(col("series"), col("ts"), col("pid"), col("val"),
        col("trend_q6"), col("seasonal_q6"),
        (col("__detr") - col("seasonal_q6")).as("residual_q6"))
    if (!pin) return joined
    val out = joined.localCheckpoint(eager = true)
    t.unpersist(blocking = true)
    out
  }
}
