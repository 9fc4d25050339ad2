package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid interpolation / gap filling — the `fill(linear)` of
  * monitoring stacks: each series resampled onto a regular `step`
  * grid (within its own [min, max] span), values linearly
  * interpolated between the surrounding samples and exact at grid
  * points that coincide with a sample.
  *
  * Spark-first: the grid explodes from one per-series bounds
  * aggregation (output-resolution-sized, not input-sized), and the
  * surrounding samples attach with TWO [[AsOfJoin]] passes — forward
  * for the previous sample and on negated timestamps for the next
  * (as-of is direction-symmetric under negation). Everything stays
  * per-series windows + equi-joins; the interpolation arithmetic is
  * order-fixed IEEE, replayed exactly by the oracle. Same-timestamp
  * duplicate samples are pre-collapsed deterministically
  * (max_by pid) — interpolation needs a function, not a multiset. */
object Interpolate {

  def toGrid(points: DataFrame, step: Long): DataFrame = {
    // `samples` feeds THREE consumers (grid bounds agg, prev as-of
    // pass, nxt as-of pass): without a persist Spark re-runs the whole
    // scan+collapse lineage per consumer — at 100× data that replay
    // multiplies the full input cost ×3 (the minhashPrep lesson)
    val samples = points.groupBy(col("series"), col("ts"))
      .agg(max_by(col("val"), col("pid")).as("val"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a span shorter than one step has no grid point: guard the
    // sequence() explicitly (start > stop silently DESCENDS in Spark)
    // instead of leaning on the downstream prev/nxt null filter
    val grid = samples.groupBy(col("series"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .where(expr(s"(mn + ${step - 1}) DIV $step <= mx DIV $step"))
      .select(col("series"), explode(expr(
        s"transform(sequence((mn + ${step - 1}) DIV $step, mx DIV $step), i -> i * $step)"))
        .as("ts"))
    val sv = samples.select(col("series"), col("ts"),
      struct(col("ts").as("sts"), col("val").as("sval")).as("sv"))
    val prev = AsOfJoin.asOf(grid, sv, "series", "ts", "sv", "prev")
    val svN = sv.select(col("series"), (-col("ts")).as("nts"), col("sv"))
    val nxt = AsOfJoin.asOf(grid.withColumn("nts", -col("ts")), svN,
        "series", "nts", "sv", "nxt")
      .select(col("series"), col("ts"), col("nxt"))
    // output is FLOOR-quantized fixed point (×1e9 → BIGINT), not
    // round(…, 9): interpolation ratios land arbitrarily close to
    // decimal half-boundaries, where Spark (BigDecimal HALF_UP on the
    // exact binary value) and DuckDB round() disagree by one ulp of
    // the last digit — floor of the bit-identical double has no
    // internal rounding step, so it cannot diverge
    val out = prev.join(nxt, Seq("series", "ts"))
      .where(col("prev").isNotNull && col("nxt").isNotNull)
      .select(col("series"), col("ts"), floor(
        when(col("nxt.sts") === col("prev.sts"), col("prev.sval"))
          .otherwise(col("prev.sval") +
            (col("nxt.sval") - col("prev.sval")) *
              (col("ts") - col("prev.sts")) /
              (col("nxt.sts") - col("prev.sts"))) * lit(1e9))
        .cast("long").as("val_q9"))
      // pin the grid-sized result so the cached samples can be released
      // NOW — a long-lived server must not leak one cache per call
      .localCheckpoint(eager = true)
    samples.unpersist(blocking = true)
    out
  }
}
