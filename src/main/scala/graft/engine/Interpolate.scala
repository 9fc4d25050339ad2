package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid interpolation / gap filling — the `fill(linear)` of
  * monitoring stacks: each series resampled onto a regular `step`
  * grid (within its own [min, max] span), values linearly
  * interpolated between the surrounding samples and exact at grid
  * points that coincide with a sample.
  *
  * Spark-first: the grid explodes from one per-series bounds
  * aggregation (output-resolution-sized, not input-sized), then grid
  * rows and samples UNION into one frame and both neighbours come
  * from GROWING rows-frames (`last(ignoreNulls)` over
  * ROWS(-∞, 0]) — forward-ordered for the previous sample,
  * reverse-ordered for the next. Growing frames are the one window
  * shape Spark evaluates incrementally (O(n) per partition); the
  * symmetric-looking RANGE [0, +∞) frame is a SHRINKING frame that
  * Spark recomputes from scratch per row — O(n²), measured 10×
  * slower than the as-of form it was meant to replace. Ties order
  * samples before grid rows in BOTH directions (`is_grid` ascending
  * under either ts direction), so a sample at exactly a grid
  * timestamp is the nearest neighbour on both sides and coincident
  * grid points are exact without special-casing. One exchange + two
  * sorts replace the two direction-symmetric [[AsOfJoin]] passes
  * plus a reassembly join (5 shuffles → 3, and the sample frame now
  * has 2 consumers instead of 3). The interpolation
  * arithmetic is order-fixed IEEE, replayed exactly by the oracle.
  * Same-timestamp duplicate samples are pre-collapsed
  * deterministically (max_by pid) — interpolation needs a function,
  * not a multiset. */
object Interpolate {

  /** `fill = "linear"` (default) interpolates between the surrounding
    * samples; `fill = "locf"` carries the last observation forward
    * (the staircase fill of counter-style metrics, where averaging
    * across a step invents values that never existed). LOCF needs
    * only the backward neighbour, so the reverse-ordered window pass
    * disappears entirely — one exchange + ONE sort.
    *
    * `maxGap` (0 = unbounded) bounds how far a fill may reach — the
    * TimescaleDB `locf(max_interval)` semantic: a grid point is
    * DROPPED rather than filled from data too far away to trust.
    * For LOCF the staleness `ts − prev_ts` must be ≤ maxGap; for
    * linear the BRIDGED gap `next_ts − prev_ts` must be (a grid point
    * between two samples 3 days apart is an invention however close
    * it sits to one of them). A pure extra predicate at projection
    * time — the plan is unchanged. */
  def toGrid(points: DataFrame, step: Long,
      fill: String = "linear", maxGap: Long = 0L): DataFrame = {
    require(fill == "linear" || fill == "locf", s"unknown fill '$fill'")
    require(maxGap >= 0L, "maxGap must be non-negative (0 = unbounded)")
    // `samples` feeds TWO consumers (grid bounds agg + the union):
    // without a persist Spark re-runs the whole scan+collapse lineage
    // per consumer (the minhashPrep lesson)
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
    val u = samples
      .select(col("series"), col("ts"), col("ts").as("sts"),
        col("val").as("sval"), lit(false).as("is_grid"))
      .unionByName(grid.select(col("series"), col("ts"),
        lit(null).cast("long").as("sts"),
        lit(null).cast("double").as("sval"), lit(true).as("is_grid")))
    val pW = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nW = Window.partitionBy(col("series"))
      .orderBy(col("ts").desc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // output is FLOOR-quantized fixed point (×1e9 → BIGINT), not
    // round(…, 9): interpolation ratios land arbitrarily close to
    // decimal half-boundaries, where Spark (BigDecimal HALF_UP on the
    // exact binary value) and DuckDB round() disagree by one ulp of
    // the last digit — floor of the bit-identical double has no
    // internal rounding step, so it cannot diverge. A coincident
    // sample gives pts === ts, so the ratio term is exactly 0 and the
    // grid point emits the sample value bit-exactly.
    val withPrev = u
      .withColumn("pts", last(col("sts"), ignoreNulls = true).over(pW))
      .withColumn("pval", last(col("sval"), ignoreNulls = true).over(pW))
    val locfGuard =
      if (maxGap == 0L) lit(true)
      else col("ts") - col("pts") <= maxGap
    val linGuard =
      if (maxGap == 0L) lit(true)
      else col("nts") - col("pts") <= maxGap
    val filled =
      if (fill == "locf")
        withPrev
          .where(col("is_grid") && col("pts").isNotNull && locfGuard)
          .select(col("series"), col("ts"),
            floor(col("pval") * lit(1e9)).cast("long").as("val_q9"))
      else withPrev
        .withColumn("nts", last(col("sts"), ignoreNulls = true).over(nW))
        .withColumn("nval", last(col("sval"), ignoreNulls = true).over(nW))
        .where(col("is_grid") && col("pts").isNotNull && col("nts").isNotNull
          && linGuard)
        .select(col("series"), col("ts"), floor(
          when(col("nts") === col("pts"), col("pval"))
            .otherwise(col("pval") +
              (col("nval") - col("pval")) *
                (col("ts") - col("pts")) /
                (col("nts") - col("pts"))) * lit(1e9))
          .cast("long").as("val_q9"))
    // pin the grid-sized result so the cached samples can be released
    // NOW — a long-lived server must not leak one cache per call
    val out = filled.localCheckpoint(eager = true)
    samples.unpersist(blocking = true)
    out
  }
}
