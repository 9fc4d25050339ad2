package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the sub-linear-memory path
  * for statistics whose exact forms (count series length, median)
  * the engine already serves: at 100 TB a per-series exact distinct
  * count or percentile can spill, while HLL++ (approx_count_distinct)
  * and the quantile-summary sketch behind approx_percentile hold a
  * bounded-size summary per group and stay inside whole-stage
  * codegen. Approximate by design → the driver check is rows-only;
  * the error bounds are pinned by SketchesSpec against the exact
  * operators on the shipped data. */
object Sketches {

  /** Per-series approximate stats: HLL++ distinct timestamps (rsd
    * 0.02) and sketched p50/p95 of the value. */
  def approxSeriesStats(points: DataFrame): DataFrame =
    points.groupBy(col("series")).agg(
      approx_count_distinct(col("ts"), rsd = 0.02).as("approx_n_ts"),
      expr("approx_percentile(val, 0.5, 10000)").as("approx_p50"),
      expr("approx_percentile(val, 0.95, 10000)").as("approx_p95"))
}
