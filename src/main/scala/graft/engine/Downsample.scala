package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shape-preserving visualization downsampling — the
  * largest-triangle-one-bucket (LTOB) family every dashboard uses to
  * draw a million-point series as a few hundred pixels without
  * flattening spikes (Steinarsson 2013): within each time bucket keep
  * the point with the largest effective area against its immediate
  * neighbors (|val − midpoint(prev, next)|), which preserves local
  * extrema where a plain per-bucket mean would erase them.
  *
  * The strict LTTB variant chains each choice to the PREVIOUS chosen
  * point — an inherently sequential scan; LTOB's per-point area uses
  * only the fixed input neighbors, so the whole operator is one
  * per-series lag/lead window pass + one partial-aggregated max_by
  * per (series, bucket): distributed, no global sort, and every
  * arithmetic step is order-fixed IEEE so the selection is replayed
  * exactly by the SQL oracle. Boundary points (no neighbor) carry
  * area −1 and win only in single-point buckets. */
object Downsample {

  /** (series, bucket, ts, val): the kept point per (series, bucket);
    * ties break toward the earliest (ts, pid). */
  def ltob(points: DataFrame, bucket: Long): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
    points
      .withColumn("__a", lag(col("val"), 1).over(w))
      .withColumn("__b", lead(col("val"), 1).over(w))
      .withColumn("__area", coalesce(
        round(abs(col("val") - (col("__a") + col("__b")) / lit(2.0)), 9),
        lit(-1.0)))
      .withColumn("__bkt", expr(s"ts DIV $bucket"))
      .groupBy(col("series"), col("__bkt").as("bucket"))
      .agg(max_by(struct(col("ts"), col("val")),
        struct(col("__area"), (-col("ts")).as("nt"), (-col("pid")).as("np")))
        .as("__keep"))
      .select(col("series"), col("bucket"),
        col("__keep.ts").as("ts"), col("__keep.val").as("val"))
  }

  /** Downsample fidelity report — the trust gate for [[ltob]] (the
    * recall-eval pattern aimed at visualization): per series, how far
    * the kept-point POLYLINE strays from the raw data it replaces —
    * the number that says whether a bucket width is safe to render
    * before a dashboard commits to it. Each raw point interior to the
    * kept hull is compared against linear interpolation between its
    * bracketing kept points; output (series, n_raw, n_kept,
    * n_interior, max_err_q6, mean_err_q6). Errors are measured on
    * ×1e6 floor-quantized values: every operand (val and both bracket
    * vals) quantizes to int64 FIRST (`floor(val·1e6)` — one IEEE
    * multiply of the stored double, identical in any engine), then
    * the interpolation error is the pure-integer cross-multiplied
    * form |(vq−pq)·(nts−pts) − (nq−pq)·(ts−pts)| DIV (nts−pts) — no
    * float division/multiplication/fold past the quantization, so no
    * engine's arithmetic can perturb a single error unit (int64
    * headroom: q6 values ≤ ~1e11 × bracket gaps ≤ ~1e7 s keeps the
    * cross products under ~2e18 — ENFORCED at runtime: a row whose
    * |q6 delta| × gap would pass 2^61 raises instead of overflowing
    * into a plausible error number). max/mean are exact int64
    * aggregation; mean is one integer division, NULL when nothing is
    * interior. A raw point that IS its bucket's kept point brackets
    * to itself (error 0); raw points outside the hull are not
    * interior.
    *
    * Plan: the LTOB pass itself + ONE per-series window over the
    * tagged union of raw and kept rows (LOCF brackets in both
    * directions — the [[graft.engine.Interpolate]] idiom) + one
    * series-sized aggregation; the brackets ride the same series
    * exchange, nothing quadratic at any duplicate density. */
  def fidelityReport(points: DataFrame, bucket: Long): DataFrame = {
    val kept = ltob(points, bucket)
      .select(col("series"), col("ts"),
        expr("CAST(floor(val * 1e6) AS BIGINT)").as("vq"), lit(1L).as("flag"))
    val raw = points
      .select(col("series"), col("ts"),
        expr("CAST(floor(val * 1e6) AS BIGINT)").as("vq"), lit(0L).as("flag"))
    // kept rows sort FIRST at an equal ts (flag desc), so a raw row
    // that coincides with a kept point sees it as BOTH brackets
    val wp = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("flag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("series"))
      .orderBy(col("ts").desc, col("flag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE aggregation over the tagged union carries both the raw-side
    // error stats and the kept count — re-aggregating a second LTOB
    // subtree just to count keeps would pay the downsample window
    // twice (Catalyst does not dedupe the common subtree)
    raw.unionAll(kept)
      .withColumn("pts", last(when(col("flag") === 1L, col("ts")), ignoreNulls = true).over(wp))
      .withColumn("pq", last(when(col("flag") === 1L, col("vq")), ignoreNulls = true).over(wp))
      .withColumn("nts", last(when(col("flag") === 1L, col("ts")), ignoreNulls = true).over(wn))
      .withColumn("nq", last(when(col("flag") === 1L, col("vq")), ignoreNulls = true).over(wn))
      .withColumn("err_q6", expr(
        // headroom guard: each cross product must stay under 2^61 so
        // their difference stays inside int64 — a q6 delta × bracket
        // gap beyond that would OVERFLOW SILENTLY into a plausible
        // error number, the one failure mode a trust gate must never
        // have, so it raises instead (two int compares per interior
        // row, same codegen stage)
        """CASE WHEN flag = 0 THEN
          |  CASE WHEN nts = pts THEN abs(vq - pq)
          |  WHEN abs(vq - pq) > 2305843009213693952L DIV (nts - pts)
          |    OR abs(nq - pq) > 2305843009213693952L DIV (nts - pts)
          |  THEN CAST(raise_error(concat(
          |    'fidelityReport: int64 headroom exceeded (|q6 delta| x ',
          |    'bracket gap > 2^61) in series ', series,
          |    ' at ts ', CAST(ts AS STRING))) AS BIGINT)
          |  ELSE abs((vq - pq) * (nts - pts) - (nq - pq) * (ts - pts))
          |    DIV (nts - pts) END
          |ELSE CAST(NULL AS BIGINT) END""".stripMargin))
      .groupBy(col("series"))
      .agg(sum(when(col("flag") === 0L, 1L).otherwise(0L)).as("n_raw"),
        sum(col("flag")).as("n_kept"),
        sum(when(col("err_q6").isNotNull, 1L).otherwise(0L)).as("n_interior"),
        max(col("err_q6")).as("max_err_q6"),
        sum(col("err_q6")).as("sum_err_q6"))
      .select(col("series"), col("n_raw"), col("n_kept"), col("n_interior"),
        col("max_err_q6"),
        expr("CASE WHEN n_interior = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE sum_err_q6 DIV n_interior END").as("mean_err_q6"))
  }

  /** M4 downsampling (Jugel et al., VLDB 2014): per (series, bucket)
    * the four points a pixel column needs for error-free line
    * rendering — first, last, min, max — as ONE hash aggregation
    * with partial (map-side) combine: unlike [[ltob]] there is no
    * window pass at all, so M4 is the cheapest shape-exact
    * downsampler and the one to reach for when bucket counts are
    * pixel-sized. All selections are deterministic under duplicate
    * timestamps: first/last break ties by (ts, pid); the min/max
    * report their VALUE (tie-free) plus the earliest (ts, pid)
    * holding it. Pure int64 comparisons, no floats. */
  def m4(points: DataFrame, bucket: Long): DataFrame =
    points
      .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min_by(struct(col("ts"), col("val")),
          struct(col("ts"), col("pid"))).as("__f"),
        max_by(struct(col("ts"), col("val")),
          struct(col("ts"), col("pid"))).as("__l"),
        min(col("val")).as("v_min"),
        min_by(col("ts"),
          struct(col("val"), col("ts"), col("pid"))).as("ts_vmin"),
        max(col("val")).as("v_max"),
        max_by(col("ts"),
          struct(col("val"), -col("ts"), -col("pid"))).as("ts_vmax"))
      .select(col("series"), col("bucket"), col("n"),
        col("__f.ts").as("ts_first"), col("__f.val").as("v_first"),
        col("__l.ts").as("ts_last"), col("__l.val").as("v_last"),
        col("ts_vmin"), col("v_min"), col("ts_vmax"), col("v_max"))
}
