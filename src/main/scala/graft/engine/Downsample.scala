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
