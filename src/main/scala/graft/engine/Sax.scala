package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SAX-style symbolization — each series compressed to one small-
  * alphabet symbol per bucket (the PAA mean of the bucket mapped into
  * `alphabet` level bands), the representation motif mining /
  * similarity-by-shape tooling consumes instead of raw points.
  *
  * This is the min-max-normalized variant, not the classic z-score
  * one, deliberately: z-normalization needs σ (a square root), which
  * cross-engine comparisons near breakpoints can't replay exactly —
  * min-max banding stays INTEGER end to end. The PAA mean s/c never
  * materializes as a fraction: the band index floor((s − vmin·c)·A /
  * ((vmax − vmin + 1)·c)) multiplies through by the count, numerator
  * and denominator both int64 and nonnegative (s ≥ vmin·c by
  * definition of vmin), so truncating division IS floor in both
  * engines. The +1 on the value span pins the max-valued bucket to
  * band A−1 without a special case. Two hash aggregations (per-bucket
  * sums, per-series extremes) + one broadcast join back — points
  * shuffle once on (series, bucket). Headroom: (vmax−vmin)·c·A within
  * int64 — comfortable for any real alphabet/bucket sizing. */
object Sax {

  /** (series, bucket, n_points, sym) with sym in [0, alphabet). */
  def symbolize(points: DataFrame, bucket: Long = 3600L,
      alphabet: Int = 8): DataFrame = {
    val g = points.groupBy(col("series"),
        expr(s"ts DIV $bucket").as("bucket"))
      .agg(sum(col("val")).as("s"), count(lit(1)).as("n_points"))
    val mm = points.groupBy(col("series"))
      .agg(min(col("val")).as("vmin"), max(col("val")).as("vmax"))
    g.join(broadcast(mm), Seq("series"))
      .select(col("series"), col("bucket"), col("n_points"),
        expr(s"((s - vmin * n_points) * $alphabet) DIV " +
          "((vmax - vmin + 1) * n_points)").as("sym"))
  }
}
