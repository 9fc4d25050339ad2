package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics per time bucket — the latency-
  * dashboard staple (p50/p95/p99 per series per window) and the
  * Prometheus-style cumulative value histogram. [[Sketches]] covers
  * the approximate path for cells too big to hold; these are the
  * EXACT forms, oracle-replayable to the last integer.
  *
  * [[bucketPercentiles]]: per (series, bucket) cell, the linear-
  * interpolated percentile (numpy/`quantile_cont` definition) in
  * fixed point: idx = (n−1)p/100 splits into an integer rank and a
  * /100 remainder, so q×100 = v[lo]·100 + (v[lo+1]−v[lo])·rem is
  * EXACT int64 arithmetic end to end — no floating point anywhere.
  * One hash aggregation into per-cell sorted arrays; memory is
  * cell-bounded (the same bound the reference's per-shard aggregate
  * loop has), and cells too large for that belong to the sketch path.
  *
  * [[valueHistogram]]: fixed-width value bins per series with the
  * Prometheus `le`-style cumulative count (running sum over bins
  * within the series — a bins-per-series-sized window, not a point
  * window). Pure integer arithmetic. */
object BucketStats {

  /** (series, bucket, n, p<P>_q100 ...) — `pcts` are integer
    * percents (e.g. 50, 95, 99); outputs are percentile × 100.
    *
    * `maxCell` (0 = unguarded) bounds the per-cell sorted buffer: the
    * exact form holds one cell's values in a single aggregation
    * buffer, so a skewed series at scale would OOM a task silently.
    * With the guard, an oversized cell raises the reference-style
    * loud error (the select_points_limit analog,
    * src/siri/db/listener.c:5598-5610) BEFORE the buffering
    * aggregation runs — the caller's remedies are the reference's
    * (narrower window, coarser bucket) or [[Sketches]]' bounded-memory
    * approximate path. The pre-check is one cheap count aggregation,
    * only paid when the guard is requested. */
  def bucketPercentiles(points: DataFrame, bucket: Long,
      pcts: Seq[Int], maxCell: Long = 0L): DataFrame = {
    if (maxCell > 0) {
      val worst = points
        .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("mx")).head()
      val mx = if (worst.isNullAt(0)) 0L else worst.getLong(0)
      if (mx > maxCell)
        throw graft.parser.QueryError(
          s"Query has reached the maximum number of selected points " +
            s"($maxCell). Please use another time window, an " +
            s"aggregation function or select less series to reduce " +
            s"the number of points.")
    }
    val g = points.groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
      .agg(sort_array(collect_list(col("val"))).as("vs"),
        count(lit(1)).as("n"))
    val withP = pcts.foldLeft(g) { (df, p) =>
      val lo = s"CAST((n - 1) * $p DIV 100 AS INT)"
      val rem = s"(n - 1) * $p % 100"
      df.withColumn(s"p${p}_q100", expr(
        s"CAST(vs[$lo] * 100 + (CASE WHEN $rem = 0 THEN 0 ELSE (vs[$lo + 1] - vs[$lo]) * ($rem) END) AS BIGINT)"))
    }
    withP.select(col("series") +: col("bucket") +: col("n") +:
      pcts.map(p => col(s"p${p}_q100")): _*)
  }

  /** (series, bin, n_points, cum_points) with bins of `binWidth`
    * value units; cum_points counts vals in bins <= this one.
    * Binning uses FLOOR division (val − pmod, exact integer): plain
    * truncating DIV would fold (−binWidth, binWidth) into one
    * double-width bin 0, silently skewing histograms of signed data
    * around zero — with floor every bin covers exactly binWidth
    * values, negative or not. */
  def valueHistogram(points: DataFrame, binWidth: Long): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points.groupBy(col("series"),
        expr(s"(val - pmod(val, $binWidth)) DIV $binWidth").as("bin"))
      .agg(count(lit(1)).as("n_points"))
      .withColumn("cum_points", sum(col("n_points")).over(w))
  }

  /** Prometheus-style `histogram_quantile`: per-series percentiles
    * READ OFF the [[valueHistogram]] bins — rank located in the
    * cumulative counts, then linear interpolation WITHIN the bin
    * (uniform-within-bin assumption, exactly Prometheus semantics).
    * This is the percentile path whose memory is bounded by the BIN
    * count, never the cell count — the standing answer to
    * [[bucketPercentiles]]' `maxCell` guard when cells outgrow the
    * exact sorted-array form but a fixed value resolution is fine.
    *
    * Fully distributed: the histogram is one hash agg + a
    * bins-per-series window; per-series totals broadcast back; the
    * quantile row is a FILTER (the unique bin where the target rank
    * falls), never a collect. Exact int64 fixed point end to end:
    * target = ⌈n·p/100⌉ and q_q6 = lo·10⁶ + width·(target−below)·10⁶
    * DIV n_bin — engine-reproducible to the last digit.
    * Output: (series, p, n, q_q6). */
  def histogramQuantile(points: DataFrame, binWidth: Long,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    // the bin table feeds TWO consumers (totals agg + the quantile
    // join): pin it — it is bin-count-sized, but its LINEAGE is the
    // whole upstream, and compositions feed expensive frames in here
    // (ev_funnel_ttc re-ran the entire funnel per consumer before
    // this: 0.94→5.9 s at 10× data; pinned, the upstream runs once)
    val hist = valueHistogram(points, binWidth).localCheckpoint(eager = true)
    val totals = hist.groupBy(col("series"))
      .agg(max(col("cum_points")).as("n"))
    hist.join(broadcast(totals), Seq("series"))
      .select(col("series"), col("bin"), col("n_points"),
        col("cum_points"), col("n"),
        explode(lit(pcts.toArray.map(_.toLong))).as("p"))
      .withColumn("__target", expr("(n * p + 99L) DIV 100L"))
      .where(col("cum_points") >= col("__target") &&
        col("cum_points") - col("n_points") < col("__target"))
      .select(col("series"), col("p"), col("n"), expr(
        s"bin * $binWidth * 1000000L + $binWidth * " +
          "(__target - (cum_points - n_points)) * 1000000L DIV n_points")
        .as("q_q6"))
  }

  /** Time × value density grid — what a Grafana/heatmap panel renders
    * (each column a time bucket, each row a value bin, cell intensity
    * = point count): ONE hash aggregation over (series, time bucket,
    * value bin), floor-division binning identical to
    * [[valueHistogram]] so signed data stays uniform around zero.
    * Output (series, bucket, bin, n_points) — the sparse grid; empty
    * cells are absent, renderers fill them. Map-side combine reduces
    * the shuffle to the occupied-cell count, never the point count. */
  def timeValueHeatmap(points: DataFrame, bucket: Long,
      binWidth: Long): DataFrame = {
    require(bucket > 0 && binWidth > 0, "bucket and binWidth must be positive")
    points
      .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"),
        expr(s"(val - ((val % $binWidth) + $binWidth) % $binWidth) DIV $binWidth")
          .as("bin"))
      .agg(count(lit(1)).as("n_points"))
  }

  /** Exact distinct-value count per (series, bucket) — InfluxDB
    * `COUNT(DISTINCT)`: cardinality of the value set per cell, next
    * to [[bucketMode]]'s plurality pick. Exact two-phase aggregation
    * (partial distinct per partition, merge); cells whose
    * cardinality can spill at 100 TB belong to the HLL sketch path
    * ([[Sketches]]), same division of labor as percentiles. */
  def distinctCount(points: DataFrame, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    points
      .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
      .agg(count_distinct(col("val")).as("n_distinct"),
        count(lit(1)).as("n_points"))
  }

  /** Most frequent value per (series, bucket) — InfluxDB `MODE()`:
    * the per-cell plurality value, with the DETERMINISTIC tie-break
    * every engine needs to agree on (highest count wins, then the
    * SMALLEST value — InfluxDB's own rule is "lowest value on tie").
    * Output (series, bucket, mode_val, n_mode).
    *
    * Spark-first: two hash aggregations, no windows, no sorted
    * buffers — (series, bucket, val) counts (map-side combined), then
    * min_by over a (-count, val) struct picks the plurality value
    * with the tie-break encoded in the ordering (struct comparison is
    * lexicographic: smallest -count = highest count, then the smaller
    * value wins equal counts). The COUNT is negated, not the value —
    * counts are ≥ 1 so the negation can never overflow, whereas
    * -val would fault under ANSI on a cell containing
    * Long.MinValue. Cell memory is O(1) per distinct value, never a
    * buffered array — the exact form scales to cells
    * [[bucketPercentiles]] would need its maxCell guard for. */
  def bucketMode(points: DataFrame, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    points
      .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"),
        col("val"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("series"), col("bucket"))
      .agg(
        min_by(col("val"), struct((-col("__c")).as("__nc"), col("val")))
          .as("mode_val"),
        max(col("__c")).as("n_mode"))
  }

  /** Multi-resolution rollup pyramid — the continuous-aggregate
    * cascade a TSDB maintains (1h → 6h → 1d): every coarser level
    * re-aggregates the level BELOW it, not raw points, so raw data is
    * read and shuffled exactly once and each further level costs a
    * rollup-sized (not point-sized) aggregation — count/sum/min/max
    * all compose exactly. A GROUPING SETS form would recompute every
    * level from raw points (3× the shuffle) for the same answer.
    * Output (series, res, bucket_start, n_points, sum_val, min_val,
    * max_val) with res ∈ {'1h','6h','1d'} and bucket_start in
    * seconds; all exact int64. */
  def rollupPyramid(points: DataFrame): DataFrame = {
    val h1 = points
      .groupBy(col("series"), expr("ts DIV 3600").as("b"))
      .agg(count(lit(1)).as("n_points"), sum(col("val")).as("sum_val"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"))
    def up(lower: DataFrame, factor: Int) = lower
      .groupBy(col("series"), expr(s"b DIV $factor").as("b"))
      .agg(sum(col("n_points")).as("n_points"), sum(col("sum_val")).as("sum_val"),
        min(col("min_val")).as("min_val"), max(col("max_val")).as("max_val"))
    val h6 = up(h1, 6)
    val d1 = up(h6, 4)
    def shape(df: DataFrame, res: String, width: Long) = df.select(
      col("series"), lit(res).as("res"), (col("b") * width).as("bucket_start"),
      col("n_points"), col("sum_val"), col("min_val"), col("max_val"))
    shape(h1, "1h", 3600L)
      .unionByName(shape(h6, "6h", 21600L))
      .unionByName(shape(d1, "1d", 86400L))
  }
}
