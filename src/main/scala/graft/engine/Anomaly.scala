package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series anomaly detection — the alerting layer a monitoring
  * deployment runs ON TOP of a TSDB, expressed as two operators the
  * reference's query language has no equivalent for.
  *
  * [[seasonalZ]]: each point z-scored against its series' seasonal
  * baseline (same hour-of-day), so a value that is normal at peak
  * hour but 4σ out at 3am is flagged. The baseline is one hash
  * aggregation of EXACT integer moments (n, Σv, Σv²) per
  * (series, hour) — 24 rows per series, broadcast back onto the
  * points so the corpus never shuffles for the join; mu/sd/z then
  * follow by one fixed sequence of correctly-rounded IEEE ops from
  * integers, so every z is bit-identical in any engine (the same
  * exact-moment pattern as llm.Ann.embedOutliers; exact while
  * Σv² < 2^63 — here val ≤ ~5.6e4 ⇒ ~3e9 points per cell).
  *
  * [[thresholdCross]]: alert-edge detection — emit only the points
  * where the series crosses a threshold (up: prev < T ≤ val; down:
  * prev ≥ T > val), i.e. the alert START/STOP transitions rather
  * than every breaching sample. One lag window pass, pure integer
  * comparisons, output is transition-sized (≪ input). */
object Anomaly {

  private def withHour(points: DataFrame): DataFrame =
    points.select(col("series"), col("ts"), col("pid"), col("val"))
      .withColumn("hour", expr("(ts DIV 3600) % 24"))

  /** The one shared pre-check for operators that buffer a whole cell
    * in a sorted array: one cheap count aggregation finds the largest
    * cell of `grouped`, and a cell over `maxCell` raises the
    * reference's loud selected-points error (remedies named) instead
    * of letting the buffering aggregation OOM a task silently. */
  private def guardCellSize(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      maxCell: Long): Unit = {
    val worst = grouped.agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head()
    val mx = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    if (mx > maxCell)
      throw graft.parser.QueryError(
        s"Query has reached the maximum number of selected points " +
          s"($maxCell). Please use another time window, an " +
          s"aggregation function or select less series to reduce " +
          s"the number of points.")
  }

  /** The trained baseline table: exact integer moments per
    * (series, hour-of-day) — 24 rows per series. This is the frame a
    * deployment persists and retrains on its own cadence; both the
    * batch scorer ([[seasonalZ]]) and the streaming scorer
    * ([[streamingSeasonalZ]]) consume it unchanged. */
  def seasonalBaselines(points: DataFrame): DataFrame =
    withHour(points).groupBy(col("series"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("s1"),
        sum(col("val") * col("val")).as("s2"))

  private def scoreAgainst(p: DataFrame, baselines: DataFrame,
      zCut: Double): DataFrame =
    p.join(broadcast(baselines), Seq("series", "hour"))
      .withColumn("mu", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("sd", sqrt(greatest(
        col("s2").cast("double") / col("n").cast("double") - col("mu") * col("mu"),
        lit(0.0))))
      .withColumn("z", when(col("sd") === 0.0, lit(0.0))
        .otherwise((col("val").cast("double") - col("mu")) / col("sd")))
      .select(col("series"), col("ts"), col("pid"), col("val"), col("hour"),
        expr("CAST(floor(z * 1e6) AS BIGINT)").as("zq"),
        (abs(col("z")) > zCut).as("is_anomaly"))

  /** (series, ts, pid, val, hour, zq, is_anomaly) — zq is the
    * seasonal z-score floor-quantized ×1e6. */
  def seasonalZ(points: DataFrame, zCut: Double = 3.0): DataFrame =
    scoreAgainst(withHour(points), seasonalBaselines(points), zCut)

  /** Streaming scorer — the live half of the alerting deployment:
    * arriving points are scored the moment they land against a
    * BATCH-trained [[seasonalBaselines]] table via a stream-static
    * broadcast join. Stateless — no state store, no watermark,
    * append-mode with any sink — and a streamed point gets exactly
    * the zq/is_anomaly a batch re-score through the same baseline
    * table would give it (same exact-moment arithmetic). */
  def streamingSeasonalZ(stream: DataFrame, baselines: DataFrame,
      zCut: Double = 3.0): DataFrame =
    scoreAgainst(withHour(stream), baselines, zCut)

  /** Robust (median/MAD) anomaly score — [[seasonalZ]]'s mean/stddev
    * baseline is itself dragged by the outliers it is hunting; the
    * Iglewicz–Hoaglin modified z replaces it with the same-hour
    * MEDIAN and median-absolute-deviation, both computed as EXACT
    * lower-median element selections (the reference's own median_low
    * semantics) so every number is an integer and the oracle replays
    * them bit-for-bit. rz_q6 = (val − med)·10⁶ floor-divided by mad
    * (pmod form — the difference is signed); the anomaly flag is the
    * classic 0.6745·|val − med|/mad > 3.5 cut, cross-multiplied to
    * the exact integer test 6745·|val − med| > 35000·mad (needs
    * |val| ≲ 1.3e15 — far above the engine's value range).
    *
    * Scale shape: two per-(series, hour) sorted-array aggregations
    * (cell-bounded like [[BucketStats.bucketPercentiles]] — cells the
    * exact form outgrows belong to the sketch path) + the 24-rows-
    * per-series stats broadcast back; points never shuffle for the
    * scoring join. A cell holds ~1/24 of a series' points — unbounded
    * in the corpus — so the same `maxCell` guard as
    * [[bucketPercentiles]]/[[tukeyOutliers]] applies (0 = unguarded):
    * an oversized (series, hour) cell raises the reference-style loud
    * error before the buffering aggregation can OOM a task silently;
    * the remedies are a narrower time window or the [[Sketches]]
    * quantile path. Output (series, ts, pid, val, hour, med, mad,
    * rz_q6, is_anomaly). */
  def robustZ(points: DataFrame, maxCell: Long = 0L): DataFrame = {
    val p = withHour(points)
    if (maxCell > 0)
      guardCellSize(p.groupBy(col("series"), col("hour")), maxCell)
    val med = p.groupBy(col("series"), col("hour"))
      .agg(expr("sort_array(collect_list(val))").as("__vs"))
      .select(col("series"), col("hour"), expr(
        "element_at(__vs, CAST((size(__vs) - 1) DIV 2 + 1 AS INT))")
        .as("med"))
    val stats = p.join(broadcast(med), Seq("series", "hour"))
      .groupBy(col("series"), col("hour"))
      .agg(max(col("med")).as("med"),
        expr("sort_array(collect_list(abs(val - med)))").as("__ds"))
      .select(col("series"), col("hour"), col("med"), expr(
        "element_at(__ds, CAST((size(__ds) - 1) DIV 2 + 1 AS INT))")
        .as("mad"))
    p.join(broadcast(stats), Seq("series", "hour"))
      .select(col("series"), col("ts"), col("pid"), col("val"),
        col("hour"), col("med"), col("mad"),
        expr("""CASE WHEN mad = 0 THEN 0L ELSE
          ((val - med) * 1000000L
            - ((((val - med) * 1000000L) % mad) + mad) % mad) DIV mad
          END""").as("rz_q6"),
        expr("mad > 0 AND 6745L * abs(val - med) > 35000L * mad")
          .as("is_anomaly"))
  }

  /** Tukey-fence outliers — the boxplot rule per series: flag points
    * beyond q3 + 1.5·IQR / below q1 − 1.5·IQR. Quartiles are EXACT
    * lower-element selections at rank (n−1)·p DIV 100 (the
    * [[BucketStats.bucketPercentiles]] position convention without the
    * fractional interpolation — fences don't need sub-element
    * resolution and staying on elements keeps everything int64), and
    * the 1.5 factor cross-multiplies: 2·val > 2·q3 + 3·IQR. One
    * sorted-array aggregation per series is broadcast back; points
    * never shuffle. Output = outlier rows only
    * (series, ts, pid, val, q1, q3).
    *
    * The quartile buffer holds a WHOLE series' values — bigger than
    * [[BucketStats.bucketPercentiles]]'s per-(series, bucket) cells —
    * so the same `maxCell` guard applies (0 = unguarded): an
    * oversized series raises the reference-style loud error before
    * the buffering aggregation can OOM a task silently; the remedies
    * are a narrower time window or the [[Sketches]] quantile path. */
  def tukeyOutliers(points: DataFrame, maxCell: Long = 0L): DataFrame = {
    if (maxCell > 0) guardCellSize(points.groupBy(col("series")), maxCell)
    val f = points.groupBy(col("series"))
      .agg(expr("sort_array(collect_list(val))").as("__vs"),
        count(lit(1)).as("n"))
      .select(col("series"),
        expr("element_at(__vs, CAST((n - 1) * 25 DIV 100 AS INT) + 1)")
          .as("q1"),
        expr("element_at(__vs, CAST((n - 1) * 75 DIV 100 AS INT) + 1)")
          .as("q3"))
    points.join(broadcast(f), Seq("series"))
      .where(col("val") * 2L > col("q3") * 2L + (col("q3") - col("q1")) * 3L ||
        col("val") * 2L < col("q1") * 2L - (col("q3") - col("q1")) * 3L)
      .select(col("series"), col("ts"), col("pid"), col("val"),
        col("q1"), col("q3"))
  }

  /** Incident intervals — anomalous POINTS merged into the incidents
    * an on-call human actually pages on: consecutive [[robustZ]]
    * anomalies on a series (gaps ≤ `maxGap` seconds apart) collapse
    * into one (start_ts, end_ts, n_points, peak |rz|) row. The
    * interval walk runs on the ANOMALY frame only — typically orders
    * of magnitude smaller than points — via the sessionize idiom: one
    * lag() marks gap-exceeding starts, one running sum numbers the
    * intervals, one hash agg summarizes them. Integer end to end.
    * `maxCell` passes through to the composed [[robustZ]] (same
    * guard, same loud error, 0 = unguarded). */
  def anomalyIntervals(points: DataFrame, maxGap: Long = 7200L,
      maxCell: Long = 0L): DataFrame = {
    val a = robustZ(points, maxCell).where(col("is_anomaly"))
      .select(col("series"), col("ts"), col("rz_q6"))
    val w = Window.partitionBy(col("series")).orderBy(col("ts").asc)
    val run = Window.partitionBy(col("series")).orderBy(col("ts").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts") - col("__prev") > maxGap, 1L).otherwise(0L))
      .withColumn("interval_id", sum(col("__new")).over(run))
      .groupBy(col("series"), col("interval_id"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_points"),
        max(abs(col("rz_q6"))).as("peak_rz_q6"))
  }

  /** (series, ts, pid, val, prev, direction) at threshold-crossing
    * transitions only. */
  def thresholdCross(points: DataFrame, threshold: Long): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
    points.select(col("series"), col("ts"), col("pid"), col("val"))
      .withColumn("prev", lag(col("val"), 1).over(w))
      .where(col("prev").isNotNull &&
        ((col("prev") < threshold && col("val") >= threshold) ||
          (col("prev") >= threshold && col("val") < threshold)))
      .withColumn("direction",
        when(col("val") >= threshold, lit("up")).otherwise(lit("down")))
  }

  /** The previous sample carried across micro-batches — 3 longs per
    * series, the smallest alerting state possible. */
  final case class CrossState(ts: Long, pid: Long, value: Long)

  /** One crossing event. */
  final case class Crossing(series: String, ts: Long, pid: Long,
      `val`: Long, prev: Long, direction: String)

  /** Streaming alert edges — the live half of [[thresholdCross]]:
    * arriving points emit up/down transitions the moment they land,
    * with the per-series previous sample held in
    * flatMapGroupsWithState state (O(#series) rows of 3 longs — the
    * lag() a batch window provides, carried across micro-batches).
    * Points are ordered by (ts, pid) WITHIN each micro-batch, so
    * intra-batch disorder folds exactly like the batch operator; a
    * point arriving in a LATER batch than its successor is scored
    * against the newest seen sample (alerting is a now-facing
    * decision — re-running [[thresholdCross]] over the settled store
    * is the audit path, and with per-series in-order feeds the two
    * agree event-for-event, which StreamingSpec pins). Append mode,
    * transition-sized output.
    *
    * State is BOUNDED BY REPORTING SERIES, not all series ever seen:
    * once the watermark passes a series' newest sample + `idleEvict`
    * seconds its 3-long state is EVICTED (event-time timeout — the
    * [[graft.engine.Funnel.streamingFunnel]] pattern), so a fleet
    * with series churn holds state only for series that reported
    * within the idle horizon. A retired series RE-TRAINS on its next
    * arrival: the first sample back emits no edge (the same
    * first-sample rule a brand-new series gets) — the one documented
    * live-vs-batch divergence across an idle gap longer than
    * idleEvict; the settled batch [[thresholdCross]] is the audit.
    * `maxLateness` sets the watermark delay: an event arriving in a
    * LATER micro-batch more than maxLateness behind the newest event
    * time seen is silently dropped by Spark. The fold itself is
    * MONOTONE: an admitted cross-batch event at or behind the held
    * newest (ts, pid) is ignored rather than folded against the
    * newer held sample (which would emit edges the batch operator
    * never produces and regress the held state), so cross-batch
    * disorder costs at most a missed edge, never a spurious one —
    * the settled batch twin is the audit for the missed ones.
    * Intra-batch disorder is always safe: each slice is sorted
    * before folding. */
  def streamingThresholdCross(stream: DataFrame,
      threshold: Long, idleEvict: Long = 86400L,
      maxLateness: Long = 3600L): Dataset[Crossing] = {
    require(idleEvict > 0 && maxLateness >= 0,
      "need idleEvict > 0 and maxLateness >= 0")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("series"), col("ts"), col("pid"), col("val"),
        timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .as[(String, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String,
         rows: Iterator[(String, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[CrossState]) =>
          if (state.hasTimedOut) {
            // no sample for idleEvict: retire the series — a later
            // arrival re-trains exactly like a brand-new series
            state.remove()
            Iterator.empty
          } else {
            // one series' micro-batch slice: sort by (ts, pid) so
            // intra-batch disorder cannot reorder the edge stream
            val batch = rows.toArray.sortBy(r => (r._2, r._3))
            var prev = state.getOption
            val out = Vector.newBuilder[Crossing]
            batch.foreach { case (_, ts, pid, v, _) =>
              // monotone guard: a cross-batch late event at or behind
              // the held newest sample is ignored — folding it against
              // the NEWER held sample would emit an edge the batch
              // operator never produces and regress the held state
              val stale = prev.exists(p =>
                ts < p.ts || (ts == p.ts && pid <= p.pid))
              if (!stale) {
                prev.foreach { p =>
                  if (p.value < threshold && v >= threshold)
                    out += Crossing(series, ts, pid, v, p.value, "up")
                  else if (p.value >= threshold && v < threshold)
                    out += Crossing(series, ts, pid, v, p.value, "down")
                }
                prev = Some(CrossState(ts, pid, v))
              }
            }
            prev.foreach { p =>
              state.update(p)
              // clamp above the current watermark — Spark rejects a
              // timeout at or below it (possible replaying history)
              state.setTimeoutTimestamp(math.max(
                (p.ts + idleEvict) * 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            }
            out.result().iterator
          }
      }
  }

  /** Multi-window multi-burn-rate SLO alert (the Google SRE workbook
    * recipe): a sample is BAD when val > threshold; the burn rate of
    * a window is its bad-sample fraction divided by the error budget
    * `budgetNum/budgetDen`, and a page fires only where BOTH the
    * short window (fast detection) and the long window (sustained
    * burn — filters blips) exceed `factorX10/10` × budget. This is
    * the alerting layer's "error-budget is burning 14.4× too fast"
    * policy, expressed as ONE declarative pass.
    *
    * Exactness: bad/total counts come from two RANGE frames over the
    * same per-series ts ordering (the [[MovingAgg.trailingTime]]
    * shape — one shuffle, window-function reuse), and both rate
    * comparisons cross-multiply to pure int64 tests
    * (bad·10·budgetDen ≥ factorX10·budgetNum·n), so no float ever
    * appears. Alert-sized output (series, ts, short_bad, short_n,
    * long_bad, long_n). Headroom: bad·10·budgetDen < 2^63 — bounded
    * by window sample count × budgetDen, never by val. */
  def sloBurn(points: DataFrame, threshold: Long,
      shortWin: Long = 3600L, longWin: Long = 21600L,
      budgetNum: Long = 1L, budgetDen: Long = 100L,
      factorX10: Long = 144L): DataFrame = {
    require(shortWin > 0 && longWin > shortWin,
      "need 0 < shortWin < longWin")
    require(budgetNum > 0 && budgetDen >= budgetNum && factorX10 > 0,
      "budget must be a fraction in (0,1], factorX10 positive")
    val ws = Window.partitionBy(col("series")).orderBy(col("ts").asc)
      .rangeBetween(-(shortWin - 1L), Window.currentRow)
    val wl = Window.partitionBy(col("series")).orderBy(col("ts").asc)
      .rangeBetween(-(longWin - 1L), Window.currentRow)
    val burn = (bad: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =>
      bad * lit(10L) * lit(budgetDen) >= lit(factorX10) * lit(budgetNum) * n
    points.select(col("series"), col("ts"),
        when(col("val") > threshold, 1L).otherwise(0L).as("__bad"))
      .withColumn("short_bad", sum(col("__bad")).over(ws))
      .withColumn("short_n", count(lit(1)).over(ws))
      .withColumn("long_bad", sum(col("__bad")).over(wl))
      .withColumn("long_n", count(lit(1)).over(wl))
      .where(burn(col("short_bad"), col("short_n")) &&
        burn(col("long_bad"), col("long_n")))
      .select(col("series"), col("ts"), col("short_bad"), col("short_n"),
        col("long_bad"), col("long_n"))
  }

  /** Trailing sample window carried across micro-batches: the (ts,
    * badness) pairs inside the long window — bounded by
    * longWin × sample rate per series, never the stream's history. */
  final case class BurnState(ts: Array[Long], bad: Array[Long])

  /** One live burn-rate page. */
  final case class BurnAlert(series: String, ts: Long, short_bad: Long,
      short_n: Long, long_bad: Long, long_n: Long)

  /** Live SLO burn alerts — the streaming half of [[sloBurn]]: each
    * arriving point joins the per-series trailing-longWin sample
    * window held in state (trimmed as the window slides, so state is
    * rate × longWin pairs per series — the exact sliding window an
    * alert needs, never the full history), and a page is emitted the
    * moment BOTH windows burn. Points sort by ts within each
    * micro-batch, and equal-ts peers are inserted BEFORE any of them
    * is scored — replicating the batch RANGE frame's peer semantics —
    * so after any prefix of an in-order stream the emitted pages
    * equal [[sloBurn]] over the points seen so far (StreamingSpec
    * pins). A late point older than the held window's newest sample
    * is scored against the current window (alerting is now-facing;
    * the batch replay is the audit). Append mode, alert-sized
    * output. Per-point cost is O(window samples) — the alerting rates
    * this exists for (scrape intervals of seconds to minutes) keep
    * that a few thousand comparisons.
    *
    * State retires with the series: once the watermark passes a
    * series' newest sample + longWin, every held pair is outside any
    * window a future point could open, so the state is EVICTED
    * (event-time timeout) — output-invariant by construction, and the
    * store stays bounded by series REPORTING within the long window
    * rather than all series ever seen. `maxLateness` is the
    * cross-batch disorder budget (watermark delay): later-batch
    * events more than maxLateness behind the newest event time are
    * silently dropped by Spark; the 3600 s default trades an hour of
    * extra retention for an hour of transport skew. */
  def streamingSloBurn(stream: DataFrame, threshold: Long,
      shortWin: Long = 3600L, longWin: Long = 21600L,
      budgetNum: Long = 1L, budgetDen: Long = 100L,
      factorX10: Long = 144L,
      maxLateness: Long = 3600L): Dataset[BurnAlert] = {
    require(shortWin > 0 && longWin > shortWin,
      "need 0 < shortWin < longWin")
    require(maxLateness >= 0, "need maxLateness >= 0")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("series"), col("ts"),
        when(col("val") > threshold, 1L).otherwise(0L).as("bad"),
        timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String,
         rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[BurnState]) =>
          if (state.hasTimedOut) {
            // the watermark passed newest + longWin: nothing held can
            // ever sit inside a future window — drop the series
            state.remove()
            Iterator.empty
          } else {
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            state.getOption.foreach(st =>
              st.ts.indices.foreach(i => buf += ((st.ts(i), st.bad(i)))))
            val out = Vector.newBuilder[BurnAlert]
            def burns(b: Long, n: Long) =
              b * 10L * budgetDen >= factorX10 * budgetNum * n
            // whole equal-ts groups land before any member is scored —
            // the batch RANGE frame's peer visibility
            rows.toArray.sortBy(_._2).groupBy(_._2).toSeq.sortBy(_._1)
              .foreach { case (ts, grp) =>
                grp.foreach { case (_, t, bad, _) => buf += ((t, bad)) }
                val keep = buf.filter(_._1 > ts - longWin).sortBy(_._1)
                buf.clear(); buf ++= keep
                var sb = 0L; var sn = 0L; var lb = 0L; var ln = 0L
                buf.foreach { case (t, bad) =>
                  if (t > ts - longWin && t <= ts) {
                    lb += bad; ln += 1
                    if (t > ts - shortWin) { sb += bad; sn += 1 }
                  }
                }
                if (burns(sb, sn) && burns(lb, ln))
                  grp.foreach(_ => out += BurnAlert(series, ts, sb, sn, lb, ln))
              }
            state.update(BurnState(buf.map(_._1).toArray,
              buf.map(_._2).toArray))
            if (buf.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                (buf.map(_._1).max + longWin) * 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            out.result().iterator
          }
      }
  }

  /** Tabular CUSUM drift detector (Page 1954, the textbook two-sided
    * form) over the HOURLY ROLLUP: the first `base` observed buckets
    * of the trailing `lastN` train a baseline (μ, σ via one
    * fixed-order fold), then the cumulative sums
    *   S⁺ = max(0, S⁺ + (y − μ − k·σ)),  S⁻ = max(0, S⁻ + (μ − y − k·σ))
    * walk the remaining buckets and an alarm row (series, bucket,
    * side ±1, S/σ ×1e6) is emitted whenever either sum crosses h·σ,
    * after which that sum RESETS — restart detection, so output is
    * alarm-sized, not breach-sized. CUSUM accumulates many small
    * shifts the per-point detectors ([[seasonalZ]], [[robustZ]])
    * never see — the sustained-drift complement to [[thresholdCross]]
    * (level) and SeriesMath.changepoints (single split).
    *
    * Gap policy: the walk steps over OBSERVED buckets — a gap just
    * skips steps. Unlike Holt-Winters (where a hole misaligns every
    * later seasonal slot) CUSUM has no positional state, so dropping
    * holed series would only shrink coverage; drift against the
    * baseline mean is well-defined on the observed sequence.
    *
    * Scale shape: the [[graft.engine.Forecast]] fold pattern —
    * trailing-N buckets per series via WindowGroupLimit, ONE hash
    * aggregation, one SQL `aggregate` whose accumulator carries the
    * running sums plus the (bounded, alarm-sized) alarm array; cell
    * memory lastN-bounded by construction. Baseline-constant series
    * (σ = 0 — no scale for k·σ or h·σ) are dropped, as are series
    * with fewer than `minBuckets` observed buckets. Determinism: the
    * bucket sums are exact int64; the walk is one order-fixed IEEE
    * sequence spelled textually identically in the oracle's
    * recursive CTE, and S/σ is floor-quantized ×1e6. */
  def cusum(points: DataFrame, lastN: Int = 168, base: Int = 24,
      k: Double = 0.5, h: Double = 5.0, minBuckets: Int = 48,
      bucketSec: Long = 3600L): DataFrame = {
    require(lastN >= base + 1 && base >= 2, "need lastN > base >= 2")
    require(minBuckets > base && minBuckets <= lastN,
      "need base < minBuckets <= lastN")
    require(k >= 0.0 && h > 0.0, "need k >= 0 and h > 0")
    val hourly = points
      .groupBy(col("series"),
        expr(s"ts div $bucketSec").as("bucket"))
      .agg(sum(col("val")).cast("long").cast("double").as("y"))
    val w = Window.partitionBy(col("series")).orderBy(col("bucket").desc)
    val recent = hourly
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= lastN)
    // the up/down candidate sums appear in three branches each —
    // spelled out identically every time, in both engines, so the
    // comparison and the stored value are the same double
    val up = s"greatest(0.0, s.sp + (e.y - s.mu - $k * s.sg))"
    val dn = s"greatest(0.0, s.sn + (s.mu - e.y - $k * s.sg))"
    val fold =
      s"""aggregate(slice(__a, 2, $lastN),
         |  struct(1 AS i,
         |    element_at(__a, 1).y AS sy,
         |    element_at(__a, 1).y * element_at(__a, 1).y AS syy,
         |    CAST(NULL AS DOUBLE) AS mu, CAST(NULL AS DOUBLE) AS sg,
         |    CAST(0.0 AS DOUBLE) AS sp, CAST(0.0 AS DOUBLE) AS sn,
         |    CAST(array() AS ARRAY<STRUCT<bucket: BIGINT, side: BIGINT, s: DOUBLE>>) AS al),
         |  (s, e) -> struct(
         |    s.i + 1 AS i,
         |    CASE WHEN s.i + 1 <= $base THEN s.sy + e.y ELSE s.sy END AS sy,
         |    CASE WHEN s.i + 1 <= $base THEN s.syy + e.y * e.y ELSE s.syy END AS syy,
         |    CASE WHEN s.i + 1 = $base THEN (s.sy + e.y) / $base.0 ELSE s.mu END AS mu,
         |    CASE WHEN s.i + 1 = $base THEN sqrt((s.syy + e.y * e.y) / $base.0 - ((s.sy + e.y) / $base.0) * ((s.sy + e.y) / $base.0)) ELSE s.sg END AS sg,
         |    CASE WHEN s.i + 1 <= $base THEN 0.0
         |         WHEN $up > $h * s.sg THEN 0.0
         |         ELSE $up END AS sp,
         |    CASE WHEN s.i + 1 <= $base THEN 0.0
         |         WHEN $dn > $h * s.sg THEN 0.0
         |         ELSE $dn END AS sn,
         |    CASE WHEN s.i + 1 <= $base THEN s.al
         |         WHEN $up > $h * s.sg THEN array_append(s.al,
         |           named_struct('bucket', e.bucket, 'side', CAST(1 AS BIGINT), 's', $up))
         |         WHEN $dn > $h * s.sg THEN array_append(s.al,
         |           named_struct('bucket', e.bucket, 'side', CAST(-1 AS BIGINT), 's', $dn))
         |         ELSE s.al END AS al),
         |  s -> struct(s.sg AS sg, s.al AS al))""".stripMargin
    recent.groupBy(col("series"))
      .agg(expr("array_sort(collect_list(struct(bucket, y)))").as("__a"),
        count(lit(1)).as("n"))
      .where(col("n") >= minBuckets)
      .select(col("series"), expr(fold).as("__s"))
      .where(col("__s.sg") > 0d)
      .select(col("series"), explode(col("__s.al")).as("a"),
        col("__s.sg").as("__sg"))
      .select(col("series"), col("a.bucket").as("bucket"),
        col("a.side").as("side"),
        floor(col("a.s") / col("__sg") * lit(1e6)).cast("long")
          .as("s_sigma_q6"))
  }

  /** Trailing bucket-sum table carried across micro-batches (≤
    * lastN+1 exact int64 sums per series — the [[graft.engine.
    * Forecast.HwState]] bound) plus the newest bucket already scored
    * (so each alarm is emitted exactly once) and the all-time newest
    * event time (the eviction clock — a late-only batch must not pull
    * the deadline earlier), plus a state-format VERSION stamp:
    * `ver` lets any future semantic change to the held fields fail
    * the first post-upgrade micro-batch with an explicit
    * wipe-and-retrain message instead of silently misreading carried
    * state (pre-`ver` checkpoints still fail earlier, at Spark's own
    * state-schema check — nothing can make an encoder-shape change
    * graceful; the stamp governs every change AFTER it). Wipe and
    * re-train on either failure; the state is a trailing window, so
    * re-training is the same recovery an idle eviction already
    * gives. */
  final case class CusumState(bucket: Array[Long], s: Array[Long],
      emitted: Long, newest: Long, ver: Long = Anomaly.CusumStateVer)

  /** Current [[CusumState]] format version — bump on any SEMANTIC
    * change to how the held fields are produced or read. */
  val CusumStateVer = 1L

  /** One live drift alarm. */
  final case class CusumAlarm(series: String, bucket: Long, side: Long,
      s_sigma_q6: Long)

  /** Live CUSUM drift alarms — the streaming half of [[cusum]]: each
    * micro-batch folds its points into the per-series trailing
    * bucket-sum table (exact int64 adds, so a bucket split across
    * batches sums identically), and the batch walk re-runs over the
    * SEALED buckets — every held bucket except the newest, which the
    * next bucket's first arrival seals. Sealing is what makes an
    * emit-once alarm stream deterministic: an in-flight bucket's sum
    * still grows, so scoring it early could fire an alarm a later
    * point retracts. Alarms are emitted the first time their bucket
    * is scored and never re-emitted; the running S⁺/S⁻ (and the
    * post-alarm RESET) are recomputed from the held window each
    * batch, so a reset carries across micro-batches by construction.
    *
    * Parity: while a series' observed history fits in lastN buckets
    * AND buckets arrive in order across micro-batches (no event for
    * an already-sealed bucket lands in a LATER batch) the walk is
    * prefix-causal (baseline = first `base` held buckets, sums only
    * ever extend forward), so the streamed alarms over sealed buckets
    * equal [[cusum]] over the same points — StreamingSpec pins this
    * including a mid-window batch split and a reset carried across
    * batches. A cross-batch late event the watermark still admits
    * (possible when maxLateness > 0) updates its held bucket sum —
    * keeping every LATER bucket's baseline and S walk exact — but an
    * already-scored bucket's own verdict is immutable (append-mode
    * alarms cannot retract); the settled batch twin is the audit for
    * those, as for every emit-once alerting twin here. Once the window slides past lastN,
    * each alarm reflects the baseline IN FORCE when its bucket sealed
    * (the live reading an operator wants); re-running [[cusum]] over
    * the settled store is the audit, as with every alerting twin.
    * Append mode, alarm-sized output; per-batch cost is one
    * ≤lastN-step fold per series seen in the batch.
    *
    * State retires with the series (the streamingThresholdCross
    * pattern): once the watermark passes the newest sample +
    * `idleEvict` seconds (default lastN buckets of silence) the
    * series' bucket table is EVICTED and a later arrival re-trains
    * from scratch — the live reading (the batch operator's trailing
    * window would be dominated by the silence gap anyway; re-running
    * [[cusum]] over the settled store is the audit, which keeps old
    * observed buckets per its gap policy — the documented divergence
    * across an eviction). `maxLateness` is the cross-batch disorder
    * budget: later-batch events below the watermark are silently
    * dropped by Spark; the 3600 s default trades an hour of extra
    * retention for an hour of transport skew (intra-batch disorder is
    * always safe — bucket sums are order-free int64 adds). */
  def streamingCusum(stream: DataFrame, lastN: Int = 168,
      base: Int = 24, k: Double = 0.5, h: Double = 5.0,
      minBuckets: Int = 48, bucketSec: Long = 3600L,
      idleEvict: Long = 0L, maxLateness: Long = 3600L)
      : Dataset[CusumAlarm] = {
    require(lastN >= base + 1 && base >= 2, "need lastN > base >= 2")
    require(minBuckets > base && minBuckets <= lastN,
      "need base < minBuckets <= lastN")
    require(k >= 0.0 && h > 0.0, "need k >= 0 and h > 0")
    require(idleEvict >= 0 && maxLateness >= 0,
      "need idleEvict >= 0 (0 = lastN buckets) and maxLateness >= 0")
    val evict = if (idleEvict > 0L) idleEvict else lastN * bucketSec
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("series"), expr(s"ts div $bucketSec").as("bucket"),
        col("val"), timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String,
         rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            // idleEvict of silence: retire the series — a later
            // arrival re-trains a fresh baseline
            state.remove()
            Iterator.empty
          } else {
          val sums = scala.collection.mutable.LongMap.empty[Long]
          state.getOption.foreach { st =>
            require(st.ver == CusumStateVer,
              s"cusum state format v${st.ver}, operator expects " +
                s"v$CusumStateVer: checkpoint written by an " +
                "incompatible version — wipe the checkpoint and " +
                "re-train (the trailing window rebuilds itself)")
            st.bucket.indices.foreach(i => sums(st.bucket(i)) = st.s(i))
          }
          var maxTs = Long.MinValue
          rows.foreach { case (_, bk, v, et) =>
            sums(bk) = sums.getOrElse(bk, 0L) + v
            maxTs = math.max(maxTs, et.getTime / 1000L)
          }
          // lastN sealed + the one unsealed newest
          val kept = sums.toArray.sortBy(_._1).takeRight(lastN + 1)
          var emitted = state.getOption.map(_.emitted).getOrElse(Long.MinValue)
          val out = Vector.newBuilder[CusumAlarm]
          val closed = kept.dropRight(1)
          if (closed.length >= minBuckets) {
            // identical walk to the batch fold's SQL text, same op
            // order on plain IEEE doubles
            val y = closed.map(_._2.toDouble)
            var sy = y(0); var syy = y(0) * y(0)
            var i = 1
            while (i < base) { sy += y(i); syy += y(i) * y(i); i += 1 }
            val mu = sy / base.toDouble
            val sg = math.sqrt(syy / base.toDouble - mu * mu)
            if (sg > 0.0) {
              var sp = 0.0; var sn = 0.0
              i = base
              while (i < y.length) {
                val up = math.max(0.0, sp + (y(i) - mu - k * sg))
                val dn = math.max(0.0, sn + (mu - y(i) - k * sg))
                val bk = closed(i)._1
                if (bk > emitted) {
                  if (up > h * sg)
                    out += CusumAlarm(series, bk, 1L,
                      math.floor(up / sg * 1e6).toLong)
                  else if (dn > h * sg)
                    out += CusumAlarm(series, bk, -1L,
                      math.floor(dn / sg * 1e6).toLong)
                }
                sp = if (up > h * sg) 0.0 else up
                sn = if (dn > h * sg) 0.0 else dn
                i += 1
              }
              // only a RUN of the walk advances the emit horizon —
              // advancing it while still below minBuckets would
              // suppress the alarms the first full walk back-fills
              emitted = math.max(emitted, closed.last._1)
            } else emitted = math.max(emitted, closed.last._1)
          }
          // the eviction clock is the ALL-TIME newest event time, not
          // the batch-local max: an admitted late-only batch must not
          // pull the deadline earlier
          val newest = math.max(maxTs,
            state.getOption.map(_.newest).getOrElse(Long.MinValue))
          state.update(CusumState(kept.map(_._1), kept.map(_._2), emitted,
            newest))
          if (newest > Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              (newest + evict) * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          out.result().iterator
          }
      }
  }
}
