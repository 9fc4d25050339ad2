package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Holt double-exponential smoothing forecast — the trend-aware
  * one-step-ahead prediction every TSDB dashboard offers (InfluxDB
  * `HOLT_WINTERS`, the non-seasonal half): level and trend evolve as
  * l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1}),
  * b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}, forecast = l + b.
  *
  * Scale shape: the recurrence is inherently sequential per series,
  * so the input is BOUNDED first — the trailing `lastN` samples per
  * series via a row_number window (WindowGroupLimit pushes the
  * partial top-N below the exchange), then ONE per-series array of ≤
  * lastN doubles folds through a SQL `aggregate` with a (level,
  * trend) struct accumulator. Cell memory is lastN-bounded by
  * construction (the bucketPercentiles guard philosophy, enforced
  * structurally instead of checked), and a forecast from the trailing
  * window is what the operator semantically IS — smoothing weights
  * decay geometrically, so history beyond ~64 samples contributes
  * under 2⁻³² of the level anyway.
  *
  * Determinism: the fold is order-fixed IEEE arithmetic written with
  * the IDENTICAL textual operation order in the DuckDB oracle's
  * recursive-CTE walk, and the output is floor-quantized ×1e6 from
  * the bit-identical double (the interpolate argument: floor cannot
  * diverge where round's half-boundary can). Init: level = first
  * sample, trend = 0; a single-sample series forecasts itself. */
object Forecast {

  /** (series, n_samples, last_ts, forecast_q6). */
  def holt(points: DataFrame, lastN: Int = 64, alpha: Double = 0.5,
      beta: Double = 0.25): DataFrame = {
    require(lastN >= 1 && lastN <= 4096, "lastN must be in [1, 4096]")
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0,
      "need alpha in (0,1], beta in [0,1]")
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").desc, col("pid").desc)
    val recent = points
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= lastN)
    val a = alpha
    val oa = 1.0 - alpha
    val b = beta
    val ob = 1.0 - beta
    // the level expression appears twice (l' feeds b') — spelled out
    // twice, identically, in both engines, so the op order is fixed
    val nl = s"$a * e.y + $oa * (s.l + s.b)"
    val fold =
      s"""aggregate(slice(__a, 2, $lastN),
         |  struct(element_at(__a, 1).y AS l, CAST(0.0 AS DOUBLE) AS b),
         |  (s, e) -> struct(
         |    $nl AS l,
         |    $b * (($nl) - s.l) + $ob * s.b AS b),
         |  s -> s.l + s.b)""".stripMargin
    recent.groupBy(col("series"))
      .agg(expr(
        "array_sort(collect_list(struct(ts, pid, CAST(val AS DOUBLE) AS y)))")
        .as("__a"),
        count(lit(1)).as("n_samples"), max(col("ts")).as("last_ts"))
      .select(col("series"), col("n_samples"), col("last_ts"),
        floor(expr(fold) * lit(1e6)).cast("long").as("forecast_q6"))
  }

  /** Walk-forward BACKTEST of [[holt]] — the forecast-trust gate as a
    * first-class row (the recall@k / lang-ID-confusion pattern aimed
    * at the forecast family): replay the SAME order-fixed fold over
    * the trailing `lastN` samples, but score each step's prediction
    * l+b against the next actual BEFORE folding it in. Per series:
    *   n_evals  — one-step evaluations (window size − 1),
    *   mae_q6   — mean |error| over the evaluations,
    *   wape_q6  — Σ|error| / Σ|y| (scale-free; NULL when every y=0),
    *   skill_q6 — 1 − Σ|error| / Σ|naive error| against the
    *              last-value (random-walk) baseline: positive means
    *              Holt beats naive, ≤ 0 means the smoothing adds
    *              nothing — the number a dashboard needs before its
    *              forecast deserves belief. NULL for constant series
    *              (no naive error to beat).
    * Every prediction uses strictly earlier samples (standard online
    * backtest for smoothing models). Series with one sample have no
    * evaluation and are dropped.
    *
    * Scale shape: identical to [[holt]] — window-bounded cell, one
    * hash aggregation; the accumulator adds three running doubles and
    * the previous sample. Determinism: the recurrence text mirrors
    * the oracle walk token-for-token (the level expression spelled
    * out where it feeds), and all three ratios are floor-quantized
    * ×1e6 off bit-identical doubles. */
  def holtBacktest(points: DataFrame, lastN: Int = 64,
      alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    require(lastN >= 2 && lastN <= 4096, "lastN must be in [2, 4096]")
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0,
      "need alpha in (0,1], beta in [0,1]")
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").desc, col("pid").desc)
    val recent = points
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= lastN)
    val a = alpha
    val oa = 1.0 - alpha
    val b = beta
    val ob = 1.0 - beta
    val nl = s"$a * e.y + $oa * (s.l + s.b)"
    // the error terms read the PRE-update accumulator (s.l + s.b is
    // the forecast made before e.y arrives; s.py is the naive one)
    val fold =
      s"""aggregate(slice(__a, 2, $lastN),
         |  struct(element_at(__a, 1).y AS l, CAST(0.0 AS DOUBLE) AS b,
         |    CAST(0.0 AS DOUBLE) AS sae, CAST(0.0 AS DOUBLE) AS say,
         |    CAST(0.0 AS DOUBLE) AS sne, element_at(__a, 1).y AS py),
         |  (s, e) -> struct(
         |    $nl AS l,
         |    $b * (($nl) - s.l) + $ob * s.b AS b,
         |    s.sae + abs(e.y - (s.l + s.b)) AS sae,
         |    s.say + abs(e.y) AS say,
         |    s.sne + abs(e.y - s.py) AS sne,
         |    e.y AS py),
         |  s -> struct(s.sae AS sae, s.say AS say, s.sne AS sne))""".stripMargin
    recent.groupBy(col("series"))
      .agg(expr(
        "array_sort(collect_list(struct(ts, pid, CAST(val AS DOUBLE) AS y)))")
        .as("__a"),
        count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(col("series"), col("n"), expr(fold).as("__s"))
      .select(col("series"),
        (col("n") - 1).cast("long").as("n_evals"),
        floor(col("__s.sae") / (col("n") - 1) * lit(1e6)).cast("long")
          .as("mae_q6"),
        when(col("__s.say") > 0d,
          floor(col("__s.sae") / col("__s.say") * lit(1e6)).cast("long"))
          .as("wape_q6"),
        when(col("__s.sne") > 0d,
          floor((lit(1.0) - col("__s.sae") / col("__s.sne")) * lit(1e6))
            .cast("long")).as("skill_q6"))
  }

  /** Forecast-residual anomaly detection — the alerting layer a
    * forecast exists for: walk the same trailing-window Holt fold as
    * [[holtBacktest]], and flag each point whose one-step-ahead
    * residual |y_t − (l+b)| exceeds `k` × the mean absolute residual
    * of all earlier steps (the self-calibrating scale a static
    * threshold can't give a trending series). The first `minWarm`
    * evaluations never flag (the scale is still forming); flagged
    * residuals still fold into the scale (one spike inflates the
    * scale slightly rather than splitting the walk into two
    * regimes — documented bias toward under-alerting right after a
    * spike). Output: one row per flagged point (series, ts,
    * forecast_q6, resid_q6).
    *
    * Scale shape: identical to [[holt]] — WindowGroupLimit bounds
    * the cell to lastN, one hash aggregation, and the fold's
    * accumulator adds a flagged-points array that is ≤ lastN by
    * construction. Determinism: the recurrence and the flag
    * comparison (`k·sae/(cnt−1)`, multiply before divide) mirror the
    * oracle walk token-for-token on bit-identical doubles; emitted
    * values floor-quantize ×1e6. */
  def holtResidualAnomaly(points: DataFrame, lastN: Int = 64,
      alpha: Double = 0.5, beta: Double = 0.25, k: Double = 4.0,
      minWarm: Int = 8): DataFrame = {
    require(lastN >= 2 && lastN <= 4096, "lastN must be in [2, 4096]")
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0,
      "need alpha in (0,1], beta in [0,1]")
    require(k > 0.0 && minWarm >= 1, "need k > 0 and minWarm >= 1")
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").desc, col("pid").desc)
    val recent = points
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= lastN)
    val a = alpha
    val oa = 1.0 - alpha
    val b = beta
    val ob = 1.0 - beta
    val nl = s"$a * e.y + $oa * (s.l + s.b)"
    // resid/flag read the PRE-update accumulator: s.l + s.b is the
    // forecast made before e.y arrives; s.cnt - 1 is the number of
    // residuals already folded into s.sae
    val anT = "array<struct<ts: bigint, forecast_q6: bigint, resid_q6: bigint>>"
    val fold =
      s"""aggregate(slice(__a, 2, $lastN),
         |  struct(element_at(__a, 1).y AS l, CAST(0.0 AS DOUBLE) AS b,
         |    CAST(0.0 AS DOUBLE) AS sae, CAST(1 AS BIGINT) AS cnt,
         |    CAST(array() AS $anT) AS an),
         |  (s, e) -> struct(
         |    $nl AS l,
         |    $b * (($nl) - s.l) + $ob * s.b AS b,
         |    s.sae + abs(e.y - (s.l + s.b)) AS sae,
         |    s.cnt + 1 AS cnt,
         |    CASE WHEN s.cnt - 1 >= $minWarm AND abs(e.y - (s.l + s.b)) >
         |           $k * s.sae / CAST(s.cnt - 1 AS DOUBLE)
         |      THEN concat(s.an, array(struct(e.ts AS ts,
         |        CAST(floor((s.l + s.b) * 1e6) AS BIGINT) AS forecast_q6,
         |        CAST(floor((e.y - (s.l + s.b)) * 1e6) AS BIGINT) AS resid_q6)))
         |      ELSE s.an END AS an),
         |  s -> s.an)""".stripMargin
    recent.groupBy(col("series"))
      .agg(expr(
        "array_sort(collect_list(struct(ts, pid, CAST(val AS DOUBLE) AS y)))")
        .as("__a"),
        count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(col("series"), explode(expr(fold)).as("f"))
      .select(col("series"), col("f.ts").as("ts"),
        col("f.forecast_q6").as("forecast_q6"),
        col("f.resid_q6").as("resid_q6"))
  }

  /** The trailing window carried across micro-batches: ≤ lastN
    * (ts, pid, y) triples per series — bounded state by the same
    * construction as the batch operator. */
  final case class HoltState(ts: Array[Long], pid: Array[Long],
      y: Array[Double])

  /** One live forecast emission (updated every micro-batch that
    * touches the series). */
  final case class HoltForecast(series: String, n_samples: Long,
      last_ts: Long, forecast_q6: Long)

  /** Live Holt forecast — the streaming half of [[holt]]: each
    * micro-batch merges its arrivals into the per-series trailing-N
    * buffer (kept sorted by (ts, pid), truncated to the newest
    * lastN — out-of-order and late points fold exactly like the
    * batch window would place them) and emits the refreshed
    * forecast. After any prefix of the stream, the emitted row
    * equals [[holt]] over the points seen so far — StreamingSpec
    * pins the agreement, including arrivals split across batches
    * and a late point landing inside the window. The fold is the
    * same order-fixed IEEE recurrence run on the driver-free
    * executor path (plain Scala doubles — IEEE semantics identical
    * to the SQL fold). Update mode semantics: one row per touched
    * series per batch. */
  /** State retires with the series: the watermark passing the newest
    * held sample + `idleEvict` seconds drops the buffer (event-time
    * timeout — the alerting twins' round-14 pattern), so the store is
    * bounded by series that reported within the horizon; a re-arrival
    * re-trains from its own samples. `maxLateness` is the cross-batch
    * disorder budget (later-batch events below the watermark are
    * silently dropped by Spark); within it, late points still re-slot
    * exactly as the batch window places them. */
  def streamingHolt(stream: DataFrame, lastN: Int = 64,
      alpha: Double = 0.5, beta: Double = 0.25,
      idleEvict: Long = 86400L, maxLateness: Long = 3600L)
      : Dataset[HoltForecast] = {
    require(lastN >= 1 && lastN <= 4096, "lastN must be in [1, 4096]")
    require(idleEvict > 0 && maxLateness >= 0,
      "need idleEvict > 0 and maxLateness >= 0")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("series"), col("ts"), col("pid"),
        col("val").cast("double"),
        timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .as[(String, Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String,
         rows: Iterator[(String, Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[HoltState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .map(s => Array.tabulate(s.ts.length)(i =>
                (s.ts(i), s.pid(i), s.y(i))))
              .getOrElse(Array.empty[(Long, Long, Double)])
            val merged = (prev ++ rows.map(r => (r._2, r._3, r._4)))
              .sortBy(r => (r._1, r._2))
            val kept = merged.takeRight(lastN)
            state.update(HoltState(kept.map(_._1), kept.map(_._2),
              kept.map(_._3)))
            state.setTimeoutTimestamp(math.max(
              (kept.last._1 + idleEvict) * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
            // identical recurrence to the batch fold, same op order
            var l = kept.head._3
            var b = 0.0
            kept.iterator.drop(1).foreach { case (_, _, y) =>
              val nl = alpha * y + (1.0 - alpha) * (l + b)
              b = beta * (nl - l) + (1.0 - beta) * b
              l = nl
            }
            Iterator.single(HoltForecast(series, kept.length.toLong,
              kept.last._1, math.floor((l + b) * 1e6).toLong))
          }
      }
  }

  /** One live residual alert (a point whose one-step residual beat
    * the trailing scale). */
  final case class HoltResidualAlert(series: String, ts: Long,
      forecast_q6: Long, resid_q6: Long)

  /** Live forecast-residual alerting — the streaming half of
    * [[holtResidualAnomaly]] (every alerting operator here ships a
    * live twin): each micro-batch merges arrivals into the same
    * per-series trailing-lastN buffer [[streamingHolt]] carries,
    * re-runs the residual fold over the refreshed window, and emits
    * EXACTLY ONCE each flag newer than the previously held newest
    * point (a pager must not re-fire O(window) times for one spike) —
    * the union of emissions over an in-order stream equals
    * [[holtResidualAnomaly]] over the points seen so far
    * (StreamingSpec pins the agreement AND the no-duplicates count,
    * including a spike split across batches). An admitted cross-batch
    * late point folds into the window (keeping later scores exact)
    * but its own behind-horizon flag is immutable, the shared
    * emit-once contract of every alerting twin here. The fold is the identical order-fixed IEEE
    * recurrence in plain Scala doubles (the streamingHolt precedent);
    * state is lastN-bounded and retires via the same event-time
    * idle eviction (a retired series re-trains on next arrival). */
  def streamingHoltResidual(stream: DataFrame, lastN: Int = 64,
      alpha: Double = 0.5, beta: Double = 0.25, k: Double = 4.0,
      minWarm: Int = 8, idleEvict: Long = 86400L,
      maxLateness: Long = 3600L): Dataset[HoltResidualAlert] = {
    require(lastN >= 2 && lastN <= 4096, "lastN must be in [2, 4096]")
    require(k > 0.0 && minWarm >= 1, "need k > 0 and minWarm >= 1")
    require(idleEvict > 0 && maxLateness >= 0,
      "need idleEvict > 0 and maxLateness >= 0")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("series"), col("ts"), col("pid"),
        col("val").cast("double"),
        timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .as[(String, Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String,
         rows: Iterator[(String, Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[HoltState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .map(s => Array.tabulate(s.ts.length)(i =>
                (s.ts(i), s.pid(i), s.y(i))))
              .getOrElse(Array.empty[(Long, Long, Double)])
            // emit-once horizon: flags at or behind the previously
            // held newest point were already emitted (or, for an
            // admitted late point, are immutable) — re-emitting the
            // window's whole flag set every touched batch would page
            // a downstream consumer O(window) times per alarm. The
            // horizon is the full (ts, pid) order the buffer itself
            // sorts by: a same-second higher-pid arrival is NEW, not
            // behind (the streamingThresholdCross guard's ordering)
            val (hTs, hPid) =
              if (prev.isEmpty) (Long.MinValue, Long.MinValue)
              else (prev.last._1, prev.last._2)
            val merged = (prev ++ rows.map(r => (r._2, r._3, r._4)))
              .sortBy(r => (r._1, r._2))
            val kept = merged.takeRight(lastN)
            state.update(HoltState(kept.map(_._1), kept.map(_._2),
              kept.map(_._3)))
            state.setTimeoutTimestamp(math.max(
              (kept.last._1 + idleEvict) * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
            // identical recurrence and flag comparison to the batch
            // fold: resid reads the pre-update (l + b), the scale is
            // k·sae/(cnt−1) with the multiply first
            val alerts = Array.newBuilder[HoltResidualAlert]
            var l = kept.head._3
            var b = 0.0
            var sae = 0.0
            var cnt = 1L
            kept.iterator.drop(1).foreach { case (ts, pid, y) =>
              val fc = l + b
              val resid = y - fc
              if ((ts > hTs || (ts == hTs && pid > hPid)) &&
                  cnt - 1 >= minWarm &&
                  math.abs(resid) > k * sae / (cnt - 1).toDouble)
                alerts += HoltResidualAlert(series, ts,
                  math.floor(fc * 1e6).toLong,
                  math.floor(resid * 1e6).toLong)
              sae += math.abs(resid)
              cnt += 1
              val nl = alpha * y + (1.0 - alpha) * fc
              b = beta * (nl - l) + (1.0 - beta) * b
              l = nl
            }
            alerts.result().iterator
          }
      }
  }

  /** Holt-Winters ADDITIVE-SEASONAL forecast — the other half of
    * InfluxDB `HOLT_WINTERS` ([[holt]] covers the non-seasonal form):
    * level, trend, AND a per-season-slot component evolve as
    * l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},
    * s_t = γ(y_t − l_t) + (1−γ)s_{t−m}; forecast = l + b + s_{next}.
    *
    * Runs over the HOURLY ROLLUP (season m = 24 hour-of-day slots —
    * raw samples inside one hour carry no seasonal signal), bounded
    * to the trailing `lastN` buckets per series exactly like
    * [[holt]]. Classical init from the first season of the window:
    * l₀ = mean of the first m buckets (one order-fixed left fold),
    * b₀ = 0, s₀[k] = y_k − l₀; then ONE SQL `aggregate` fold whose
    * accumulator carries (l, b, s ARRAY[m]) — the per-slot update is
    * an indexed `transform`, so the whole recurrence is a single
    * narrow expression per series, no joins, no window re-passes.
    *
    * The trailing window must be CONTIGUOUS buckets (a gap would
    * silently misalign every later slot): series where the window
    * spans more buckets than it holds, or shorter than two seasons,
    * are dropped — the fold can't see what isn't there, and a
    * forecast from a holed season would be wrong with confidence.
    * Determinism: same textual op order in the oracle's recursive
    * walk (the level expression is spelled out everywhere it feeds),
    * output floor-quantized ×1e6. */
  def holtWinters(points: DataFrame, bucket: Long = 3600L,
      lastN: Int = 96, m: Int = 24, alpha: Double = 0.5,
      beta: Double = 0.25, gamma: Double = 0.25): DataFrame = {
    require(m >= 2 && lastN >= 2 * m && lastN <= 4096,
      s"need lastN in [2m, 4096], m >= 2; got lastN=$lastN m=$m")
    val h = points.groupBy(col("series"),
        expr(s"ts DIV $bucket").as("bucket"))
      .agg(sum(col("val")).cast("double").as("y"))
    val w = Window.partitionBy(col("series")).orderBy(col("bucket").desc)
    val recent = h.withColumn("__r", row_number().over(w))
      .where(col("__r") <= lastN)
    val a = alpha; val oa = 1.0 - alpha
    val b = beta;  val ob = 1.0 - beta
    val g = gamma; val og = 1.0 - gamma
    // the new level feeds b' and s' — spelled out identically each
    // time, in both engines, so the op order is pinned
    val nl = s"$a * (e.y - element_at(acc.s, CAST(e.bucket % $m AS INT) + 1))" +
      s" + $oa * (acc.l + acc.b)"
    val fold =
      s"""aggregate(slice(__a, ${m + 1}, $lastN),
         |  struct(__l0 AS l, CAST(0.0 AS DOUBLE) AS b, __s0 AS s),
         |  (acc, e) -> struct(
         |    $nl AS l,
         |    $b * (($nl) - acc.l) + $ob * acc.b AS b,
         |    transform(acc.s, (v, j) ->
         |      CASE WHEN j = CAST(e.bucket % $m AS INT)
         |           THEN $g * (e.y - ($nl)) + $og * v ELSE v END) AS s),
         |  acc -> acc.l + acc.b +
         |    element_at(acc.s, CAST((__last + 1) % $m AS INT) + 1))""".stripMargin
    recent.groupBy(col("series"))
      .agg(expr("array_sort(collect_list(struct(bucket, y)))").as("__a"),
        count(lit(1)).as("n_buckets"),
        min(col("bucket")).as("__fb"), max(col("bucket")).as("__last"))
      .where(col("n_buckets") >= 2L * m &&
        col("__last") - col("__fb") + 1L === col("n_buckets"))
      .withColumn("__l0", expr(
        s"aggregate(slice(__a, 1, $m), CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.y) / $m.0"))
      .withColumn("__s0", expr(
        s"""transform(sequence(0, ${m - 1}), k ->
           |  element_at(__a, CAST((($m + k - __fb % $m) % $m) AS INT) + 1).y - __l0)""".stripMargin))
      .select(col("series"), col("n_buckets"), col("__last").as("last_bucket"),
        floor(expr(fold) * lit(1e6)).cast("long").as("forecast_q6"))
  }

  /** Walk-forward BACKTEST of [[holtWinters]] — the trust gate for
    * the forecast a dashboard actually watches (diurnal metrics), the
    * [[holtBacktest]] recipe extended to the (l, b, s[m]) fold: replay
    * the same two-phase recurrence over the trailing lastN buckets,
    * scoring each step's one-step prediction l + b + s[slot] against
    * the next bucket's actual BEFORE folding it in. Two baselines run
    * in lockstep on the same bucket series:
    *   skill_naive_q6 — 1 − Σ|err| / Σ|naive err| vs the last-value
    *     (random-walk) forecast,
    *   skill_holt_q6  — 1 − Σ|err| / Σ|holt err| vs NON-SEASONAL
    *     Holt (same α/β, warm-started over the same first-season
    *     buckets): whether the seasonal term EARNS its complexity —
    *     positive means the s[m] state is carrying real signal, ≤ 0
    *     means plain smoothing would forecast as well.
    * Evaluation starts after the m-bucket initialization (no model
    * has a seasonal state before one full season), so n_evals =
    * n_buckets − m and every prediction uses strictly earlier
    * buckets. Gates identical to [[holtWinters]] (contiguous window,
    * ≥ 2 seasons) — the fold can't score what it couldn't forecast.
    *
    * Scale shape: the same single WindowGroupLimit-bounded hash
    * aggregation as [[holtWinters]]; the accumulator adds two Holt
    * doubles, four running sums, and the previous bucket value.
    * Determinism: one order-fixed IEEE sequence (level expression
    * spelled out everywhere it feeds, prediction read from the
    * pre-update accumulator), mirrored token-for-token in the
    * oracle's recursive CTE; all ratios floor-quantized ×1e6. */
  def hwBacktest(points: DataFrame, bucket: Long = 3600L,
      lastN: Int = 96, m: Int = 24, alpha: Double = 0.5,
      beta: Double = 0.25, gamma: Double = 0.25): DataFrame = {
    require(m >= 2 && lastN >= 2 * m && lastN <= 4096,
      s"need lastN in [2m, 4096], m >= 2; got lastN=$lastN m=$m")
    val h = points.groupBy(col("series"),
        expr(s"ts DIV $bucket").as("bucket"))
      .agg(sum(col("val")).cast("double").as("y"))
    val w = Window.partitionBy(col("series")).orderBy(col("bucket").desc)
    val recent = h.withColumn("__r", row_number().over(w))
      .where(col("__r") <= lastN)
    val a = alpha; val oa = 1.0 - alpha
    val b = beta;  val ob = 1.0 - beta
    val g = gamma; val og = 1.0 - gamma
    val nl = s"$a * (e.y - element_at(acc.s, CAST(e.bucket % $m AS INT) + 1))" +
      s" + $oa * (acc.l + acc.b)"
    // the pre-update one-step forecast: what the model believed
    // BEFORE seeing e.y
    val pred = s"acc.l + acc.b + element_at(acc.s, CAST(e.bucket % $m AS INT) + 1)"
    // the parallel non-seasonal Holt recurrence (holt()'s fold text)
    val hnl = s"$a * e.y + $oa * (acc.hl + acc.hb)"
    val hwu = s"$a * e.y + $oa * (s.l + s.b)"
    val fold =
      s"""aggregate(slice(__a, ${m + 1}, $lastN),
         |  struct(__l0 AS l, CAST(0.0 AS DOUBLE) AS b, __s0 AS s,
         |    __h.l AS hl, __h.b AS hb,
         |    CAST(0.0 AS DOUBLE) AS sae, CAST(0.0 AS DOUBLE) AS say,
         |    CAST(0.0 AS DOUBLE) AS sne, CAST(0.0 AS DOUBLE) AS she,
         |    element_at(__a, $m).y AS py),
         |  (acc, e) -> struct(
         |    $nl AS l,
         |    $b * (($nl) - acc.l) + $ob * acc.b AS b,
         |    transform(acc.s, (v, j) ->
         |      CASE WHEN j = CAST(e.bucket % $m AS INT)
         |           THEN $g * (e.y - ($nl)) + $og * v ELSE v END) AS s,
         |    $hnl AS hl,
         |    $b * (($hnl) - acc.hl) + $ob * acc.hb AS hb,
         |    acc.sae + abs(e.y - ($pred)) AS sae,
         |    acc.say + abs(e.y) AS say,
         |    acc.sne + abs(e.y - acc.py) AS sne,
         |    acc.she + abs(e.y - (acc.hl + acc.hb)) AS she,
         |    e.y AS py),
         |  acc -> struct(acc.sae AS sae, acc.say AS say,
         |    acc.sne AS sne, acc.she AS she))""".stripMargin
    recent.groupBy(col("series"))
      .agg(expr("array_sort(collect_list(struct(bucket, y)))").as("__a"),
        count(lit(1)).as("n_buckets"),
        min(col("bucket")).as("__fb"), max(col("bucket")).as("__last"))
      .where(col("n_buckets") >= 2L * m &&
        col("__last") - col("__fb") + 1L === col("n_buckets"))
      .withColumn("__l0", expr(
        s"aggregate(slice(__a, 1, $m), CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.y) / $m.0"))
      .withColumn("__s0", expr(
        s"""transform(sequence(0, ${m - 1}), k ->
           |  element_at(__a, CAST((($m + k - __fb % $m) % $m) AS INT) + 1).y - __l0)""".stripMargin))
      // Holt warm-up over the same first season: buckets 2..m of the
      // window, init l = y1, b = 0 — the holt() fold verbatim
      .withColumn("__h", expr(
        s"""aggregate(slice(__a, 2, ${m - 1}),
           |  struct(element_at(__a, 1).y AS l, CAST(0.0 AS DOUBLE) AS b),
           |  (s, e) -> struct(
           |    $hwu AS l,
           |    $b * (($hwu) - s.l) + $ob * s.b AS b))""".stripMargin))
      .select(col("series"),
        (col("n_buckets") - m).cast("long").as("n_evals"),
        expr(fold).as("__f"))
      .select(col("series"), col("n_evals"),
        floor(col("__f.sae") / col("n_evals") * lit(1e6)).cast("long")
          .as("mae_q6"),
        when(col("__f.say") > 0d,
          floor(col("__f.sae") / col("__f.say") * lit(1e6)).cast("long"))
          .as("wape_q6"),
        when(col("__f.sne") > 0d,
          floor((lit(1.0) - col("__f.sae") / col("__f.sne")) * lit(1e6))
            .cast("long")).as("skill_naive_q6"),
        when(col("__f.she") > 0d,
          floor((lit(1.0) - col("__f.sae") / col("__f.she")) * lit(1e6))
            .cast("long")).as("skill_holt_q6"))
  }

  /** Trailing bucket sums carried across micro-batches (≤ lastN
    * (bucket, exact int64 sum) pairs per series) plus the all-time
    * newest event time (the eviction clock) and a state-format
    * VERSION stamp — `ver` makes any future semantic change to the
    * held fields fail the first post-upgrade micro-batch with an
    * explicit wipe-and-retrain message (the
    * [[graft.engine.Anomaly.CusumState]] convention; encoder-SHAPE
    * changes still fail earlier at Spark's own state-schema check).
    * Wipe and re-train on either failure — the trailing window makes
    * re-training the standard recovery anyway. */
  final case class HwState(bucket: Array[Long], s: Array[Long],
      newest: Long, ver: Long = Forecast.HwStateVer)

  /** Current [[HwState]] format version — bump on any SEMANTIC
    * change to how the held fields are produced or read. */
  val HwStateVer = 1L

  /** One live seasonal forecast emission. */
  final case class HwForecast(series: String, n_buckets: Long,
      last_bucket: Long, forecast_q6: Long)

  /** Live Holt-Winters — the streaming half of [[holtWinters]]: each
    * micro-batch folds its points into the per-series trailing-lastN
    * BUCKET-SUM table (exact int64 adds, so a bucket's sum is
    * identical however its points split across batches), trims to the
    * newest lastN buckets, and re-runs the same two-phase fold. After
    * any prefix of the stream the emitted row equals [[holtWinters]]
    * over the points seen so far — including a late point landing in
    * a still-held bucket — which StreamingSpec pins. Series whose
    * held window is holed or shorter than two seasons emit nothing
    * yet, exactly like the batch drop. Update mode; state is ≤ lastN
    * longs-pairs per series, never point-sized. */
  /** State retires with the series (the round-14 eviction pattern):
    * the watermark passing the newest sample + `idleEvict` seconds
    * (default: the window's own span, lastN buckets) drops the bucket
    * table; a re-arrival re-trains — after that much silence the held
    * window could never again be contiguous with new data, so the
    * forecast it supported is unreachable anyway. `maxLateness` is
    * the cross-batch disorder budget (below-watermark events are
    * silently dropped); within it a late point still lands in its
    * held bucket exactly as before. */
  def streamingHoltWinters(stream: DataFrame, bucket: Long = 3600L,
      lastN: Int = 96, m: Int = 24, alpha: Double = 0.5,
      beta: Double = 0.25, gamma: Double = 0.25,
      idleEvict: Long = 0L, maxLateness: Long = 3600L)
      : Dataset[HwForecast] = {
    require(m >= 2 && lastN >= 2 * m && lastN <= 4096,
      s"need lastN in [2m, 4096], m >= 2; got lastN=$lastN m=$m")
    require(idleEvict >= 0 && maxLateness >= 0,
      "need idleEvict >= 0 (0 = lastN buckets) and maxLateness >= 0")
    val evict = if (idleEvict > 0L) idleEvict else lastN * bucket
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("series"), expr(s"ts DIV $bucket").as("bucket"),
        col("val"), timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (series: String,
         rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[HwState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val sums = scala.collection.mutable.LongMap.empty[Long]
          state.getOption.foreach { st =>
            require(st.ver == HwStateVer,
              s"holt-winters state format v${st.ver}, operator expects " +
                s"v$HwStateVer: checkpoint written by an incompatible " +
                "version — wipe the checkpoint and re-train (the " +
                "trailing window rebuilds itself)")
            st.bucket.indices.foreach(i => sums(st.bucket(i)) = st.s(i))
          }
          var maxTs = Long.MinValue
          rows.foreach { case (_, bk, v, et) =>
            sums(bk) = sums.getOrElse(bk, 0L) + v
            maxTs = math.max(maxTs, et.getTime / 1000L)
          }
          val kept = sums.toArray.sortBy(_._1).takeRight(lastN)
          // the eviction clock is the ALL-TIME newest event time, not
          // the batch-local max: an admitted late-only batch must not
          // pull the deadline earlier
          val newest = math.max(maxTs,
            state.getOption.map(_.newest).getOrElse(Long.MinValue))
          state.update(HwState(kept.map(_._1), kept.map(_._2), newest))
          if (newest > Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              (newest + evict) * 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          val n = kept.length
          val contiguous = n > 0 && kept.last._1 - kept.head._1 + 1 == n
          if (n < 2 * m || !contiguous) Iterator.empty
          else {
            // identical two-phase recurrence to the batch fold, same
            // op order on plain IEEE doubles
            val y = kept.map(_._2.toDouble)
            val fb = kept.head._1
            var suml = 0.0
            var i = 0
            while (i < m) { suml = suml + y(i); i += 1 }
            var l = suml / m.toDouble
            var b = 0.0
            val s = Array.tabulate(m)(k =>
              y(((m + k - (fb % m).toInt) % m)) - l)
            i = m
            while (i < n) {
              val k = ((fb + i) % m).toInt
              val nl = alpha * (y(i) - s(k)) + (1.0 - alpha) * (l + b)
              b = beta * (nl - l) + (1.0 - beta) * b
              s(k) = gamma * (y(i) - nl) + (1.0 - gamma) * s(k)
              l = nl
              i += 1
            }
            val last = kept.last._1
            val f = l + b + s(((last + 1) % m).toInt)
            Iterator.single(HwForecast(series, n.toLong, last,
              math.floor(f * 1e6).toLong))
          }
          }
      }
  }
}
