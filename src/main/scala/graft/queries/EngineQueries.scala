package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Pipeline, SeriesMatch, SeriesStore}
import graft.engine.Pipeline._
import graft.engine.SeriesMatch._

/** Driver-contract registrations for the SiriDB-equivalent engine
  * operators (SURVEY §2.2-§2.7): one Entry per operator, each with a
  * DuckDB oracle reproducing the same semantics over the same parquet.
  *
  * Conventions shared by Spark and oracle sides:
  *  - outputs are ordered by all columns (the driver's hash compare is
  *    then order-insensitive either way);
  *  - float-valued aggregates whose result depends on summation order
  *    (mean/variance/sum-of-doubles/derivative-of-mean, ...) are
  *    rounded to 6 decimals on BOTH sides — the engine itself never
  *    rounds, this is declared output formatting for the differential
  *    test; integer-family results are exact and never rounded.
  */
object EngineQueries {

  // mid-range time splits for after/before/between (events span
  // 2024-01-01..2024-01-31 in seconds at every sf)
  private val A = 1705000000L
  private val B = 1706000000L

  private val PF = SeriesStore.pointsFSql
  private val PI = SeriesStore.pointsISql
  private val PS = SeriesStore.pointsSSql
  private val PM = SeriesStore.pointsSql
  private val PUS = SeriesStore.pointsUsSql
  private val CAT = SeriesStore.catalogAllSql
  private val ORD = "ORDER BY ts, pid"

  private def F(s: SparkSession, d: String) = SeriesStore.pointsF(s, d)
  private def I(s: SparkSession, d: String) = SeriesStore.pointsI(s, d)
  private def S(s: SparkSession, d: String) = SeriesStore.pointsS(s, d)
  private def M(s: SparkSession, d: String) = SeriesStore.points(s, d)

  /** Raw user-axis event view (user_id, ts seconds, event_type) for
    * the funnel/retention entries — one definition so the two stay in
    * lockstep with Tables.events' time normalization. */
  private def userEvents(s: SparkSession, d: String) =
    graft.core.Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000000000").as("ts"),
        col("event_type"))

  /** [[userEvents]] + the event's value as exact integer cents (the
    * ×100 round the integer point family uses) — the revenue axis for
    * LTV / RFM. */
  private def userEventsVal(s: SparkSession, d: String) =
    graft.core.Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000000000").as("ts"),
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

  private def env(s: SparkSession, d: String): Env = Env(
    catalog = SeriesStore.catalogAll(s, d),
    groups = Map("clicks" -> "^f\\.click\\..*"),
    tags = cat => cat.where(col("pool") === 2)
      .select(lit("pool2").as("tag"), col("series")))

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)

  /** Deterministic in-query fixture: two hourly series over 144
    * contiguous hours, `fx.a` with a daily sawtooth AND a genuine
    * +2000 level shift at hour 72, `fx.b` seasonal-only. The harness
    * corpus has no contiguous ≥48 h series and no ≥30% level shift at
    * k=24, so the ts_forecast_hw / ts_changepoint oracles hash-match
    * on 0 rows there (vacuously); the `_fixture` twins run the same
    * operators over this generated frame so the intricate oracle SQL
    * is exercised non-vacuously at every sf. Pure integer arithmetic
    * on an index — bit-identical in both engines, no files read. */
  private def fxPoints(s: SparkSession): DataFrame =
    s.range(144).selectExpr(
        "explode(array(" +
          "named_struct('series', 'fx.a', 'val', " +
          "  1000L + 50L * (id % 24) + IF(id >= 72, 2000L, 0L)), " +
          "named_struct('series', 'fx.b', 'val', " +
          "  500L + 30L * ((id * 7L) % 24)))) AS p",
        "id")
      .select(col("p.series").as("series"), (col("id") * 3600L).as("ts"),
        col("id").as("pid"), col("p.val").as("val"))

  /** The DuckDB twin of [[fxPoints]] — CTEs ending in `p`. */
  private val FXSQL =
    """g AS (SELECT i FROM range(144) t(i)),
      |p AS (SELECT 'fx.a' AS series, i * 3600 AS ts, i AS pid,
      |             1000 + 50 * (i % 24) + CASE WHEN i >= 72 THEN 2000 ELSE 0 END AS val
      |      FROM g
      |      UNION ALL
      |      SELECT 'fx.b', i * 3600, i, 500 + 30 * ((i * 7) % 24) FROM g)""".stripMargin

  /** Chain output with the float value rounded for oracle compare. */
  private def rounded(df: DataFrame): DataFrame =
    df.select(col("series"), col("ts"), round(col("val"), 6).as("val"))

  private def chain(points: DataFrame, stages: Stage*): DataFrame =
    ordered(Pipeline(points, stages))

  private def chainR(points: DataFrame, stages: Stage*): DataFrame =
    ordered(rounded(Pipeline(points, stages)))

  private def bkt(gb: Long, off: Long = 0) = Pipeline.bucketSql(gb, off)

  def entries: Seq[Entry] = selection ++ timeRange ++ bucketedAggs ++
    toOneAggs ++ pairwise ++ filters ++ chains ++ merges ++ metadata ++
    ingest ++ asof ++ rangeJoin ++ sketches ++ sessionize ++ downsample ++
    counterRate ++ interpolate ++ movingAgg ++ anomaly ++ robust ++ decompose ++
    forecast ++ correlate ++ seriesMath ++ userStats ++ funnel ++
    bucketStats ++ timeWeighted

  // ---- exact per-bucket distribution stats (beyond-reference) ----
  private def bucketStats = Seq(
    // exact p50/p95/p99 per (series, 6h) in fixed point ×100 — the
    // whole interpolation is int64 arithmetic, no floats anywhere
    Entry("ts_bucket_percentiles",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |g AS (SELECT series, ts // 21600 AS bucket, list_sort(list(val)) AS vs, count(*) AS n
         |      FROM p GROUP BY 1, 2)
         |SELECT series, bucket, n,
         |  CAST(vs[CAST((n - 1) * 50 // 100 AS INT) + 1] * 100 + (CASE WHEN (n - 1) * 50 % 100 = 0 THEN 0 ELSE (vs[CAST((n - 1) * 50 // 100 AS INT) + 2] - vs[CAST((n - 1) * 50 // 100 AS INT) + 1]) * ((n - 1) * 50 % 100) END) AS BIGINT) AS p50_q100,
         |  CAST(vs[CAST((n - 1) * 95 // 100 AS INT) + 1] * 100 + (CASE WHEN (n - 1) * 95 % 100 = 0 THEN 0 ELSE (vs[CAST((n - 1) * 95 // 100 AS INT) + 2] - vs[CAST((n - 1) * 95 // 100 AS INT) + 1]) * ((n - 1) * 95 % 100) END) AS BIGINT) AS p95_q100,
         |  CAST(vs[CAST((n - 1) * 99 // 100 AS INT) + 1] * 100 + (CASE WHEN (n - 1) * 99 % 100 = 0 THEN 0 ELSE (vs[CAST((n - 1) * 99 // 100 AS INT) + 2] - vs[CAST((n - 1) * 99 // 100 AS INT) + 1]) * ((n - 1) * 99 % 100) END) AS BIGINT) AS p99_q100
         |FROM g ORDER BY ALL""".stripMargin) {
      // (series, 6h) cell: sf10 worst 43 points (real time ranges
      // grow with sf, so per-bucket density stays flat) -> 100k is a
      // scale-independent loud bound far under buffering-OOM size
      (s, d) => ordered(graft.engine.BucketStats.bucketPercentiles(I(s, d),
        bucket = 21600L, pcts = Seq(50, 95, 99), maxCell = 100000L))
    },
    // Prometheus-style cumulative value histogram per series; the bin
    // is FLOOR division on both sides (DuckDB // truncates like Spark
    // DIV, so both engines spell floor as (val - pmod) / width)
    Entry("ts_value_histogram",
      s"""WITH p AS (SELECT series, val FROM ($PI)),
         |h AS (SELECT series, (val - ((val % 500) + 500) % 500) // 500 AS bin, count(*) AS n_points FROM p GROUP BY 1, 2)
         |SELECT series, bin, n_points,
         |       CAST(sum(n_points) OVER (PARTITION BY series ORDER BY bin
         |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_points
         |FROM h ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.BucketStats.valueHistogram(I(s, d),
        binWidth = 500L))
    },
    // time x value density grid (heatmap panel): one hash agg over
    // (series, 6h bucket, 500-wide floor bin); sparse — empty cells
    // absent
    Entry("ts_heatmap",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI))
         |SELECT series, ts // 21600 AS bucket,
         |       (val - ((val % 500) + 500) % 500) // 500 AS bin,
         |       count(*) AS n_points
         |FROM p GROUP BY 1, 2, 3 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.BucketStats.timeValueHeatmap(I(s, d),
        bucket = 21600L, binWidth = 500L))
    },
    // exact distinct-value cardinality per cell (InfluxDB
    // COUNT(DISTINCT)); the HLL sketch path covers spill-sized cells
    Entry("ts_distinct_count",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI))
         |SELECT series, ts // 21600 AS bucket,
         |       CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
         |       count(*) AS n_points
         |FROM p GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.BucketStats.distinctCount(I(s, d),
        bucket = 21600L))
    },
    // per-cell plurality value (InfluxDB MODE): highest count wins,
    // ties break to the SMALLEST value — two hash aggs, no buffers
    Entry("ts_bucket_mode",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |c AS (SELECT series, ts // 21600 AS bucket, val, count(*) AS c FROM p GROUP BY 1, 2, 3),
         |r AS (SELECT series, bucket, val, c,
         |       row_number() OVER (PARTITION BY series, bucket
         |            ORDER BY c DESC, val ASC) AS rn
         |      FROM c)
         |SELECT series, bucket, val AS mode_val, CAST(c AS BIGINT) AS n_mode
         |FROM r WHERE rn = 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.BucketStats.bucketMode(I(s, d),
        bucket = 21600L))
    },
    // the continuous-aggregate cascade: 1h -> 6h -> 1d, each level
    // re-aggregated from the one below (raw points read/shuffled once)
    Entry("ts_rollup_pyramid",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h1 AS (SELECT series, ts // 3600 AS b, count(*) AS n_points, CAST(sum(val) AS BIGINT) AS sum_val,
         |        min(val) AS min_val, max(val) AS max_val FROM p GROUP BY 1, 2),
         |h6 AS (SELECT series, b // 6 AS b, CAST(sum(n_points) AS BIGINT) AS n_points,
         |        CAST(sum(sum_val) AS BIGINT) AS sum_val, min(min_val) AS min_val, max(max_val) AS max_val
         |       FROM h1 GROUP BY 1, 2),
         |d1 AS (SELECT series, b // 4 AS b, CAST(sum(n_points) AS BIGINT) AS n_points,
         |        CAST(sum(sum_val) AS BIGINT) AS sum_val, min(min_val) AS min_val, max(max_val) AS max_val
         |       FROM h6 GROUP BY 1, 2)
         |SELECT series, '1h' AS res, b * 3600 AS bucket_start, n_points, sum_val, min_val, max_val FROM h1
         |UNION ALL SELECT series, '6h', b * 21600, n_points, sum_val, min_val, max_val FROM h6
         |UNION ALL SELECT series, '1d', b * 86400, n_points, sum_val, min_val, max_val FROM d1
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.BucketStats.rollupPyramid(I(s, d)))
    },
    // exact heavy value-bands at sketch cost: Misra-Gries candidates
    // (guaranteed superset) + exact recount — so the oracle is a
    // plain GROUP BY ... HAVING with no sketch semantics to replay
    Entry("ts_heavy_hitters",
      s"""WITH p AS (SELECT series, (val - (((val % 5000) + 5000) % 5000)) // 5000 AS bin FROM ($PI)),
         |t AS (SELECT series, count(*) AS n_series FROM p GROUP BY 1),
         |c AS (SELECT series, bin, count(*) AS cnt FROM p GROUP BY 1, 2)
         |SELECT c.series, c.bin, c.cnt, t.n_series FROM c JOIN t USING (series)
         |WHERE c.cnt * 8 > t.n_series ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.HeavyHitters.heavyValueBins(I(s, d),
        binWidth = 5000L, k = 8))
    },
    // histogram_quantile: percentiles read off the cumulative bins
    // (rank + uniform-within-bin interpolation) — the bin-bounded
    // percentile path for cells the exact sorted-array form outgrows.
    // NOTE: the percentile list lives in its own `ps` CTE cross-joined
    // in — an in-SELECT `unnest([...]) AS p` next to `JOIN USING` trips
    // a DuckDB 1.0.0 INTERNAL binder error ("Failed to bind column
    // reference p") which invalidates the whole connection; keep the
    // unnest hoisted.
    Entry("ts_histogram_quantile",
      s"""WITH p AS (SELECT series, val FROM ($PI)),
         |h AS (SELECT series, (val - ((val % 500) + 500) % 500) // 500 AS bin, count(*) AS n_points FROM p GROUP BY 1, 2),
         |c AS (SELECT series, bin, n_points, sum(n_points) OVER (PARTITION BY series ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         |t AS (SELECT series, max(cum) AS n FROM c GROUP BY 1),
         |ps AS (SELECT unnest([50, 95, 99]) AS p),
         |x AS (SELECT c.series, c.bin, c.n_points, c.cum, t.n, ps.p FROM c JOIN t USING (series) CROSS JOIN ps),
         |q AS (SELECT series, p, n, (n * p + 99) // 100 AS target, bin, n_points, cum FROM x)
         |SELECT series, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
         |       CAST(bin * 500 * 1000000 + (500 * (target - (cum - n_points)) * 1000000) // n_points AS BIGINT) AS q_q6
         |FROM q WHERE cum >= target AND cum - n_points < target ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.BucketStats.histogramQuantile(I(s, d),
        binWidth = 500L, pcts = Seq(50, 95, 99)))
    })

  // Oracle replay of Funnel.funnel (view -> click -> purchase, 7-day
  // window) — shared by the standalone entry and the
  // funnel-significance composition.
  private val EV_FUNNEL_SQL =
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events
      |           WHERE event_type IN ('view', 'click', 'purchase')),
      |ut AS (SELECT user_id, event_type, list_sort(list(ts)) AS tss FROM e GROUP BY 1, 2),
      |pv AS (SELECT user_id,
      |        any_value(CASE WHEN event_type = 'view' THEN tss END) AS l0,
      |        any_value(CASE WHEN event_type = 'click' THEN tss END) AS l1,
      |        any_value(CASE WHEN event_type = 'purchase' THEN tss END) AS l2
      |       FROM ut GROUP BY 1),
      |s1 AS (SELECT user_id, l1, l2,
      |        CASE WHEN l0 IS NOT NULL AND len(l0) > 0 THEN l0[1] END AS t1 FROM pv),
      |s2 AS (SELECT user_id, l2, t1,
      |        list_filter(l1, x -> x > t1 AND x <= t1 + 604800) AS f1 FROM s1),
      |s2b AS (SELECT user_id, l2, t1,
      |        CASE WHEN f1 IS NOT NULL AND len(f1) > 0 THEN f1[1] END AS t2 FROM s2),
      |s3 AS (SELECT user_id, t1, t2,
      |        list_filter(l2, x -> x > t2 AND x <= t1 + 604800) AS f2 FROM s2b),
      |s3b AS (SELECT user_id, t1, t2,
      |        CASE WHEN f2 IS NOT NULL AND len(f2) > 0 THEN f2[1] END AS t3 FROM s3)
      |SELECT user_id, t1, t2, t3,
      |       CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |            ELSE 1 END AS BIGINT) AS depth
      |FROM s3b WHERE t1 IS NOT NULL ORDER BY ALL""".stripMargin

  // ---- ordered-funnel analytics over raw events (beyond-reference) ----
  private def funnel = Seq(
    // strict-order view -> click -> purchase within 7 days of the
    // first view, per user; timestamps exact int64, chain replayed
    Entry("ev_funnel", EV_FUNNEL_SQL) {
      (s, d) => ordered(graft.engine.Funnel.funnel(userEvents(s, d),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), window = 604800L))
    },
    // per-step conversion significance between the user_id%2 cohorts:
    // at-risk (reached step-1) vs converted (reached step) counts per
    // arm + the pooled two-proportion z — the per-step drill-down an
    // overall A/B readout can't give; the steps frame is a hoisted
    // CTE (the DuckDB unnest+JOIN binder pitfall)
    Entry("ev_funnel_sig",
      s"""WITH f AS (SELECT user_id, depth FROM ($EV_FUNNEL_SQL) x),
         |a AS (SELECT user_id % 2 AS arm, depth FROM f),
         |h AS (SELECT arm, depth, count(*) AS cnt FROM a GROUP BY 1, 2),
         |st AS (SELECT unnest([2, 3]) AS step),
         |j AS (SELECT step,
         |       CAST(sum(CASE WHEN arm = 0 AND depth >= step - 1 THEN cnt ELSE 0 END) AS BIGINT) AS n0,
         |       CAST(sum(CASE WHEN arm = 0 AND depth >= step THEN cnt ELSE 0 END) AS BIGINT) AS c0,
         |       CAST(sum(CASE WHEN arm = 1 AND depth >= step - 1 THEN cnt ELSE 0 END) AS BIGINT) AS n1,
         |       CAST(sum(CASE WHEN arm = 1 AND depth >= step THEN cnt ELSE 0 END) AS BIGINT) AS c1
         |      FROM h CROSS JOIN st GROUP BY 1)
         |SELECT CAST(step AS BIGINT) AS step, n0, c0, n1, c1,
         |  CAST(floor(CASE
         |    WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(NULL AS DOUBLE)
         |    ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         |      / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
         |             * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
         |             * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
         |    END * 1e6) AS BIGINT) AS z_q6
         |FROM j ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.funnelSignificance(
        userEvents(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), window = 604800L))
    },
    // the ClickHouse-windowFunnel max-depth variant: EVERY step-1
    // event retries as a chain start (each with its own window), the
    // user reports the best depth — the oracle replays the same greedy
    // retry walk with DuckDB list lambdas
    Entry("ev_funnel_retry",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |ut AS (SELECT user_id, event_type, list_sort(list(ts)) AS tss FROM e GROUP BY 1, 2),
        |pv AS (SELECT user_id,
        |        any_value(CASE WHEN event_type = 'view' THEN tss END) AS l0,
        |        any_value(CASE WHEN event_type = 'click' THEN tss END) AS l1,
        |        any_value(CASE WHEN event_type = 'purchase' THEN tss END) AS l2
        |       FROM ut GROUP BY 1)
        |SELECT user_id, CAST(len(l0) AS BIGINT) AS n_starts,
        |       CAST(list_max(list_transform(l0, t1 ->
        |         CASE WHEN list_filter(l2, x3 -> x3 > (list_filter(l1, x2 -> x2 > t1 AND x2 <= t1 + 604800)[1]) AND x3 <= t1 + 604800)[1] IS NOT NULL THEN 3
        |              WHEN list_filter(l1, x2 -> x2 > t1 AND x2 <= t1 + 604800)[1] IS NOT NULL THEN 2
        |              ELSE 1 END)) AS BIGINT) AS depth
        |FROM pv WHERE l0 IS NOT NULL AND len(l0) > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.funnelRetry(userEvents(s, d),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), window = 604800L))
    },
    // the funnel CHART itself: users reaching step >= k (cumulative
    // counts over the per-user depths — what a dashboard renders)
    Entry("ev_funnel_summary",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |ut AS (SELECT user_id, event_type, list_sort(list(ts)) AS tss FROM e GROUP BY 1, 2),
        |pv AS (SELECT user_id,
        |        any_value(CASE WHEN event_type = 'view' THEN tss END) AS l0,
        |        any_value(CASE WHEN event_type = 'click' THEN tss END) AS l1,
        |        any_value(CASE WHEN event_type = 'purchase' THEN tss END) AS l2
        |       FROM ut GROUP BY 1),
        |s1 AS (SELECT user_id, l1, l2,
        |        CASE WHEN l0 IS NOT NULL AND len(l0) > 0 THEN l0[1] END AS t1 FROM pv),
        |s2 AS (SELECT user_id, l2, t1,
        |        list_filter(l1, x -> x > t1 AND x <= t1 + 604800) AS f1 FROM s1),
        |s2b AS (SELECT user_id, l2, t1,
        |        CASE WHEN f1 IS NOT NULL AND len(f1) > 0 THEN f1[1] END AS t2 FROM s2),
        |s3 AS (SELECT user_id, t1, t2,
        |        list_filter(l2, x -> x > t2 AND x <= t1 + 604800) AS f2 FROM s2b),
        |s3b AS (SELECT user_id, t1, t2,
        |        CASE WHEN f2 IS NOT NULL AND len(f2) > 0 THEN f2[1] END AS t3 FROM s3),
        |d AS (SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |             ELSE 1 END AS depth
        |      FROM s3b WHERE t1 IS NOT NULL),
        |steps AS (SELECT unnest(range(1, 4)) AS step)
        |SELECT step, CAST((SELECT count(*) FROM d WHERE depth >= step) AS BIGINT) AS n_users
        |FROM steps ORDER BY ALL""".stripMargin) {
      (s, d) => {
        import s.implicits._
        val per = graft.engine.Funnel.funnel(userEvents(s, d),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), window = 604800L)
          .select(col("depth"))
        // 3 literal step rows against the user-sized depth frame — the
        // theta join is a broadcast of the 3-row side, then one agg
        val steps = Seq(1L, 2L, 3L).toDF("step")
        ordered(broadcast(steps)
          .join(per, col("depth") >= col("step"), "left")
          .groupBy(col("step"))
          .agg(count(col("depth")).as("n_users")))
      }
    },
    // time-to-convert distribution: t3 - t1 over completed funnels,
    // read off hour-wide cumulative bins (the bin-bounded percentile
    // path — converted-user counts can be huge, the bin table can't)
    Entry("ev_funnel_ttc",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |ut AS (SELECT user_id, event_type, list_sort(list(ts)) AS tss FROM e GROUP BY 1, 2),
        |pv AS (SELECT user_id,
        |        any_value(CASE WHEN event_type = 'view' THEN tss END) AS l0,
        |        any_value(CASE WHEN event_type = 'click' THEN tss END) AS l1,
        |        any_value(CASE WHEN event_type = 'purchase' THEN tss END) AS l2
        |       FROM ut GROUP BY 1),
        |s1 AS (SELECT user_id, l1, l2,
        |        CASE WHEN l0 IS NOT NULL AND len(l0) > 0 THEN l0[1] END AS t1 FROM pv),
        |s2 AS (SELECT user_id, l2, t1,
        |        list_filter(l1, x -> x > t1 AND x <= t1 + 604800) AS f1 FROM s1),
        |s2b AS (SELECT user_id, l2, t1,
        |        CASE WHEN f1 IS NOT NULL AND len(f1) > 0 THEN f1[1] END AS t2 FROM s2),
        |s3 AS (SELECT user_id, t1, t2,
        |        list_filter(l2, x -> x > t2 AND x <= t1 + 604800) AS f2 FROM s2b),
        |s3b AS (SELECT user_id, t1, t2,
        |        CASE WHEN f2 IS NOT NULL AND len(f2) > 0 THEN f2[1] END AS t3 FROM s3),
        |d AS (SELECT 'ttc' AS series, t3 - t1 AS val FROM s3b WHERE t3 IS NOT NULL),
        |h AS (SELECT series, (val - ((val % 3600) + 3600) % 3600) // 3600 AS bin, count(*) AS n_points FROM d GROUP BY 1, 2),
        |c AS (SELECT series, bin, n_points, sum(n_points) OVER (PARTITION BY series ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |t AS (SELECT series, max(cum) AS n FROM c GROUP BY 1),
        |ps AS (SELECT unnest([50, 95]) AS p),
        |x AS (SELECT c.series, c.bin, c.n_points, c.cum, t.n, ps.p FROM c JOIN t USING (series) CROSS JOIN ps),
        |q AS (SELECT series, p, n, (n * p + 99) // 100 AS target, bin, n_points, cum FROM x)
        |SELECT series, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
        |       CAST(bin * 3600 * 1000000 + (3600 * (target - (cum - n_points)) * 1000000) // n_points AS BIGINT) AS q_q6
        |FROM q WHERE cum >= target AND cum - n_points < target ORDER BY ALL""".stripMargin) {
      (s, d) => {
        // pin the funnel output BEFORE filtering: a filter on `depth`
        // pushes below the funnel's chained t1→t2→t3 projections and
        // re-expands the per-user array-lambda trees into both the
        // predicate and the dt projection (measured ~6 s vs ~1 s at
        // sf1 for the composition). Checkpointed, the funnel columns
        // evaluate exactly once into a user-sized frame of plain
        // longs, and the filter + histogram read those.
        val f = graft.engine.Funnel.funnel(userEvents(s, d),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), window = 604800L)
          .localCheckpoint(true)
          .where(col("depth") === 3L)
          .select(lit("ttc").as("series"), (col("t3") - col("t1")).as("val"))
        ordered(graft.engine.BucketStats.histogramQuantile(f,
          binWidth = 3600L, pcts = Seq(50, 95)))
      }
    },
    // top-20 user journeys: each user's first 5 events as a path
    // string, ranked by population (ties by path)
    Entry("ev_top_paths",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events),
        |r AS (SELECT user_id, ts, event_type,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_type) AS rk
        |      FROM e),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_type) AS path
        |      FROM r WHERE rk <= 5 GROUP BY 1)
        |SELECT path, count(*) AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.topPaths(userEvents(s, d),
        "user_id", "ts", "event_type", pathLen = 5, k = 20))
    },
    // event-transition (Sankey/flows) matrix with a 1h inactivity
    // cut: consecutive same-user pairs, event-vocabulary^2 output
    Entry("ev_transitions",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events),
        |l AS (SELECT user_id, ts, event_type,
        |       lag(event_type) OVER w AS pe, lag(ts) OVER w AS pts
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type))
        |SELECT pe AS from_event, event_type AS to_event,
        |       count(*) AS n_transitions,
        |       CAST(sum(ts - pts) AS BIGINT) AS sum_dt
        |FROM l WHERE pe IS NOT NULL AND ts - pts <= 3600
        |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.transitions(userEvents(s, d),
        "user_id", "ts", "event_type", maxGap = 3600L))
    },
    // non-overlapping conversion count (ClickHouse sequenceCount
    // shape): the DP replayed via a RECURSIVE CTE walking each user's
    // sorted event list one element per recursion level, state
    // (lv1, lv2, cnt) carried in plain columns. NOT list_reduce: in
    // DuckDB 1.0.0 a struct-accumulator list_reduce evaluated over
    // MULTIPLE rows corrupts per-row state (verified at sf0.001:
    // full-table gave 4/5/2 for users 6/12/13 where single-row
    // evaluation, a Python reference, and the Spark DP all agree on
    // 5/4/3 — the dupClusters recursive-CTE precedent is the safe
    // shape)
    Entry("ev_sequence_count",
      """WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |ut AS (SELECT user_id, event_type, list_sort(list(ts)) AS tss FROM e GROUP BY 1, 2),
        |pv AS (SELECT user_id,
        |        any_value(CASE WHEN event_type = 'view' THEN tss END) AS l0,
        |        any_value(CASE WHEN event_type = 'click' THEN tss END) AS l1,
        |        any_value(CASE WHEN event_type = 'purchase' THEN tss END) AS l2
        |       FROM ut GROUP BY 1),
        |m AS (SELECT user_id, list_sort(
        |        list_transform(coalesce(l0, []), x -> {'t': x, 'ns': CAST(-1 AS BIGINT)}) ||
        |        list_transform(coalesce(l1, []), x -> {'t': x, 'ns': CAST(-2 AS BIGINT)}) ||
        |        list_transform(coalesce(l2, []), x -> {'t': x, 'ns': CAST(-3 AS BIGINT)})) AS ev
        |      FROM pv),
        |walk AS (
        |  SELECT user_id, ev, len(ev) AS n, 0 AS i,
        |         CAST(NULL AS BIGINT) AS lv1, CAST(NULL AS BIGINT) AS lv2,
        |         CAST(0 AS BIGINT) AS cnt
        |  FROM m
        |  UNION ALL
        |  SELECT user_id, ev, n, i + 1,
        |    CASE WHEN ev[i+1].ns = -3 AND lv2 IS NOT NULL AND ev[i+1].t <= lv2 + 604800 THEN NULL
        |         WHEN ev[i+1].ns = -1 THEN greatest(lv1, ev[i+1].t) ELSE lv1 END,
        |    CASE WHEN ev[i+1].ns = -3 AND lv2 IS NOT NULL AND ev[i+1].t <= lv2 + 604800 THEN NULL
        |         WHEN ev[i+1].ns = -2 AND lv1 IS NOT NULL AND ev[i+1].t <= lv1 + 604800 THEN greatest(lv2, lv1)
        |         ELSE lv2 END,
        |    cnt + CASE WHEN ev[i+1].ns = -3 AND lv2 IS NOT NULL AND ev[i+1].t <= lv2 + 604800 THEN 1 ELSE 0 END
        |  FROM walk WHERE i < n)
        |SELECT user_id, cnt AS n_matches FROM walk
        |WHERE i = n AND cnt > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.sequenceCount(userEvents(s, d),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), window = 604800L))
    },
    // any-order funnel: window anchors at the user's first event of
    // ANY step; a step completes if done at any point in the window.
    // Every funnel event is >= the anchor, so completion reduces to
    // "the step's earliest event is within the window"
    Entry("ev_funnel_unordered",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |pm AS (SELECT user_id, event_type, min(ts) AS m FROM e GROUP BY 1, 2),
        |u AS (SELECT user_id, min(m) AS t_start FROM pm GROUP BY 1)
        |SELECT p.user_id, u.t_start,
        |       CAST(count(*) FILTER (WHERE p.m <= u.t_start + 604800) AS BIGINT) AS n_steps,
        |       count(*) FILTER (WHERE p.m <= u.t_start + 604800) = 3 AS completed
        |FROM pm p JOIN u USING (user_id) GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.funnelUnordered(userEvents(s, d),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), window = 604800L))
    },
    // rolling ("return on or after") retention: a cohort user counts
    // at week k if active at k or ANY later week — the whole user
    // contribution is d_max = last active wk − cohort wk, so counts
    // collapse to (cohort, d_max) cells before the k-explode
    Entry("ev_retention_rolling",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 // 604800 AS wk, event_type FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |l AS (SELECT user_id, max(wk) AS last_wk FROM e GROUP BY 1),
        |d AS (SELECT cohort_wk, last_wk - cohort_wk AS dmax, count(*) AS cnt
        |      FROM c JOIN l USING (user_id) GROUP BY 1, 2),
        |x AS (SELECT cohort_wk, unnest(generate_series(0, dmax)) AS week_k, cnt FROM d)
        |SELECT cohort_wk, CAST(week_k AS BIGINT) AS week_k,
        |       CAST(sum(cnt) AS BIGINT) AS n_users
        |FROM x GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.rollingRetention(userEvents(s, d),
        "user_id", "ts", "event_type", cohortEvent = "signup"))
    },
    // weekly cohort retention: users bucketed by first-signup week,
    // counted in every later week they were active at all
    Entry("ev_retention",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type FROM events),
        |c AS (SELECT user_id, min(ts // 604800) AS cohort_wk FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, ts // 604800 AS wk FROM e)
        |SELECT cohort_wk, wk - cohort_wk AS week_k, count(*) AS n_users
        |FROM a JOIN c USING (user_id) WHERE wk >= cohort_wk
        |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Funnel.retention(userEvents(s, d),
        "user_id", "ts", "event_type", cohortEvent = "signup"))
    })

  // ---- cross-series correlation discovery (beyond-reference) ----
  private def correlate = Seq(
    // Pearson r between every integer-series pair over hourly rollup
    // sums; all moments exact int64, covariance/variance terms stay
    // integer, r bit-identical and floor-quantized
    Entry("ts_correlate",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2),
         |pr AS (SELECT a.series AS series_a, b.series AS series_b, a.x AS x, b.x AS y
         |       FROM h a JOIN h b ON a.bucket = b.bucket AND a.series < b.series),
         |m AS (SELECT series_a, series_b, count(*) AS n,
         |       CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |       CAST(sum(x * y) AS BIGINT) AS sxy,
         |       CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM pr GROUP BY 1, 2 HAVING count(*) >= 24),
         |d AS (SELECT series_a, series_b, n,
         |       n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
         |      FROM m)
         |SELECT series_a, series_b, n,
         |       CAST(floor(num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE)) * 1e6) AS BIGINT) AS r_q6
         |FROM d WHERE dx > 0 AND dy > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Correlate.pairwisePearson(I(s, d),
        bucket = 3600L, minBuckets = 24L))
    },
    // the BLOCKED variant: pairs only within the same metric family
    // (the '<fam>.<kind>' prefix), dropping per-bucket fan-out from S²
    // to Σ groupSize² — the shape correlation discovery needs at
    // large S; same exact integer moments and fixed-point r
    Entry("ts_correlate_grouped",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT regexp_extract(series, '^[^.]+\\.[^.]+', 0) AS grp, series, ts // 3600 AS bucket,
         |       CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2, 3),
         |pr AS (SELECT a.series AS series_a, b.series AS series_b, a.x AS x, b.x AS y
         |       FROM h a JOIN h b ON a.grp = b.grp AND a.bucket = b.bucket AND a.series < b.series),
         |m AS (SELECT series_a, series_b, count(*) AS n,
         |       CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |       CAST(sum(x * y) AS BIGINT) AS sxy,
         |       CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM pr GROUP BY 1, 2 HAVING count(*) >= 24),
         |d AS (SELECT series_a, series_b, n,
         |       n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
         |      FROM m)
         |SELECT series_a, series_b, n,
         |       CAST(floor(num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE)) * 1e6) AS BIGINT) AS r_q6
         |FROM d WHERE dx > 0 AND dy > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Correlate.pairwisePearson(I(s, d),
        bucket = 3600L, minBuckets = 24L,
        groupExpr = Some("regexp_extract(series, '^[^.]+\\\\.[^.]+', 0)")))
    })

  // ---- cross-series arithmetic (beyond-reference; SeriesMath) ----
  private def seriesMath = Seq(
    // share-of-family: each series' per-bucket fraction of its metric
    // family's total (PromQL `a / sum(group)`), truncating-DIV
    // quantized — integer end to end on both engines
    Entry("ts_series_share",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT regexp_extract(series, '^[^.]+\\.[^.]+', 0) AS family, series, ts // 3600 AS bucket,
         |       CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2, 3),
         |t AS (SELECT family, bucket, CAST(sum(x) AS BIGINT) AS total FROM h GROUP BY 1, 2)
         |SELECT h.family, h.series, h.bucket, h.x, t.total,
         |       CAST(h.x * 1000000 // t.total AS BIGINT) AS share_q6
         |FROM h JOIN t USING (family, bucket) WHERE t.total <> 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.shareOfTotal(I(s, d),
        bucket = 3600L))
    },
    // lead/lag Pearson at shifts -2..+2 buckets — the lag list lives
    // in its own hoisted CTE (the round-11 DuckDB binder-bug rule:
    // never unnest in a SELECT that also JOINs USING)
    Entry("ts_xcorr_lag",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT regexp_extract(series, '^[^.]+\\.[^.]+', 0) AS grp, series, ts // 3600 AS bucket,
         |       CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2, 3),
         |ls AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag),
         |pr AS (SELECT a.series AS series_a, b.series AS series_b, ls.lag AS lag, a.x AS x, b.x AS y
         |       FROM h a JOIN h b ON a.grp = b.grp AND a.series < b.series
         |       CROSS JOIN ls WHERE a.bucket = b.bucket - ls.lag),
         |m AS (SELECT series_a, series_b, lag, count(*) AS n,
         |       CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |       CAST(sum(x * y) AS BIGINT) AS sxy,
         |       CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM pr GROUP BY 1, 2, 3 HAVING count(*) >= 24),
         |d AS (SELECT series_a, series_b, lag, n,
         |       n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
         |      FROM m)
         |SELECT series_a, series_b, CAST(lag AS BIGINT) AS lag, n,
         |       CAST(floor(num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE)) * 1e6) AS BIGINT) AS r_q6
         |FROM d WHERE dx > 0 AND dy > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.laggedPearson(I(s, d),
        bucket = 3600L, maxLag = 2, minBuckets = 24L))
    },
    // autocorrelation at lags 1..24 — the periodicity diagnostic; the
    // self-join is per-series co-partitioned, moments exact int64
    Entry("ts_acf",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2),
         |ls AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24]) AS lag),
         |pr AS (SELECT a.series AS series, ls.lag AS lag, a.x AS x, b.x AS y
         |       FROM h a JOIN h b ON a.series = b.series
         |       CROSS JOIN ls WHERE a.bucket = b.bucket - ls.lag),
         |m AS (SELECT series, lag, count(*) AS n,
         |       CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |       CAST(sum(x * y) AS BIGINT) AS sxy,
         |       CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM pr GROUP BY 1, 2 HAVING count(*) >= 24),
         |d AS (SELECT series, lag, n,
         |       n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
         |      FROM m)
         |SELECT series, CAST(lag AS BIGINT) AS lag, n,
         |       CAST(floor(num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE)) * 1e6) AS BIGINT) AS r_q6
         |FROM d WHERE dx > 0 AND dy > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.acf(I(s, d),
        bucket = 3600L, maxLag = 24, minBuckets = 24L))
    },
    // PSI drift per series (first vs second half of the range, 5000-
    // wide value bands, add-one smoothing): each bin's contribution
    // floor-quantized ×1e9 BEFORE the sum — order-independent integer
    Entry("ts_psi_drift",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |md AS (SELECT min(ts) + (max(ts) - min(ts)) // 2 AS mid FROM p),
         |b AS (SELECT series, (val - (((val % 5000) + 5000) % 5000)) // 5000 AS bin,
         |       CASE WHEN ts <= md.mid THEN 0 ELSE 1 END AS half FROM p, md),
         |c AS (SELECT series, bin,
         |       CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         |       CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
         |      FROM b GROUP BY 1, 2),
         |t AS (SELECT series, CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
         |       count(*) AS bcnt FROM c GROUP BY 1),
         |k AS (SELECT c.series, c.c0, c.c1, t.n0, t.n1, t.bcnt,
         |       CAST(floor(
         |         (CAST(c.c0 + 1 AS DOUBLE) / CAST(t.n0 + t.bcnt AS DOUBLE)
         |          - CAST(c.c1 + 1 AS DOUBLE) / CAST(t.n1 + t.bcnt AS DOUBLE))
         |         * ln((CAST(c.c0 + 1 AS DOUBLE) / CAST(t.n0 + t.bcnt AS DOUBLE))
         |              / (CAST(c.c1 + 1 AS DOUBLE) / CAST(t.n1 + t.bcnt AS DOUBLE)))
         |         * 1e9) AS BIGINT) AS contrib_q9
         |      FROM c JOIN t USING (series))
         |SELECT series, max(n0) AS n0, max(n1) AS n1, CAST(max(bcnt) AS BIGINT) AS n_bins,
         |       CAST(sum(contrib_q9) AS BIGINT) AS psi_q9
         |FROM k GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.psiDrift(I(s, d),
        binWidth = 5000L))
    },
    // per-(series, 6h) OLS trend slope: five exact int64 moments, one
    // deterministic IEEE divide, floor-quantized; degenerate cells out
    Entry("ts_trend_slope",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |m AS (SELECT series, ts // 21600 AS bucket, count(*) AS n,
         |       CAST(sum(ts % 21600) AS BIGINT) AS st, CAST(sum(val) AS BIGINT) AS sy,
         |       CAST(sum((ts % 21600) * val) AS BIGINT) AS sty,
         |       CAST(sum((ts % 21600) * (ts % 21600)) AS BIGINT) AS stt
         |      FROM p GROUP BY 1, 2),
         |d AS (SELECT series, bucket, n, n * sty - st * sy AS num, n * stt - st * st AS den FROM m)
         |SELECT series, bucket, n,
         |       CAST(floor(num::DOUBLE / den::DOUBLE * 1e6) AS BIGINT) AS slope_q6
         |FROM d WHERE den > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.trendSlope(I(s, d),
        bucket = 21600L))
    },
    // SAX symbolization (min-max banding, not z-score — the band
    // index multiplies through by the bucket count so the PAA mean
    // never materializes as a fraction; integer end to end)
    Entry("ts_sax",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |g AS (SELECT series, ts // 3600 AS bucket, CAST(sum(val) AS BIGINT) AS s, count(*) AS n_points FROM p GROUP BY 1, 2),
         |mm AS (SELECT series, min(val) AS vmin, max(val) AS vmax FROM p GROUP BY 1)
         |SELECT g.series, g.bucket, g.n_points,
         |       CAST(((g.s - mm.vmin * g.n_points) * 8) // ((mm.vmax - mm.vmin + 1) * g.n_points) AS BIGINT) AS sym
         |FROM g JOIN mm USING (series) ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Sax.symbolize(I(s, d),
        bucket = 3600L, alphabet = 8))
    },
    // Tukey boxplot-fence outliers: exact lower-element quartiles, the
    // 1.5·IQR factor cross-multiplied — int64 end to end
    Entry("ts_outlier_iqr",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI)),
         |s AS (SELECT series, list_sort(list(val)) AS vs, count(*) AS n FROM p GROUP BY 1),
         |f AS (SELECT series, vs[CAST((n - 1) * 25 // 100 AS INT) + 1] AS q1,
         |             vs[CAST((n - 1) * 75 // 100 AS INT) + 1] AS q3 FROM s)
         |SELECT p.series, p.ts, p.pid, p.val, f.q1, f.q3
         |FROM p JOIN f USING (series)
         |WHERE p.val * 2 > f.q3 * 2 + (f.q3 - f.q1) * 3
         |   OR p.val * 2 < f.q1 * 2 - (f.q3 - f.q1) * 3
         |ORDER BY ALL""".stripMargin) {
      // whole-series cell: sf10 worst 265,600 points -> 3M (~11x)
      (s, d) => ordered(graft.engine.Anomaly.tukeyOutliers(I(s, d),
        maxCell = 3000000L))
    },
    // two-window mean-shift changepoints: day-vs-day sums (k = 24
    // buckets = one full season, so the diurnal cycle CANCELS between
    // the windows and only true level shifts score — a 12h window
    // flagged 41% of buckets on this data, pure seasonality aliasing),
    // relative threshold cross-multiplied — exact int64 comparisons
    Entry("ts_changepoint",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2),
         |w AS (SELECT series, bucket,
         |       CAST(sum(x) OVER wb AS BIGINT) AS before_sum, count(*) OVER wb AS nb,
         |       CAST(sum(x) OVER wa AS BIGINT) AS after_sum, count(*) OVER wa AS na,
         |       min(bucket) OVER wb AS minb, max(bucket) OVER wa AS maxa
         |      FROM h WINDOW
         |        wb AS (PARTITION BY series ORDER BY bucket ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
         |        wa AS (PARTITION BY series ORDER BY bucket ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING))
         |SELECT series, bucket, before_sum, after_sum, after_sum - before_sum AS shift
         |FROM w WHERE nb = 24 AND na = 24
         |  AND bucket - minb = 24 AND maxa - bucket = 23
         |  AND abs(after_sum - before_sum) * 100 >= 30 * abs(before_sum)
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.meanShift(I(s, d),
        bucket = 3600L, k = 24, relPct = 30L))
    },
    // the same operator over the generated fixture (fxPoints): the
    // level shift at hour 72 GUARANTEES flagged boundaries, so the
    // window SQL is verified on non-empty output at every sf
    Entry("ts_changepoint_fixture",
      s"""WITH $FXSQL,
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(sum(val) AS BIGINT) AS x FROM p GROUP BY 1, 2),
         |w AS (SELECT series, bucket,
         |       CAST(sum(x) OVER wb AS BIGINT) AS before_sum, count(*) OVER wb AS nb,
         |       CAST(sum(x) OVER wa AS BIGINT) AS after_sum, count(*) OVER wa AS na,
         |       min(bucket) OVER wb AS minb, max(bucket) OVER wa AS maxa
         |      FROM h WINDOW
         |        wb AS (PARTITION BY series ORDER BY bucket ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
         |        wa AS (PARTITION BY series ORDER BY bucket ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING))
         |SELECT series, bucket, before_sum, after_sum, after_sum - before_sum AS shift
         |FROM w WHERE nb = 24 AND na = 24
         |  AND bucket - minb = 24 AND maxa - bucket = 23
         |  AND abs(after_sum - before_sum) * 100 >= 30 * abs(before_sum)
         |ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(graft.engine.SeriesMath.meanShift(fxPoints(s),
        bucket = 3600L, k = 24, relPct = 30L))
    },
    // hour-of-day ANOVA R² per series ("is this metric diurnal"):
    // integer moments + ONE fixed-order 24-element double fold —
    // DuckDB's list_reduce over a plain DOUBLE list replays Spark's
    // aggregate() lambda term-for-term in ascending-hour order
    // (0.0 + t1 = t1 exactly, so the missing init cancels)
    Entry("ts_seasonal_strength",
      s"""WITH p AS (SELECT series, (ts // 3600) % 24 AS hour, val FROM ($PI)),
         |h AS (SELECT series, hour, count(*) AS nh, CAST(sum(val) AS BIGINT) AS sh,
         |       CAST(sum(val * val) AS BIGINT) AS s2h FROM p GROUP BY 1, 2),
         |s AS (SELECT series, CAST(sum(nh) AS BIGINT) AS n, CAST(sum(sh) AS BIGINT) AS s1,
         |       CAST(sum(s2h) AS BIGINT) AS s2,
         |       list_reduce(list_transform(list(struct_pack(nh := nh, sh := sh) ORDER BY hour),
         |         e -> CAST(e.sh AS DOUBLE) * CAST(e.sh AS DOUBLE) / CAST(e.nh AS DOUBLE)),
         |         (a, b) -> a + b) AS ssb
         |      FROM h GROUP BY 1)
         |SELECT series, n,
         |       CAST(floor((CAST(n AS DOUBLE) * ssb - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         |                  / CAST(n * s2 - s1 * s1 AS DOUBLE) * 1e6) AS BIGINT) AS strength_q6
         |FROM s WHERE n * s2 - s1 * s1 > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.seasonalStrength(I(s, d)))
    },
    // capacity ETA: per-series OLS on the hour offset inside the
    // trailing 720 h window (t <= 720 by construction — the int64
    // headroom bound a 100x-longer history cannot break), solved
    // for the cap crossing; only rising, still-below-cap series emit
    Entry("ts_threshold_eta",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |m AS (SELECT series, max(ts) - 720 * 3600 AS w0 FROM p GROUP BY 1),
         |t AS (SELECT p.series, (p.ts - m.w0) // 3600 AS t, p.val AS y
         |      FROM p JOIN m USING (series) WHERE p.ts >= m.w0),
         |a AS (SELECT series, count(*) AS n, CAST(sum(t) AS BIGINT) AS st,
         |       CAST(sum(y) AS BIGINT) AS sy, CAST(sum(t * y) AS BIGINT) AS sty,
         |       CAST(sum(t * t) AS BIGINT) AS stt
         |      FROM t GROUP BY 1),
         |g AS (SELECT series, n, CAST(n * sty - st * sy AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE) AS b,
         |       st, sy FROM a WHERE n * stt - st * st > 0 AND n * sty - st * sy > 0),
         |e AS (SELECT series, n, b,
         |       (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE)
         |         + b * CAST(720 AS DOUBLE) AS fit_last FROM g)
         |SELECT series, n, CAST(floor(b * 1e6) AS BIGINT) AS slope_q6,
         |       CAST(floor((60000 - fit_last) / b * 1e3) AS BIGINT) AS eta_hours_q3
         |FROM e WHERE fit_last < 60000 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.SeriesMath.thresholdEta(I(s, d),
        cap = 60000L))
    })

  // ---- user-activity health metrics (beyond-reference; UserStats) ----
  private def userStats = Seq(
    // DAU / trailing-7d WAU / stickiness ratio per active day; the
    // sliding DISTINCT is an explode of the reduced user-day frame
    Entry("us_stickiness",
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM e GROUP BY 1),
        |g AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS slot),
        |w AS (SELECT e.day + g.slot AS slot_day, e.user_id FROM e CROSS JOIN g),
        |wau AS (SELECT slot_day, count(DISTINCT user_id) AS wau FROM w GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_q6
        |FROM dau JOIN wau ON dau.day = wau.slot_day ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.stickiness(userEvents(s, d),
        windowDays = 7))
    },
    // growth accounting: per day, actives split new / retained (seen
    // within 7 days) / resurrected (returning after a longer gap)
    Entry("us_lifecycle",
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day FROM events),
        |l AS (SELECT user_id, day, lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev FROM e)
        |SELECT day,
        |       CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |       CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |FROM l GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.lifecycle(userEvents(s, d),
        gapDays = 7L))
    },
    // engagement histogram: users active exactly k distinct days
    Entry("us_power_curve",
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day FROM events),
        |a AS (SELECT user_id, count(*) AS active_days FROM e GROUP BY 1)
        |SELECT active_days, count(*) AS n_users FROM a GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.powerCurve(userEvents(s, d)))
    },
    // per-user session stats (sessionize on the USER axis): 30-min
    // inactivity gap; exact counts and summed durations
    Entry("us_sessions",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts FROM events),
        |l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM e),
        |n AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR ts - prev > 1800 THEN 1 ELSE 0 END AS nw FROM l),
        |i AS (SELECT user_id, ts, sum(nw) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM n),
        |s AS (SELECT user_id, sid, count(*) AS n_events, max(ts) - min(ts) AS dur FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
        |       CAST(sum(dur) AS BIGINT) AS dur_sum
        |FROM s GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.sessionStats(userEvents(s, d),
        gap = 1800L))
    },
    // cohort LTV triangle: revenue (exact integer cents, same ×100
    // round as the integer point family) per signup cohort by weeks
    // since signup, with the running cumulative per cohort
    Entry("ev_cohort_ltv",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type,
        |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT user_id, min(ts // 604800) AS cohort_wk FROM e WHERE event_type = 'signup' GROUP BY 1),
        |r AS (SELECT user_id, ts // 604800 AS wk, cents FROM e WHERE event_type = 'purchase'),
        |g AS (SELECT c.cohort_wk, r.wk - c.cohort_wk AS week_k, count(*) AS n_purchases,
        |             CAST(sum(r.cents) AS BIGINT) AS ltv_cents
        |      FROM r JOIN c USING (user_id) WHERE r.wk >= c.cohort_wk GROUP BY 1, 2)
        |SELECT cohort_wk, week_k, n_purchases, ltv_cents,
        |       CAST(sum(ltv_cents) OVER (PARTITION BY cohort_wk ORDER BY week_k
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ltv_cents
        |FROM g ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.cohortLtv(userEventsVal(s, d)))
    },
    // RFM segmentation: per purchasing user, recency/frequency/
    // monetary quintiles — ntile(5) with user_id tiebreaks so both
    // engines bucket identically (SQL-standard remainder-first ntile)
    Entry("ev_rfm",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts, event_type,
        |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |u AS (SELECT user_id, max(ts) AS last_ts, count(*) AS n_purchases,
        |             CAST(sum(cents) AS BIGINT) AS cents FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |s AS (SELECT user_id, last_ts, n_purchases, cents,
        |       CAST(ntile(5) OVER (ORDER BY last_ts, user_id) AS BIGINT) AS r,
        |       CAST(ntile(5) OVER (ORDER BY n_purchases, user_id) AS BIGINT) AS f,
        |       CAST(ntile(5) OVER (ORDER BY cents, user_id) AS BIGINT) AS m
        |      FROM u)
        |SELECT user_id, last_ts, n_purchases, cents, r, f, m,
        |       r * 100 + f * 10 + m AS rfm
        |FROM s ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.rfm(userEventsVal(s, d)))
    },
    // A/B readout: two-proportion pooled z per goal event between the
    // deterministic parity arms; conversion = >=14 goal events (the
    // per-user median is 13 at every sf, so the cut stays partial —
    // with >=1 every user converts on everything and z is all-NULL);
    // degenerate splits emit NULL z
    Entry("ev_ab_test",
      """WITH ua AS (SELECT DISTINCT user_id, user_id % 2 AS arm FROM events),
        |tot AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM ua),
        |cv AS (SELECT user_id, user_id % 2 AS arm, event_type AS goal FROM events
        |       GROUP BY 1, 2, 3 HAVING count(*) >= 14),
        |c AS (SELECT goal, CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |              CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM cv GROUP BY 1)
        |SELECT goal, n0, c0, n1, c1,
        |  CAST(floor(CASE
        |    WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(NULL AS DOUBLE)
        |    ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |             * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |             * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    END * 1e6) AS BIGINT) AS z_q6
        |FROM c, tot ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.abTest(userEvents(s, d),
        minCount = 14L))
    },
    // the power half of the A/B readout: observed rates, minimum
    // detectable effect at the current n, and the per-arm n the
    // OBSERVED effect would need (α=0.05 two-sided, 80% power) — the
    // z quantiles appear as the same literal sum in both engines
    Entry("ev_ab_power",
      """WITH ua AS (SELECT DISTINCT user_id, user_id % 2 AS arm FROM events),
        |tot AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM ua),
        |cv AS (SELECT user_id, user_id % 2 AS arm, event_type AS goal FROM events
        |       GROUP BY 1, 2, 3 HAVING count(*) >= 14),
        |c AS (SELECT goal, CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |              CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM cv GROUP BY 1),
        |p AS (SELECT goal, n0, c0, n1, c1,
        |  CASE WHEN n0 = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) END AS p0,
        |  CASE WHEN n1 = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS p1,
        |  CAST(floor(CASE
        |    WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(NULL AS DOUBLE)
        |    ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |             * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |             * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    END * 1e6) AS BIGINT) AS z_q6
        | FROM c, tot)
        |SELECT goal, n0, c0, n1, c1, z_q6,
        |  CAST(floor(p0 * 1e6) AS BIGINT) AS p0_q6,
        |  CAST(floor(p1 * 1e6) AS BIGINT) AS p1_q6,
        |  CAST(floor((p1 - p0) * 1e6) AS BIGINT) AS effect_q6,
        |  CAST(floor(CASE
        |    WHEN n0 = 0 OR n1 = 0 OR p0 * (1.0 - p0) = 0.0 THEN CAST(NULL AS DOUBLE)
        |    ELSE (1.959964 + 0.841621) * sqrt(p0 * (1.0 - p0)
        |      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    END * 1e6) AS BIGINT) AS mde_q6,
        |  CASE WHEN p1 = p0 THEN CAST(NULL AS BIGINT)
        |    ELSE CAST(ceil((1.959964 + 0.841621) * (1.959964 + 0.841621)
        |      * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
        |      / ((p1 - p0) * (p1 - p0))) AS BIGINT) END AS n_required
        |FROM p ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.UserStats.abPower(userEvents(s, d),
        minCount = 14L))
    })

  // ---- trailing moving-window aggregates (beyond-reference) ----
  private def movingAgg = Seq(
    // rolling sum/min/max/avg over the last 10 samples per integer
    // series; sums exact int64, the average ONE division of exact
    // integers shipped floor-quantized (bit-identical in both engines)
    Entry("ts_moving_agg",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI)),
         |m AS (SELECT series, ts, pid, val,
         |       sum(val) OVER w AS ms, min(val) OVER w AS mov_min,
         |       max(val) OVER w AS mov_max, count(*) OVER w AS mn
         |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid
         |                          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         |SELECT series, ts, pid, val, CAST(ms AS BIGINT) AS mov_sum,
         |       mov_min, mov_max,
         |       CAST(floor(CAST(ms AS DOUBLE) / CAST(mn AS DOUBLE) * 1000000000.0) AS BIGINT) AS mov_avg_q9
         |FROM m ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.MovingAgg.trailing(I(s, d), k = 10))
    },
    // time-based trailing window: sum/count/avg over the last HOUR of
    // wall time at every point (RANGE frame — adapts to sampling
    // density; ts-peer rows share one frame so tie order can't matter)
    Entry("ts_moving_time",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI)),
         |m AS (SELECT series, ts, pid, val,
         |       sum(val) OVER w AS ms, count(*) OVER w AS mov_n
         |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts
         |                          RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
         |SELECT series, ts, pid, val, CAST(ms AS BIGINT) AS mov_sum,
         |       CAST(mov_n AS BIGINT) AS mov_n,
         |       CAST(floor(CAST(ms AS DOUBLE) / CAST(mov_n AS DOUBLE) * 1000000000.0) AS BIGINT) AS mov_avg_q9
         |FROM m ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.MovingAgg.trailingTime(I(s, d),
        horizon = 3600L))
    },
    // running total per series (InfluxDB cumulative_sum): ONE growing
    // rows-frame window, exact int64
    Entry("ts_cumsum",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI))
         |SELECT series, ts, pid, val,
         |       CAST(sum(val) OVER (PARTITION BY series ORDER BY ts, pid
         |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_sum
         |FROM p ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.MovingAgg.cumulativeSum(I(s, d)))
    },
    // top-3 series per 6h bucket by bucket sum (InfluxDB TOP /
    // Grafana topk): rollup first, rank the rollup, never the points;
    // ties break by series name so the rank is a total order
    Entry("ts_topk_series",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |r AS (SELECT ts // 21600 AS bucket, series, CAST(sum(val) AS BIGINT) AS agg_val
         |      FROM p GROUP BY 1, 2),
         |w AS (SELECT bucket, series, agg_val,
         |       CAST(row_number() OVER (PARTITION BY bucket
         |            ORDER BY agg_val DESC, series ASC) AS BIGINT) AS rank
         |      FROM r)
         |SELECT bucket, rank, series, agg_val FROM w
         |WHERE rank <= 3 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Rank.topSeriesPerBucket(I(s, d),
        bucket = 21600L, k = 3))
    },
    // truncated EWMA smooth (α = 1/4 over the trailing 8 samples):
    // exact integer weights (den−num)^i·den^(k−1−i) built by the SAME
    // Scala helper on both sides, so the two engines multiply by
    // identical constants; one floor division of exact int64
    ewmaEntry)

  private def ewmaEntry: Entry = {
    val cs = graft.engine.MovingAgg.ewmaWeights(num = 1, den = 4, k = 8)
    val lags = cs.indices.map(i =>
      if (i == 0) "val AS x0" else s"lag(val, $i) OVER w AS x$i")
      .mkString(", ")
    val numS = cs.indices.map(i => s"coalesce(x$i * ${cs(i)}, 0)")
      .mkString(" + ")
    val denS = cs.indices
      .map(i => s"(CASE WHEN x$i IS NOT NULL THEN ${cs(i)} ELSE 0 END)")
      .mkString(" + ")
    Entry("ts_ewma",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI)),
         |l AS (SELECT series, ts, pid, val, $lags
         |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid))
         |SELECT series, ts, pid, val,
         |       CAST((($numS) * 1000000) // ($denS) AS BIGINT) AS ewma_q6
         |FROM l ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.MovingAgg.ewma(I(s, d),
        num = 1L, den = 4L, k = 8))
    }
  }

  // ---- robust anomaly (beyond-reference analytics) ----
  private def robust = Seq(
    // median/MAD modified z per same-hour cell: exact lower-median
    // element selections, signed pmod floor division, integer
    // cross-multiplied 0.6745/3.5 cut
    Entry("ts_robust_z",
      s"""WITH p AS (SELECT series, ts, pid, val, (ts // 3600) % 24 AS hour FROM ($PI)),
         |g AS (SELECT series, hour, list_sort(list(val)) AS vs FROM p GROUP BY 1, 2),
         |m AS (SELECT series, hour, vs[CAST((len(vs) - 1) // 2 + 1 AS INT)] AS med FROM g),
         |d AS (SELECT p.series, p.hour, abs(p.val - m.med) AS dv
         |      FROM p JOIN m USING (series, hour)),
         |g2 AS (SELECT series, hour, list_sort(list(dv)) AS ds FROM d GROUP BY 1, 2),
         |s AS (SELECT g2.series, g2.hour, m.med,
         |       ds[CAST((len(ds) - 1) // 2 + 1 AS INT)] AS mad
         |      FROM g2 JOIN m USING (series, hour))
         |SELECT p.series, p.ts, p.pid, p.val, p.hour, s.med, s.mad,
         |       CASE WHEN s.mad = 0 THEN 0 ELSE
         |         ((p.val - s.med) * 1000000
         |           - ((((p.val - s.med) * 1000000) % s.mad) + s.mad) % s.mad) // s.mad
         |       END AS rz_q6,
         |       s.mad > 0 AND 6745 * abs(p.val - s.med) > 35000 * s.mad AS is_anomaly
         |FROM p JOIN s USING (series, hour) ORDER BY ALL""".stripMargin) {
      // maxCell guards the (series, hour) sorted-array cell: sf10
      // measured the worst harness cell at 11,091 points, so 120k
      // (~10x) demonstrates the guarded path with loud-failure
      // headroom long before a buffering task could OOM
      (s, d) => ordered(graft.engine.Anomaly.robustZ(I(s, d),
        maxCell = 120000L))
    },
    // incident intervals: consecutive robust-z anomalies (gaps <= 2h)
    // merged sessionize-style into (start, end, n, peak) rows — the
    // walk runs on the anomaly frame only, never raw points
    Entry("ts_anomaly_intervals",
      s"""WITH p AS (SELECT series, ts, pid, val, (ts // 3600) % 24 AS hour FROM ($PI)),
         |g AS (SELECT series, hour, list_sort(list(val)) AS vs FROM p GROUP BY 1, 2),
         |m AS (SELECT series, hour, vs[CAST((len(vs) - 1) // 2 + 1 AS INT)] AS med FROM g),
         |d AS (SELECT p.series, p.hour, abs(p.val - m.med) AS dv
         |      FROM p JOIN m USING (series, hour)),
         |g2 AS (SELECT series, hour, list_sort(list(dv)) AS ds FROM d GROUP BY 1, 2),
         |s AS (SELECT g2.series, g2.hour, m.med,
         |       ds[CAST((len(ds) - 1) // 2 + 1 AS INT)] AS mad
         |      FROM g2 JOIN m USING (series, hour)),
         |z AS (SELECT p.series, p.ts,
         |       ((p.val - s.med) * 1000000
         |         - ((((p.val - s.med) * 1000000) % s.mad) + s.mad) % s.mad) // s.mad AS rz_q6
         |      FROM p JOIN s USING (series, hour)
         |      WHERE s.mad > 0 AND 6745 * abs(p.val - s.med) > 35000 * s.mad),
         |l AS (SELECT series, ts, rz_q6, lag(ts) OVER (PARTITION BY series ORDER BY ts) AS prev FROM z),
         |n AS (SELECT series, ts, rz_q6,
         |       CASE WHEN prev IS NULL OR ts - prev > 7200 THEN 1 ELSE 0 END AS nw FROM l),
         |i AS (SELECT series, ts, rz_q6, sum(nw) OVER (PARTITION BY series ORDER BY ts
         |        ROWS UNBOUNDED PRECEDING) AS interval_id FROM n)
         |SELECT series, CAST(interval_id AS BIGINT) AS interval_id, min(ts) AS start_ts,
         |       max(ts) AS end_ts, count(*) AS n_points, CAST(max(abs(rz_q6)) AS BIGINT) AS peak_rz_q6
         |FROM i GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      // same (series, hour) cell bound as ts_robust_z (the guard
      // passes through the shared robust-z scorer)
      (s, d) => ordered(graft.engine.Anomaly.anomalyIntervals(I(s, d),
        maxGap = 7200L, maxCell = 120000L))
    })

  // ---- classical decomposition (beyond-reference analytics) ----
  private def decompose = Seq(
    // additive trend/seasonal/residual per point: centered 25-sample
    // moving mean, hour-of-day seasonal means of the detrended frame,
    // exact ×1e6 fixed point with pmod floor division (negative
    // detrended sums floor toward -inf in both engines)
    Entry("ts_decompose",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI)),
         |t0 AS (SELECT series, ts, pid, val,
         |        sum(val * 1000000) OVER w AS ws, count(*) OVER w AS wn
         |       FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid
         |                           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |t AS (SELECT series, ts, pid, val,
         |       (ws - (((ws % wn) + wn) % wn)) // wn AS trend_q6 FROM t0),
         |d AS (SELECT series, ts, pid, val, trend_q6,
         |       val * 1000000 - trend_q6 AS detr, (ts // 3600) % 24 AS hour
         |      FROM t),
         |s0 AS (SELECT series, hour, sum(detr) AS ds, count(*) AS dn
         |       FROM d GROUP BY 1, 2),
         |s AS (SELECT series, hour,
         |       (ds - (((ds % dn) + dn) % dn)) // dn AS seasonal_q6 FROM s0)
         |SELECT d.series, d.ts, d.pid, d.val,
         |       CAST(d.trend_q6 AS BIGINT) AS trend_q6,
         |       CAST(s.seasonal_q6 AS BIGINT) AS seasonal_q6,
         |       CAST(d.detr - s.seasonal_q6 AS BIGINT) AS residual_q6
         |FROM d JOIN s USING (series, hour) ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Decompose.seasonalDecompose(I(s, d),
        halfWindow = 12))
    })

  // ---- Holt forecast (beyond-reference analytics) ----
  private def forecast = Seq(
    // trend-aware one-step-ahead prediction from the trailing 64
    // samples per series (alpha 0.5, beta 0.25): the oracle replays
    // the identical order-fixed IEEE fold via a recursive-CTE walk
    // (list_reduce's struct accumulator is broken in DuckDB 1.0.0 —
    // the ev_sequence_count lesson), output floor-quantized x1e6
    Entry("ts_forecast_holt",
      s"""WITH RECURSIVE p AS (SELECT series, ts, pid, CAST(val AS DOUBLE) AS y FROM ($PI)),
         |r AS (SELECT series, ts, pid, y, row_number() OVER (PARTITION BY series ORDER BY ts DESC, pid DESC) AS rk FROM p),
         |m AS (SELECT series, list(y ORDER BY ts, pid) AS a, count(*) AS n_samples, max(ts) AS last_ts
         |      FROM r WHERE rk <= 64 GROUP BY 1),
         |walk AS (
         |  SELECT series, a, n_samples, last_ts, 1 AS i, a[1] AS l, CAST(0.0 AS DOUBLE) AS b FROM m
         |  UNION ALL
         |  SELECT series, a, n_samples, last_ts, i + 1,
         |    0.5 * a[i+1] + 0.5 * (l + b),
         |    0.25 * ((0.5 * a[i+1] + 0.5 * (l + b)) - l) + 0.75 * b
         |  FROM walk WHERE i < n_samples)
         |SELECT series, CAST(n_samples AS BIGINT) AS n_samples, last_ts,
         |       CAST(floor((l + b) * 1000000.0) AS BIGINT) AS forecast_q6
         |FROM walk WHERE i = n_samples ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Forecast.holt(I(s, d),
        lastN = 64, alpha = 0.5, beta = 0.25))
    },
    // walk-forward backtest of the Holt forecast: the oracle extends
    // the SAME recursive walk with Σ|one-step error|, Σ|y| and the
    // naive (last-value) Σ|error|, scoring each prediction against
    // the next actual BEFORE folding it in — per-series MAE / WAPE /
    // skill-vs-naive, each floor-quantized off the identical
    // order-fixed IEEE sequence
    Entry("ts_forecast_backtest",
      s"""WITH RECURSIVE p AS (SELECT series, ts, pid, CAST(val AS DOUBLE) AS y FROM ($PI)),
         |r AS (SELECT series, ts, pid, y, row_number() OVER (PARTITION BY series ORDER BY ts DESC, pid DESC) AS rk FROM p),
         |m AS (SELECT series, list(y ORDER BY ts, pid) AS a, count(*) AS n_samples
         |      FROM r WHERE rk <= 64 GROUP BY 1 HAVING count(*) >= 2),
         |walk AS (
         |  SELECT series, a, n_samples, 1 AS i, a[1] AS l, CAST(0.0 AS DOUBLE) AS b,
         |         CAST(0.0 AS DOUBLE) AS sae, CAST(0.0 AS DOUBLE) AS say,
         |         CAST(0.0 AS DOUBLE) AS sne, a[1] AS py FROM m
         |  UNION ALL
         |  SELECT series, a, n_samples, i + 1,
         |    0.5 * a[i+1] + 0.5 * (l + b),
         |    0.25 * ((0.5 * a[i+1] + 0.5 * (l + b)) - l) + 0.75 * b,
         |    sae + abs(a[i+1] - (l + b)),
         |    say + abs(a[i+1]),
         |    sne + abs(a[i+1] - py),
         |    a[i+1]
         |  FROM walk WHERE i < n_samples)
         |SELECT series, CAST(n_samples - 1 AS BIGINT) AS n_evals,
         |       CAST(floor(sae / (n_samples - 1) * 1000000.0) AS BIGINT) AS mae_q6,
         |       CASE WHEN say > 0 THEN CAST(floor(sae / say * 1000000.0) AS BIGINT) END AS wape_q6,
         |       CASE WHEN sne > 0 THEN CAST(floor((1.0 - sae / sne) * 1000000.0) AS BIGINT) END AS skill_q6
         |FROM walk WHERE i = n_samples ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Forecast.holtBacktest(I(s, d),
        lastN = 64, alpha = 0.5, beta = 0.25))
    },
    // forecast-residual anomaly: the alerting layer over the same
    // Holt fold — flag points whose one-step residual exceeds 4× the
    // mean abs residual of the earlier steps (warmup 8). The oracle
    // walk carries the residual/scale per step and selects the
    // flagged rows; the flag comparison mirrors the fold
    // token-for-token (multiply before divide) on identical doubles.
    // Non-vacuous: 47 flagged points across 27 series at sf0.01.
    Entry("ts_forecast_residual",
      s"""WITH RECURSIVE p AS (SELECT series, ts, pid, CAST(val AS DOUBLE) AS y FROM ($PI)),
         |r AS (SELECT series, ts, pid, y, row_number() OVER (PARTITION BY series ORDER BY ts DESC, pid DESC) AS rk FROM p),
         |m AS (SELECT series, list(struct_pack(ts := ts, pid := pid, y := y) ORDER BY ts, pid) AS a, count(*) AS n
         |      FROM r WHERE rk <= 64 GROUP BY 1 HAVING count(*) >= 2),
         |walk AS (
         |  SELECT series, a, n, 1 AS i, a[1].y AS l, CAST(0.0 AS DOUBLE) AS b,
         |         CAST(0.0 AS DOUBLE) AS sae,
         |         CAST(NULL AS BIGINT) AS ets, CAST(NULL AS DOUBLE) AS fc,
         |         CAST(NULL AS DOUBLE) AS resid, false AS ok
         |  FROM m
         |  UNION ALL
         |  SELECT series, a, n, i + 1,
         |    0.5 * a[i+1].y + 0.5 * (l + b),
         |    0.25 * ((0.5 * a[i+1].y + 0.5 * (l + b)) - l) + 0.75 * b,
         |    sae + abs(a[i+1].y - (l + b)),
         |    a[i+1].ts,
         |    l + b,
         |    a[i+1].y - (l + b),
         |    (i - 1 >= 8) AND abs(a[i+1].y - (l + b)) > 4.0 * sae / CAST(i - 1 AS DOUBLE)
         |  FROM walk WHERE i < n)
         |SELECT series, ets AS ts,
         |       CAST(floor(fc * 1000000.0) AS BIGINT) AS forecast_q6,
         |       CAST(floor(resid * 1000000.0) AS BIGINT) AS resid_q6
         |FROM walk WHERE ok ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Forecast.holtResidualAnomaly(I(s, d),
        lastN = 64, alpha = 0.5, beta = 0.25, k = 4.0, minWarm = 8))
    },
    // Holt-Winters additive-seasonal (InfluxDB HOLT_WINTERS's other
    // half) over the trailing 96 hourly buckets, season m=24. The
    // oracle walks the SAME two-phase fold (24-bucket init mean +
    // seasonal deltas, then the l/b/s recurrence) in one recursive
    // CTE carrying the 24-slot seasonal LIST; the level expression is
    // spelled out identically everywhere it feeds in both engines
    Entry("ts_forecast_hw",
      s"""WITH RECURSIVE p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(CAST(sum(val) AS BIGINT) AS DOUBLE) AS y FROM p GROUP BY 1, 2),
         |r AS (SELECT series, bucket, y, row_number() OVER (PARTITION BY series ORDER BY bucket DESC) AS rk FROM h),
         |m AS (SELECT series, list(struct_pack(bucket := bucket, y := y) ORDER BY bucket) AS a,
         |             count(*) AS n, min(bucket) AS fb, max(bucket) AS lastb
         |      FROM r WHERE rk <= 96 GROUP BY 1
         |      HAVING count(*) >= 48 AND max(bucket) - min(bucket) + 1 = count(*)),
         |walk AS (
         |  SELECT series, a, n, fb, lastb, 1 AS i, a[1].y AS suml,
         |         CAST(NULL AS DOUBLE) AS l, CAST(NULL AS DOUBLE) AS b,
         |         CAST(NULL AS DOUBLE[]) AS s
         |  FROM m
         |  UNION ALL
         |  SELECT series, a, n, fb, lastb, i + 1,
         |    CASE WHEN i + 1 <= 24 THEN suml + a[i + 1].y ELSE suml END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN (suml + a[i + 1].y) / 24.0
         |         ELSE 0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b) END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN CAST(0.0 AS DOUBLE)
         |         ELSE 0.25 * ((0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b)) - l) + 0.75 * b END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN list_transform(range(24), k -> a[CAST((24 + k - fb % 24) % 24 AS INT) + 1].y - (suml + a[i + 1].y) / 24.0)
         |         ELSE list_transform(range(24), j -> CASE WHEN j = CAST(a[i + 1].bucket % 24 AS INT)
         |              THEN 0.25 * (a[i + 1].y - (0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b))) + 0.75 * s[j + 1]
         |              ELSE s[j + 1] END) END
         |  FROM walk WHERE i < n)
         |SELECT series, CAST(n AS BIGINT) AS n_buckets, lastb AS last_bucket,
         |       CAST(floor((l + b + s[CAST((lastb + 1) % 24 AS INT) + 1]) * 1000000.0) AS BIGINT) AS forecast_q6
         |FROM walk WHERE i = n ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Forecast.holtWinters(I(s, d),
        bucket = 3600L, lastN = 96, m = 24,
        alpha = 0.5, beta = 0.25, gamma = 0.25))
    },
    // the same fold over the generated fixture (fxPoints): 144
    // contiguous hourly buckets pass the 2-season contiguity guard,
    // so the recursive-CTE walk is verified on 2 REAL rows at every
    // sf (the harness corpus alone leaves ts_forecast_hw vacuous)
    Entry("ts_forecast_hw_fixture",
      s"""WITH RECURSIVE $FXSQL,
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(CAST(sum(val) AS BIGINT) AS DOUBLE) AS y FROM p GROUP BY 1, 2),
         |r AS (SELECT series, bucket, y, row_number() OVER (PARTITION BY series ORDER BY bucket DESC) AS rk FROM h),
         |m AS (SELECT series, list(struct_pack(bucket := bucket, y := y) ORDER BY bucket) AS a,
         |             count(*) AS n, min(bucket) AS fb, max(bucket) AS lastb
         |      FROM r WHERE rk <= 96 GROUP BY 1
         |      HAVING count(*) >= 48 AND max(bucket) - min(bucket) + 1 = count(*)),
         |walk AS (
         |  SELECT series, a, n, fb, lastb, 1 AS i, a[1].y AS suml,
         |         CAST(NULL AS DOUBLE) AS l, CAST(NULL AS DOUBLE) AS b,
         |         CAST(NULL AS DOUBLE[]) AS s
         |  FROM m
         |  UNION ALL
         |  SELECT series, a, n, fb, lastb, i + 1,
         |    CASE WHEN i + 1 <= 24 THEN suml + a[i + 1].y ELSE suml END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN (suml + a[i + 1].y) / 24.0
         |         ELSE 0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b) END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN CAST(0.0 AS DOUBLE)
         |         ELSE 0.25 * ((0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b)) - l) + 0.75 * b END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN list_transform(range(24), k -> a[CAST((24 + k - fb % 24) % 24 AS INT) + 1].y - (suml + a[i + 1].y) / 24.0)
         |         ELSE list_transform(range(24), j -> CASE WHEN j = CAST(a[i + 1].bucket % 24 AS INT)
         |              THEN 0.25 * (a[i + 1].y - (0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b))) + 0.75 * s[j + 1]
         |              ELSE s[j + 1] END) END
         |  FROM walk WHERE i < n)
         |SELECT series, CAST(n AS BIGINT) AS n_buckets, lastb AS last_bucket,
         |       CAST(floor((l + b + s[CAST((lastb + 1) % 24 AS INT) + 1]) * 1000000.0) AS BIGINT) AS forecast_q6
         |FROM walk WHERE i = n ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(graft.engine.Forecast.holtWinters(fxPoints(s),
        bucket = 3600L, lastN = 96, m = 24,
        alpha = 0.5, beta = 0.25, gamma = 0.25))
    },
    // walk-forward backtest of the seasonal forecast over the same
    // fixture (the level-shifted fx.a + pure-seasonal fx.b make every
    // skill column non-vacuous): the oracle extends the HW walk with
    // the parallel non-seasonal Holt state and the four error sums,
    // scoring each one-step prediction BEFORE folding it in —
    // prototype-validated against an independent python replay of the
    // Spark fold before registration
    Entry("ts_forecast_hw_backtest",
      s"""WITH RECURSIVE $FXSQL,
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(CAST(sum(val) AS BIGINT) AS DOUBLE) AS y FROM p GROUP BY 1, 2),
         |r AS (SELECT series, bucket, y, row_number() OVER (PARTITION BY series ORDER BY bucket DESC) AS rk FROM h),
         |m AS (SELECT series, list(struct_pack(bucket := bucket, y := y) ORDER BY bucket) AS a,
         |             count(*) AS n, min(bucket) AS fb, max(bucket) AS lastb
         |      FROM r WHERE rk <= 96 GROUP BY 1
         |      HAVING count(*) >= 48 AND max(bucket) - min(bucket) + 1 = count(*)),
         |walk AS (
         |  SELECT series, a, n, fb, lastb, 1 AS i, a[1].y AS suml,
         |         CAST(NULL AS DOUBLE) AS l, CAST(NULL AS DOUBLE) AS b,
         |         CAST(NULL AS DOUBLE[]) AS s,
         |         a[1].y AS hl, CAST(0.0 AS DOUBLE) AS hb,
         |         CAST(0.0 AS DOUBLE) AS sae, CAST(0.0 AS DOUBLE) AS say,
         |         CAST(0.0 AS DOUBLE) AS sne, CAST(0.0 AS DOUBLE) AS she,
         |         a[1].y AS py
         |  FROM m
         |  UNION ALL
         |  SELECT series, a, n, fb, lastb, i + 1,
         |    CASE WHEN i + 1 <= 24 THEN suml + a[i + 1].y ELSE suml END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN (suml + a[i + 1].y) / 24.0
         |         ELSE 0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b) END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN CAST(0.0 AS DOUBLE)
         |         ELSE 0.25 * ((0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b)) - l) + 0.75 * b END,
         |    CASE WHEN i + 1 < 24 THEN NULL
         |         WHEN i + 1 = 24 THEN list_transform(range(24), k -> a[CAST((24 + k - fb % 24) % 24 AS INT) + 1].y - (suml + a[i + 1].y) / 24.0)
         |         ELSE list_transform(range(24), j -> CASE WHEN j = CAST(a[i + 1].bucket % 24 AS INT)
         |              THEN 0.25 * (a[i + 1].y - (0.5 * (a[i + 1].y - s[CAST(a[i + 1].bucket % 24 AS INT) + 1]) + 0.5 * (l + b))) + 0.75 * s[j + 1]
         |              ELSE s[j + 1] END) END,
         |    0.5 * a[i + 1].y + 0.5 * (hl + hb),
         |    0.25 * ((0.5 * a[i + 1].y + 0.5 * (hl + hb)) - hl) + 0.75 * hb,
         |    CASE WHEN i + 1 > 24 THEN sae + abs(a[i + 1].y - (l + b + s[CAST(a[i + 1].bucket % 24 AS INT) + 1])) ELSE sae END,
         |    CASE WHEN i + 1 > 24 THEN say + abs(a[i + 1].y) ELSE say END,
         |    CASE WHEN i + 1 > 24 THEN sne + abs(a[i + 1].y - py) ELSE sne END,
         |    CASE WHEN i + 1 > 24 THEN she + abs(a[i + 1].y - (hl + hb)) ELSE she END,
         |    a[i + 1].y
         |  FROM walk WHERE i < n)
         |SELECT series, CAST(n - 24 AS BIGINT) AS n_evals,
         |       CAST(floor(sae / (n - 24) * 1000000.0) AS BIGINT) AS mae_q6,
         |       CASE WHEN say > 0 THEN CAST(floor(sae / say * 1000000.0) AS BIGINT) END AS wape_q6,
         |       CASE WHEN sne > 0 THEN CAST(floor((1.0 - sae / sne) * 1000000.0) AS BIGINT) END AS skill_naive_q6,
         |       CASE WHEN she > 0 THEN CAST(floor((1.0 - sae / she) * 1000000.0) AS BIGINT) END AS skill_holt_q6
         |FROM walk WHERE i = n ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(graft.engine.Forecast.hwBacktest(fxPoints(s),
        bucket = 3600L, lastN = 96, m = 24,
        alpha = 0.5, beta = 0.25, gamma = 0.25))
    })

  // ---- anomaly detection (beyond-reference alerting layer) ----
  private def anomaly = Seq(
    // seasonal z-score: each point against its series' same-hour-of-day
    // baseline; exact integer moments per (series, hour) make every z
    // bit-identical (the embedOutliers fixed-point pattern)
    Entry("ts_seasonal_anomaly",
      s"""WITH p AS (SELECT series, ts, pid, val, (ts // 3600) % 24 AS hour FROM ($PI)),
         |st AS (SELECT series, hour, count(*) AS n, sum(val) AS s1, sum(val * val) AS s2
         |       FROM p GROUP BY 1, 2),
         |j AS (SELECT p.series, p.ts, p.pid, p.val, p.hour,
         |       s1::DOUBLE / n::DOUBLE AS mu,
         |       sqrt(greatest(s2::DOUBLE / n::DOUBLE - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE), 0.0)) AS sd
         |      FROM p JOIN st USING (series, hour))
         |SELECT series, ts, pid, val, hour,
         |       CAST(floor((CASE WHEN sd = 0 THEN 0.0 ELSE (val::DOUBLE - mu) / sd END) * 1e6) AS BIGINT) AS zq,
         |       CASE WHEN sd = 0 THEN FALSE ELSE abs((val::DOUBLE - mu) / sd) > 3.0 END AS is_anomaly
         |FROM j ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Anomaly.seasonalZ(I(s, d), zCut = 3.0))
    },
    // the trained baseline artifact itself (what streamingSeasonalZ
    // scores against): exact integer moments per (series, hour) —
    // auditing the artifact a deployment persists and retrains
    Entry("ts_seasonal_baselines",
      s"""WITH p AS (SELECT series, ts, val, (ts // 3600) % 24 AS hour FROM ($PI))
         |SELECT series, hour, count(*) AS n,
         |       CAST(sum(val) AS BIGINT) AS s1,
         |       CAST(sum(val * val) AS BIGINT) AS s2
         |FROM p GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Anomaly.seasonalBaselines(I(s, d)))
    },
    // alert-edge detection: only the rows where the series CROSSES the
    // threshold (up or down) — pure integer comparisons, exact oracle
    Entry("ts_threshold_cross",
      s"""WITH p AS (SELECT series, ts, pid, val FROM ($PI)),
         |l AS (SELECT series, ts, pid, val,
         |       lag(val) OVER (PARTITION BY series ORDER BY ts, pid) AS prev
         |      FROM p)
         |SELECT series, ts, pid, val, prev,
         |       CASE WHEN val >= 5000 THEN 'up' ELSE 'down' END AS direction
         |FROM l
         |WHERE prev IS NOT NULL
         |  AND ((prev < 5000 AND val >= 5000) OR (prev >= 5000 AND val < 5000))
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Anomaly.thresholdCross(I(s, d),
        threshold = 5000L))
    },
    // multi-window multi-burn-rate SLO alert (the SRE workbook
    // policy): bad fraction over BOTH the 1h and 6h trailing RANGE
    // windows must exceed 14.4× the 1% error budget — both rate
    // tests cross-multiplied to pure int64
    Entry("ts_slo_burn",
      s"""WITH p AS (SELECT series, ts, CASE WHEN val > 10000 THEN 1 ELSE 0 END AS bad FROM ($PI)),
         |w AS (SELECT series, ts,
         |       CAST(sum(bad) OVER ws AS BIGINT) AS short_bad, count(*) OVER ws AS short_n,
         |       CAST(sum(bad) OVER wl AS BIGINT) AS long_bad, count(*) OVER wl AS long_n
         |      FROM p WINDOW
         |        ws AS (PARTITION BY series ORDER BY ts RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW),
         |        wl AS (PARTITION BY series ORDER BY ts RANGE BETWEEN 21599 PRECEDING AND CURRENT ROW))
         |SELECT series, ts, short_bad, short_n, long_bad, long_n
         |FROM w WHERE short_bad * 10 * 100 >= 144 * 1 * short_n
         |        AND long_bad * 10 * 100 >= 144 * 1 * long_n
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Anomaly.sloBurn(I(s, d),
        threshold = 10000L))
    },
    // two-sided tabular CUSUM drift alarms over the hourly rollup:
    // baseline (mu, sigma) from the first 24 observed buckets, then
    // S+/S- accumulate against k=0.5 sigma and alarm past h=5 sigma
    // with reset. The oracle walks the identical order-fixed fold in
    // one recursive CTE — the up/down candidate sums are spelled out
    // identically in every branch of both engines
    Entry("ts_cusum",
      s"""WITH RECURSIVE p AS (SELECT series, ts, val FROM ($PI)),
         |h AS (SELECT series, ts // 3600 AS bucket, CAST(CAST(sum(val) AS BIGINT) AS DOUBLE) AS y FROM p GROUP BY 1, 2),
         |r AS (SELECT series, bucket, y, row_number() OVER (PARTITION BY series ORDER BY bucket DESC) AS rk FROM h),
         |m AS (SELECT series, list(struct_pack(bucket := bucket, y := y) ORDER BY bucket) AS a, count(*) AS n
         |      FROM r WHERE rk <= 168 GROUP BY 1 HAVING count(*) >= 48),
         |walk AS (
         |  SELECT series, a, n, 1 AS i, a[1].y AS sy, a[1].y * a[1].y AS syy,
         |         CAST(NULL AS DOUBLE) AS mu, CAST(NULL AS DOUBLE) AS sg,
         |         CAST(0.0 AS DOUBLE) AS sp, CAST(0.0 AS DOUBLE) AS sn,
         |         CAST(0 AS BIGINT) AS side, CAST(NULL AS DOUBLE) AS sa FROM m
         |  UNION ALL
         |  SELECT series, a, n, i + 1,
         |    CASE WHEN i + 1 <= 24 THEN sy + a[i+1].y ELSE sy END,
         |    CASE WHEN i + 1 <= 24 THEN syy + a[i+1].y * a[i+1].y ELSE syy END,
         |    CASE WHEN i + 1 = 24 THEN (sy + a[i+1].y) / 24.0 ELSE mu END,
         |    CASE WHEN i + 1 = 24 THEN sqrt((syy + a[i+1].y * a[i+1].y) / 24.0 - ((sy + a[i+1].y) / 24.0) * ((sy + a[i+1].y) / 24.0)) ELSE sg END,
         |    CASE WHEN i + 1 <= 24 THEN 0.0
         |         WHEN greatest(0.0, sp + (a[i+1].y - mu - 0.5 * sg)) > 5.0 * sg THEN 0.0
         |         ELSE greatest(0.0, sp + (a[i+1].y - mu - 0.5 * sg)) END,
         |    CASE WHEN i + 1 <= 24 THEN 0.0
         |         WHEN greatest(0.0, sn + (mu - a[i+1].y - 0.5 * sg)) > 5.0 * sg THEN 0.0
         |         ELSE greatest(0.0, sn + (mu - a[i+1].y - 0.5 * sg)) END,
         |    CASE WHEN i + 1 > 24 AND greatest(0.0, sp + (a[i+1].y - mu - 0.5 * sg)) > 5.0 * sg THEN 1
         |         WHEN i + 1 > 24 AND greatest(0.0, sn + (mu - a[i+1].y - 0.5 * sg)) > 5.0 * sg THEN -1
         |         ELSE 0 END,
         |    CASE WHEN i + 1 > 24 AND greatest(0.0, sp + (a[i+1].y - mu - 0.5 * sg)) > 5.0 * sg THEN greatest(0.0, sp + (a[i+1].y - mu - 0.5 * sg))
         |         WHEN i + 1 > 24 AND greatest(0.0, sn + (mu - a[i+1].y - 0.5 * sg)) > 5.0 * sg THEN greatest(0.0, sn + (mu - a[i+1].y - 0.5 * sg))
         |         ELSE CAST(NULL AS DOUBLE) END
         |  FROM walk WHERE i < n)
         |SELECT series, a[i].bucket AS bucket, CAST(side AS BIGINT) AS side,
         |       CAST(floor(sa / sg * 1000000.0) AS BIGINT) AS s_sigma_q6
         |FROM walk WHERE side != 0 AND sg > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Anomaly.cusum(I(s, d)))
    })

  // ---- grid interpolation / gap fill (beyond-reference) ----
  private def interpolate = Seq(
    // float family resampled to a 30-min grid within each series'
    // span; linear between surrounding samples, exact at samples
    Entry("ts_interpolate",
      s"""WITH s0 AS (SELECT series, ts, val, pid FROM ($PF)),
         |s1 AS (SELECT series, ts, arg_max(val, pid) AS val FROM s0 GROUP BY 1, 2),
         |b AS (SELECT series, min(ts) AS mn, max(ts) AS mx FROM s1 GROUP BY 1),
         |g AS (SELECT series, unnest(list_transform(range((mn + 1799) // 1800, mx // 1800 + 1), i -> i * 1800)) AS ts FROM b),
         |p AS (SELECT g.series, g.ts, s.ts AS pts, s.val AS pval
         |      FROM g ASOF LEFT JOIN s1 s ON s.series = g.series AND g.ts >= s.ts),
         |n AS (SELECT g.series, g.ts, s.ts AS nts, s.val AS nval
         |      FROM g ASOF LEFT JOIN s1 s ON s.series = g.series AND g.ts <= s.ts)
         |SELECT series, ts, CAST(floor((CASE WHEN nts = pts THEN pval
         |       ELSE pval + (nval - pval) * (ts - pts) / (nts - pts) END) * 1000000000.0) AS BIGINT) AS val_q9
         |FROM p JOIN n USING (series, ts)
         |WHERE pts IS NOT NULL AND nts IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Interpolate.toGrid(F(s, d), step = 1800L))
    },
    // staircase fill: the same grid with the last observation carried
    // forward — backward neighbour only, so one sort instead of two
    Entry("ts_interpolate_locf",
      s"""WITH s0 AS (SELECT series, ts, val, pid FROM ($PF)),
         |s1 AS (SELECT series, ts, arg_max(val, pid) AS val FROM s0 GROUP BY 1, 2),
         |b AS (SELECT series, min(ts) AS mn, max(ts) AS mx FROM s1 GROUP BY 1),
         |g AS (SELECT series, unnest(list_transform(range((mn + 1799) // 1800, mx // 1800 + 1), i -> i * 1800)) AS ts FROM b),
         |p AS (SELECT g.series, g.ts, s.val AS pval
         |      FROM g ASOF LEFT JOIN s1 s ON s.series = g.series AND g.ts >= s.ts)
         |SELECT series, ts, CAST(floor(pval * 1000000000.0) AS BIGINT) AS val_q9
         |FROM p WHERE pval IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Interpolate.toGrid(F(s, d),
        step = 1800L, fill = "locf"))
    },
    // staleness-bounded LOCF (TimescaleDB locf(max_interval)): a grid
    // point more than 1h past its source sample is DROPPED, not
    // filled — the ASOF match's own age is the predicate
    Entry("ts_interpolate_maxgap",
      s"""WITH s0 AS (SELECT series, ts, val, pid FROM ($PF)),
         |s1 AS (SELECT series, ts, arg_max(val, pid) AS val FROM s0 GROUP BY 1, 2),
         |b AS (SELECT series, min(ts) AS mn, max(ts) AS mx FROM s1 GROUP BY 1),
         |g AS (SELECT series, unnest(list_transform(range((mn + 1799) // 1800, mx // 1800 + 1), i -> i * 1800)) AS ts FROM b),
         |p AS (SELECT g.series, g.ts, s.ts AS sts, s.val AS pval
         |      FROM g ASOF LEFT JOIN s1 s ON s.series = g.series AND g.ts >= s.ts)
         |SELECT series, ts, CAST(floor(pval * 1000000000.0) AS BIGINT) AS val_q9
         |FROM p WHERE pval IS NOT NULL AND ts - sts <= 3600
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Interpolate.toGrid(F(s, d),
        step = 1800L, fill = "locf", maxGap = 3600L))
    })

  // ---- counter-reset-aware rate (beyond-reference) ----
  private def counterRate = Seq(
    // integer series as monotone-ish counters: drops are resets, the
    // increase is the new value; exact int sums per 1h bucket
    Entry("ts_counter_rate",
      s"""WITH p AS (SELECT series, ts, val, pid FROM ($PI)),
         |i AS (SELECT series, ts,
         |       CASE WHEN lag(val) OVER w IS NULL THEN NULL
         |            WHEN val >= lag(val) OVER w THEN val - lag(val) OVER w
         |            ELSE val END AS inc
         |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid))
         |SELECT series, ts // 3600 AS bucket,
         |       CAST(coalesce(sum(inc), 0) AS BIGINT) AS increase,
         |       round(coalesce(sum(inc), 0) / 3600.0, 9) AS rate
         |FROM i GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.CounterRate
        .bucketedRate(I(s, d), bucket = 3600L))
    },
    // changes()/resets() stability counters per hour: a straddling
    // pair counts in the LATER sample's bucket (same attribution as
    // the rate), the first sample contributes nothing
    Entry("ts_counter_changes",
      s"""WITH p AS (SELECT series, ts, val, pid FROM ($PI)),
         |i AS (SELECT series, ts, val, lag(val) OVER w AS prev
         |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid))
         |SELECT series, ts // 3600 AS bucket,
         |       CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND val <> prev THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_changes,
         |       CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND val < prev THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_resets
         |FROM i GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.CounterRate
        .bucketedChanges(I(s, d), bucket = 3600L))
    })

  // ---- LTOB visualization downsampling (beyond-reference) ----
  /** CTE chain of the LTOB replay (float family → neighbor areas →
    * ranked per-bucket keeps `k`) — shared by the downsample oracle
    * and the fidelity-report oracle so the selection text can never
    * drift between the operator and its audit. */
  private def ltobBodySql: String =
    s"""p AS (SELECT series, ts, val, pid FROM ($PF)),
       |n AS (SELECT series, ts, val, pid,
       |       coalesce(round(abs(val - (lag(val) OVER w + lead(val) OVER w) / 2.0), 9), -1.0) AS area
       |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid)),
       |k AS (SELECT series, ts // 3600 AS bucket, ts, val,
       |       row_number() OVER (PARTITION BY series, ts // 3600 ORDER BY area DESC, ts, pid) AS rk
       |      FROM n)""".stripMargin

  private def downsample = Seq(
    // one kept point per (series, 1h bucket): the largest-effective-
    // area point against its immediate neighbors, ties -> earliest
    Entry("ts_downsample_ltob",
      s"""WITH $ltobBodySql
         |SELECT series, bucket, ts, val FROM k WHERE rk = 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Downsample.ltob(F(s, d), bucket = 3600L))
    },
    // the downsample trust gate: max/mean polyline error of the LTOB
    // keeps against the raw points they replace — per-point errors
    // floor-quantized x1e6 before the max/mean, brackets via LOCF
    // windows over the tagged raw+kept union (kept sorts first at an
    // equal ts, so a kept raw twin brackets to itself)
    Entry("ts_downsample_fidelity",
      s"""WITH $ltobBodySql,
         |kk AS (SELECT series, ts, CAST(floor(val * 1e6) AS BIGINT) AS vq
         |       FROM k WHERE rk = 1),
         |u AS (SELECT series, ts, CAST(floor(val * 1e6) AS BIGINT) AS vq,
         |             0 AS flag FROM p
         |      UNION ALL SELECT series, ts, vq, 1 FROM kk),
         |b AS (SELECT series, ts, vq, flag,
         |       last_value(CASE WHEN flag = 1 THEN ts END IGNORE NULLS) OVER wp AS pts,
         |       last_value(CASE WHEN flag = 1 THEN vq END IGNORE NULLS) OVER wp AS pq,
         |       last_value(CASE WHEN flag = 1 THEN ts END IGNORE NULLS) OVER wn AS nts,
         |       last_value(CASE WHEN flag = 1 THEN vq END IGNORE NULLS) OVER wn AS nq
         |      FROM u
         |      WINDOW wp AS (PARTITION BY series ORDER BY ts, flag DESC
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |             wn AS (PARTITION BY series ORDER BY ts DESC, flag DESC
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |e AS (SELECT series,
         |       CASE WHEN nts = pts THEN abs(vq - pq)
         |            ELSE CAST(abs((vq - pq) * (nts - pts) - (nq - pq) * (ts - pts))
         |                 // (nts - pts) AS BIGINT) END AS err_q6
         |      FROM b WHERE flag = 0),
         |kc AS (SELECT series, CAST(count(*) AS BIGINT) AS n_kept FROM kk GROUP BY 1),
         |a AS (SELECT series, CAST(count(*) AS BIGINT) AS n_raw,
         |       CAST(sum(CASE WHEN err_q6 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_interior,
         |       max(err_q6) AS max_err_q6, sum(err_q6) AS sum_err_q6
         |      FROM e GROUP BY 1)
         |SELECT a.series, n_raw, n_kept, n_interior, max_err_q6,
         |  CAST(CASE WHEN n_interior = 0 THEN NULL
         |       ELSE sum_err_q6 // n_interior END AS BIGINT) AS mean_err_q6
         |FROM a JOIN kc ON kc.series = a.series ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Downsample.fidelityReport(F(s, d),
        bucket = 3600L))
    },
    // M4 (first/last/min/max per pixel bucket): one hash agg, no
    // window; tie-breaks replayed via DuckDB's ordered aggregates
    Entry("ts_downsample_m4",
      s"""WITH p AS (SELECT series, ts, val, pid FROM ($PF))
         |SELECT series, ts // 3600 AS bucket, count(*) AS n,
         |       first(ts ORDER BY ts, pid) AS ts_first, first(val ORDER BY ts, pid) AS v_first,
         |       last(ts ORDER BY ts, pid) AS ts_last, last(val ORDER BY ts, pid) AS v_last,
         |       first(ts ORDER BY val, ts, pid) AS ts_vmin, min(val) AS v_min,
         |       first(ts ORDER BY val DESC, ts, pid) AS ts_vmax, max(val) AS v_max
         |FROM p GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Downsample.m4(F(s, d), bucket = 3600L))
    })

  // ---- time-weighted average (beyond-reference LOCF integral) ----
  private def timeWeighted = Seq(
    // per (series, 1h): Σ val·dt over the LOCF step function, clipped
    // at bucket edges; exact int64 end to end, one floor division
    Entry("ts_twa",
      s"""WITH p AS (SELECT series, ts, val, pid FROM ($PI)),
         |d AS (SELECT series, ts, arg_max(val, pid) AS val FROM p GROUP BY 1, 2),
         |s AS (SELECT series, ts, val, lead(ts) OVER (PARTITION BY series ORDER BY ts) AS nxt FROM d),
         |x AS (SELECT series, val, ts, nxt, unnest(range(ts // 3600, (nxt - 1) // 3600 + 1)) AS bucket
         |      FROM s WHERE nxt IS NOT NULL),
         |o AS (SELECT series, bucket,
         |       least(nxt, (bucket + 1) * 3600) - greatest(ts, bucket * 3600) AS dt, val
         |      FROM x)
         |SELECT series, bucket, CAST(sum(dt) AS BIGINT) AS dur,
         |       CAST(sum(val * dt) AS BIGINT) AS wsum,
         |       CAST(sum(val * dt) * 1000000 // sum(dt) AS BIGINT) AS twa_q6
         |FROM o GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.TimeWeighted.bucketTwa(I(s, d),
        bucket = 3600L))
    })

  // ---- sessionization (beyond-reference gaps-and-islands) ----
  private def sessionize = Seq(
    // sessions break on gaps > 900 s within each float series
    Entry("ts_sessionize",
      s"""WITH p AS (SELECT series, ts, pid FROM ($PF)),
         |b AS (SELECT series, ts, pid,
         |       CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 900 THEN 1 ELSE 0 END AS brk
         |      FROM p WINDOW w AS (PARTITION BY series ORDER BY ts, pid)),
         |s AS (SELECT series, ts,
         |       sum(brk) OVER (PARTITION BY series ORDER BY ts, pid ROWS UNBOUNDED PRECEDING) AS session
         |      FROM b)
         |SELECT series, CAST(session AS BIGINT) AS session,
         |       min(ts) AS session_start, max(ts) AS session_end,
         |       count(*) AS n_points, max(ts) - min(ts) AS duration
         |FROM s GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Sessionize.sessions(F(s, d), gap = 900L))
    },
    // the gap knob measured: per candidate gap, sessions / silences /
    // silent seconds / availability — ONE lag pass, every setting a
    // conditional aggregate riding the window's series exchange
    Entry("ts_sessionize_curve", {
      val gs = Seq(300L, 900L, 3600L, 21600L)
      val psCols = gs.zipWithIndex.map { case (g, i) =>
        s"CAST(count(*) FILTER (WHERE d > $g) AS BIGINT) AS nb_$i, " +
          s"CAST(coalesce(sum(d) FILTER (WHERE d > $g), 0) AS BIGINT) AS sl_$i"
      }.mkString(", ")
      val totCols = gs.indices.map { i =>
        s"CAST(coalesce(sum(nb_$i), 0) AS BIGINT) AS nbt_$i, " +
          s"CAST(coalesce(sum(sl_$i), 0) AS BIGINT) AS slt_$i"
      }.mkString(", ")
      val union = gs.zipWithIndex.map { case (g, i) =>
        s"""SELECT CAST($g AS BIGINT) AS gap, ns AS n_series,
           |  ns + nbt_$i AS n_sessions, nbt_$i AS n_gaps,
           |  slt_$i AS silent_seconds, span AS span_seconds,
           |  CASE WHEN span = 0 THEN CAST(1000000 AS BIGINT)
           |       ELSE (span - slt_$i) * 1000000 // span END AS avail_q6
           |FROM tot""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH p AS (SELECT series, ts, pid FROM ($PF)),
         |l AS (SELECT series, ts, ts - lag(ts) OVER (PARTITION BY series ORDER BY ts, pid) AS d FROM p),
         |ps AS (SELECT series, max(ts) - min(ts) AS span, $psCols FROM l GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS ns,
         |        CAST(coalesce(sum(span), 0) AS BIGINT) AS span, $totCols FROM ps)
         |SELECT * FROM ($union) u ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(graft.engine.Sessionize.gapCurve(F(s, d)))
    },
    // the inverse report: every silence > 900 s per series (the
    // "no data" alert edge); gap-sized output, one window pass
    Entry("ts_gaps",
      s"""WITH p AS (SELECT series, ts, pid FROM ($PF)),
         |l AS (SELECT series, ts, lead(ts) OVER (PARTITION BY series ORDER BY ts, pid) AS nxt FROM p)
         |SELECT series, ts AS gap_start, nxt AS gap_end, nxt - ts AS gap
         |FROM l WHERE nxt - ts > 900 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.engine.Sessionize.gaps(F(s, d), minGap = 900L))
    })

  // sketch VALUES are approximate by design — no SQL oracle can
  // hash-match them — so the oracled entry ships the sketch's
  // error-bound VERDICTS instead: per series, booleans asserting the
  // HLL++ count is within 3×rsd of the exact distinct count and each
  // sketched percentile lands inside its rank-error window of the
  // exact sorted values (both checks computed in Spark against the
  // exact frame; the oracle recomputes the exact keys and asserts the
  // verdicts are all TRUE). Deterministic: HLL++ is order-independent,
  // and at the sf0.01 check scale approx_percentile's summary retains
  // every sample (n < accuracy), so the booleans cannot flap. A sketch
  // regression past its bound now FAILS the differential instead of
  // hiding behind `no_oracle`. SketchesSpec still pins the numeric
  // bounds directly.
  private def sketches = Seq(
    Entry("ts_sketch_stats",
      s"""SELECT series, count(*) AS n, count(DISTINCT ts) AS n_ts,
         |       TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
         |FROM ($PF) GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val pts = F(s, d)
        val approx = graft.engine.Sketches.approxSeriesStats(pts)
        val exact = pts.groupBy(col("series")).agg(
          sort_array(collect_list(col("val"))).as("vs"),
          count(lit(1)).as("n"),
          countDistinct(col("ts")).as("n_ts"))
        // rank window for accuracy=10000 (relative rank error 1e-4),
        // ±1 rank slack for the summary's own rank definition
        def win(p: Double, side: String): String = {
          val eps = 1.0e-4
          if (side == "lo")
            s"vs[CAST(greatest(0.0, floor(($p - $eps) * (n - 1)) - 1) AS INT)]"
          else
            s"vs[CAST(least(CAST(n - 1 AS DOUBLE), ceil(($p + $eps) * (n - 1)) + 1) AS INT)]"
        }
        ordered(approx.join(exact, Seq("series")).select(
          col("series"), col("n"), col("n_ts"),
          expr("abs(approx_n_ts - n_ts) <= greatest(CAST(ceil(0.06 * n_ts) AS BIGINT), 2)")
            .as("hll_ok"),
          expr(s"approx_p50 >= ${win(0.5, "lo")} AND approx_p50 <= ${win(0.5, "hi")}")
            .as("p50_ok"),
          expr(s"approx_p95 >= ${win(0.95, "lo")} AND approx_p95 <= ${win(0.95, "hi")}")
            .as("p95_ok")))
      }
    },
    // the EXACT twin of the sketch entry (integer family): per-series
    // distinct timestamps + interpolated p50/p95 in int64 fixed point —
    // the same statistics, oracle-hash-matched; cells too big for the
    // exact form are what the sketch path is for
    Entry("ts_series_stats_exact",
      s"""WITH p AS (SELECT series, ts, val FROM ($PI)),
         |g AS (SELECT series, list_sort(list(val)) AS vs, count(*) AS n,
         |       count(DISTINCT ts) AS n_ts
         |      FROM p GROUP BY 1)
         |SELECT series, n, n_ts,
         |  CAST(vs[CAST((n - 1) * 50 // 100 AS INT) + 1] * 100 + (CASE WHEN (n - 1) * 50 % 100 = 0 THEN 0 ELSE (vs[CAST((n - 1) * 50 // 100 AS INT) + 2] - vs[CAST((n - 1) * 50 // 100 AS INT) + 1]) * ((n - 1) * 50 % 100) END) AS BIGINT) AS p50_q100,
         |  CAST(vs[CAST((n - 1) * 95 // 100 AS INT) + 1] * 100 + (CASE WHEN (n - 1) * 95 % 100 = 0 THEN 0 ELSE (vs[CAST((n - 1) * 95 // 100 AS INT) + 2] - vs[CAST((n - 1) * 95 // 100 AS INT) + 1]) * ((n - 1) * 95 % 100) END) AS BIGINT) AS p95_q100
         |FROM g ORDER BY ALL""".stripMargin) {
      (s, d) => {
        // bucket 2^40 = one whole-series cell: same 3M bound as
        // ts_outlier_iqr (sf10 worst series 265,600 points)
        val pct = graft.engine.BucketStats.bucketPercentiles(I(s, d),
          bucket = 1L << 40, pcts = Seq(50, 95),
          maxCell = 3000000L).drop("bucket")
        val cd = I(s, d).groupBy(col("series"))
          .agg(countDistinct(col("ts")).as("n_ts"))
        ordered(pct.join(cd, Seq("series"))
          .select(col("series"), col("n"), col("n_ts"),
            col("p50_q100"), col("p95_q100")))
      }
    })

  // ---- as-of join (beyond-reference TS alignment; DuckDB ASOF) ----
  private def asof = Seq(
    // float family aligned against a SPARSER integer series (every
    // third pid): each f-point carries the latest preceding i-value
    // within its series suffix — LEFT semantics keep unmatched heads
    Entry("ts_asof_join",
      s"""WITH a AS (SELECT series, substring(series, 3) AS k, ts, val, pid FROM ($PF)),
         |b0 AS (SELECT substring(series, 3) AS k, ts, val, pid FROM ($PI) WHERE pid % 3 = 0),
         |b AS (SELECT k, ts, arg_max(val, pid) AS bval FROM b0 GROUP BY 1, 2)
         |SELECT a.series, a.ts, a.val, a.pid, b.bval AS asof_val
         |FROM a ASOF LEFT JOIN b ON a.k = b.k AND a.ts >= b.ts
         |ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val a = F(s, d).withColumn("k", expr("substring(series, 3)"))
        val b = I(s, d).where(col("pid") % 3 === 0)
          .withColumn("k", expr("substring(series, 3)"))
          .groupBy(col("k"), col("ts"))
          .agg(max_by(col("val"), col("pid")).as("bval"))
        ordered(graft.engine.AsOfJoin
          .asOf(a, b, key = "k", ts = "ts", rightVal = "bval")
          .select(col("series"), col("ts"), col("val"), col("pid"),
            col("asof_val")))
      }
    },
    // forward as-of: the NEXT right observation at or after each left
    // point (same union+window plan, reversed scan)
    Entry("ts_asof_forward",
      s"""WITH a AS (SELECT series, substring(series, 3) AS k, ts, val, pid FROM ($PF)),
         |b0 AS (SELECT substring(series, 3) AS k, ts, val, pid FROM ($PI) WHERE pid % 3 = 0),
         |b AS (SELECT k, ts, arg_max(val, pid) AS bval FROM b0 GROUP BY 1, 2)
         |SELECT a.series, a.ts, a.val, a.pid, b.bval AS asof_val
         |FROM a ASOF LEFT JOIN b ON a.k = b.k AND a.ts <= b.ts
         |ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val a = F(s, d).withColumn("k", expr("substring(series, 3)"))
        val b = I(s, d).where(col("pid") % 3 === 0)
          .withColumn("k", expr("substring(series, 3)"))
          .groupBy(col("k"), col("ts"))
          .agg(max_by(col("val"), col("pid")).as("bval"))
        ordered(graft.engine.AsOfJoin
          .asOf(a, b, key = "k", ts = "ts", rightVal = "bval",
            forward = true)
          .select(col("series"), col("ts"), col("val"), col("pid"),
            col("asof_val")))
      }
    },
    // staleness-bounded as-of: a match older than 10 minutes returns
    // null (any other candidate is older still, so nulling the pick
    // IS "no match within tolerance")
    Entry("ts_asof_tolerance",
      s"""WITH a AS (SELECT series, substring(series, 3) AS k, ts, val, pid FROM ($PF)),
         |b0 AS (SELECT substring(series, 3) AS k, ts, val, pid FROM ($PI) WHERE pid % 3 = 0),
         |b AS (SELECT k, ts, arg_max(val, pid) AS bval FROM b0 GROUP BY 1, 2)
         |SELECT a.series, a.ts, a.val, a.pid,
         |       CASE WHEN a.ts - b.ts <= 600 THEN b.bval END AS asof_val
         |FROM a ASOF LEFT JOIN b ON a.k = b.k AND a.ts >= b.ts
         |ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val a = F(s, d).withColumn("k", expr("substring(series, 3)"))
        val b = I(s, d).where(col("pid") % 3 === 0)
          .withColumn("k", expr("substring(series, 3)"))
          .groupBy(col("k"), col("ts"))
          .agg(max_by(col("val"), col("pid")).as("bval"))
        ordered(graft.engine.AsOfJoin
          .asOf(a, b, key = "k", ts = "ts", rightVal = "bval",
            tolerance = 600L)
          .select(col("series"), col("ts"), col("val"), col("pid"),
            col("asof_val")))
      }
    })

  // ---- range join (beyond-reference; bucketized, never a BNLJ) ----
  private def rangeJoin = Seq(
    // every ~97th integer point anchors a 1-hour window; count the
    // float points falling in each window (keyless containment join)
    Entry("ts_range_join",
      s"""WITH pts AS (SELECT ts FROM ($PF)),
         |an AS (SELECT pid AS aid, ts AS lo, ts + 3600 AS hi FROM ($PI) WHERE pid % 97 = 0)
         |SELECT aid, CAST(count(p.ts) AS BIGINT) AS n_points
         |FROM an LEFT JOIN pts p ON p.ts BETWEEN an.lo AND an.hi
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val anchors = I(s, d).where(col("pid") % 97 === 0)
          .select(col("pid").as("aid"), col("ts").as("lo"),
            (col("ts") + 3600L).as("hi"))
        ordered(graft.engine.RangeJoin.bucketedCount(
          F(s, d), "ts", anchors, "aid", "lo", "hi", bucket = 3600L))
      }
    })

  // ---- ingest throughput + round-trip integrity ----
  // The reference is a TSDB: ingest rate is ITS headline metric, so
  // the batch-ingest path (shard partitioning, type establishment,
  // catalog derivation) is a measured bench entry, not just test
  // setup. Each call ingests the integer family into a FRESH store
  // and answers the summary from the INGESTED store — the oracle
  // computes the same summary straight from the source parquet, so a
  // hash match proves the store round-trips every point exactly.
  private def ingest = Seq(
    Entry("ingest_events",
      s"""SELECT count(*) AS n_points, count(DISTINCT series) AS n_series,
         |       min(ts) AS min_ts, max(ts) AS max_ts,
         |       CAST(sum(val) AS BIGINT) AS sum_val
         |FROM ($PI)""".stripMargin) {
      (s, d) => {
        val dir = TmpStores.freshDirFor("bench-ingest", d)
        val pts = I(s, d).select(col("series"), col("ts"),
          col("val").cast("double").as("val_num"), lit("integer").as("tp"),
          col("pid"), col("val").as("val_int"), lit("").as("val_str"))
        graft.streaming.Ingest.appendBatch(pts, dir, shardDuration = 86400L)
        graft.streaming.Ingest.points(s, dir).agg(
          count(lit(1)).as("n_points"),
          countDistinct(col("series")).as("n_series"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
          sum(col("val_int")).as("sum_val"))
      }
    })

  // ---- §2.2 series selection: set algebra over series names ----

  private def selection = Seq(
    Entry("sel_name_points",
      s"""SELECT series, ts, val FROM ($PF) WHERE series = 'f.click.0' ORDER BY ALL""") {
      (s, d) => chain(SeriesMatch.select(F(s, d), Name("f.click.0"), env(s, d)))
    },
    Entry("sel_regex_points",
      s"""SELECT series, ts, val FROM ($PF)
         |WHERE regexp_matches(series, '^f\\.(click|view)\\.[0-3]$$') ORDER BY ALL""".stripMargin) {
      (s, d) => chain(SeriesMatch.select(F(s, d),
        Regex("^f\\.(click|view)\\.[0-3]$"), env(s, d)))
    },
    Entry("sel_union",
      s"""SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\.click\\.')
         |UNION SELECT series FROM ($CAT) WHERE series = 'i.error.3' ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(SeriesMatch.eval(
        SetOp(",", Regex("^f\\.click\\..*"), Name("i.error.3")), env(s, d)))
    },
    Entry("sel_intersect",
      s"""SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\..*\\.0$$')
         |INTERSECT SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\.click\\.') ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(SeriesMatch.eval(
        SetOp("&", Regex("^f\\..*\\.0$"), Regex("^f\\.click\\..*")), env(s, d)))
    },
    Entry("sel_difference",
      s"""SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\.click\\.')
         |EXCEPT SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\..*\\.[0-3]$$') ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(SeriesMatch.eval(
        SetOp("-", Regex("^f\\.click\\..*"), Regex("^f\\..*\\.[0-3]$")), env(s, d)))
    },
    Entry("sel_symdiff",
      s"""WITH a AS (SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\.click\\.')),
         |     b AS (SELECT series FROM ($CAT) WHERE regexp_matches(series, '^[fi]\\..*\\.[0-1]$$'))
         |SELECT series FROM ((SELECT * FROM a EXCEPT SELECT * FROM b)
         |UNION ALL (SELECT * FROM b EXCEPT SELECT * FROM a)) ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(SeriesMatch.eval(
        SetOp("^", Regex("^f\\.click\\..*"), Regex("^[fi]\\..*\\.[0-1]$")), env(s, d)))
    },
    Entry("sel_group",
      s"""SELECT series FROM ($CAT) WHERE regexp_matches(series, '^f\\.click\\.') ORDER BY ALL""") {
      (s, d) => ordered(SeriesMatch.eval(GroupTag("clicks"), env(s, d)))
    },
    Entry("sel_tag",
      s"""SELECT series FROM ($CAT) WHERE pool = 2 ORDER BY ALL""") {
      (s, d) => ordered(SeriesMatch.eval(GroupTag("pool2"), env(s, d)))
    })

  // ---- §2.4 time-range + head/tail ----

  private def timeRange = Seq(
    Entry("tr_between",
      s"""SELECT series, ts, val FROM ($PI) WHERE ts >= $A AND ts < $B ORDER BY ALL""") {
      (s, d) => chain(I(s, d), TimeRange(Some(A), Some(B)))
    },
    Entry("tr_after_head",
      s"""SELECT series, ts, val FROM ($PF) WHERE ts >= $A
         |QUALIFY row_number() OVER (PARTITION BY series $ORD) <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => chain(F(s, d), TimeRange(Some(A), None), Head(5))
    },
    Entry("tr_before_tail",
      s"""SELECT series, ts, val FROM ($PF) WHERE ts < $B
         |QUALIFY row_number() OVER (PARTITION BY series ORDER BY ts DESC, pid DESC) <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => chain(F(s, d), TimeRange(None, Some(B)), Tail(5))
    })

  // ---- §2.5 bucketed aggregates (right-aligned GROUP_TS labels) ----

  private def aggSql(from: String, gb: Long, valExpr: String, off: Long = 0) =
    s"""SELECT series, ${bkt(gb, off)} AS ts, $valExpr AS val
       |FROM ($from) GROUP BY 1, 2 ORDER BY ALL""".stripMargin

  private def bucketedAggs = Seq(
    Entry("agg_count_1h", aggSql(PI, 3600, "count(*)")) {
      (s, d) => chain(I(s, d), Agg(Count, Some(3600)))
    },
    Entry("agg_sum_1h", aggSql(PI, 3600, "CAST(sum(val) AS BIGINT)")) {
      (s, d) => chain(I(s, d), Agg(Sum, Some(3600)))
    },
    Entry("agg_min_1h", aggSql(PI, 3600, "min(val)")) {
      (s, d) => chain(I(s, d), Agg(Min, Some(3600)))
    },
    Entry("agg_max_1h", aggSql(PI, 3600, "max(val)")) {
      (s, d) => chain(I(s, d), Agg(Max, Some(3600)))
    },
    Entry("agg_first_1h", aggSql(PI, 3600, s"first(val $ORD)")) {
      (s, d) => chain(I(s, d), Agg(First, Some(3600)))
    },
    Entry("agg_last_1h", aggSql(PI, 3600, s"last(val $ORD)")) {
      (s, d) => chain(I(s, d), Agg(Last, Some(3600)))
    },
    Entry("agg_median_low_1h",
      aggSql(PI, 3600, "list_sort(list(val))[(count(val) + 1) // 2]")) {
      (s, d) => chain(I(s, d), Agg(MedianLow, Some(3600)))
    },
    Entry("agg_median_high_1h",
      aggSql(PI, 3600, "list_sort(list(val))[count(val) // 2 + 1]")) {
      (s, d) => chain(I(s, d), Agg(MedianHigh, Some(3600)))
    },
    Entry("agg_difference_1h",
      aggSql(PI, 3600, s"last(val $ORD) - first(val $ORD)")) {
      (s, d) => chain(I(s, d), Agg(DifferenceAgg, Some(3600)))
    },
    Entry("agg_derivative_1h_1d",
      aggSql(PI, 86400, s"(last(val $ORD) - first(val $ORD)) * 3600.0 / 86400.0")) {
      (s, d) => chain(I(s, d), Agg(DerivativeAgg(3600), Some(86400)))
    },
    Entry("agg_mean_6h", aggSql(PF, 21600, "round(avg(val), 6)")) {
      (s, d) => chainR(F(s, d), Agg(Mean, Some(21600)))
    },
    Entry("agg_median_6h", aggSql(PF, 21600, "round(quantile_cont(val, 0.5), 6)")) {
      (s, d) => chainR(F(s, d), Agg(Median, Some(21600)))
    },
    Entry("agg_variance_6h",
      aggSql(PF, 21600, "round(coalesce(var_samp(val), 0.0), 6)")) {
      (s, d) => chainR(F(s, d), Agg(Variance, Some(21600)))
    },
    Entry("agg_pvariance_6h", aggSql(PF, 21600, "round(var_pop(val), 6)")) {
      (s, d) => chainR(F(s, d), Agg(PVariance, Some(21600)))
    },
    Entry("agg_stddev_6h",
      aggSql(PF, 21600, "round(coalesce(stddev_samp(val), 0.0), 6)")) {
      (s, d) => chainR(F(s, d), Agg(Stddev, Some(21600)))
    },
    Entry("agg_offset_sum_1h", aggSql(PI, 3600, "CAST(sum(val) AS BIGINT)", off = 600)) {
      (s, d) => chain(I(s, d), Agg(Sum, Some(3600), offset = 600))
    })

  // ---- §2.5 whole-series collapse (AGGREGATE_to_one) ----

  private def toOneAggs = Seq(
    Entry("agg_count_all",
      s"""SELECT series, max(ts) AS ts, count(*) AS val FROM ($PI) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(I(s, d), Agg(Count, None))
    },
    Entry("agg_sum_all",
      s"""SELECT series, max(ts) AS ts, CAST(sum(val) AS BIGINT) AS val FROM ($PI) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(I(s, d), Agg(Sum, None))
    },
    Entry("agg_min_all",
      s"""SELECT series, max(ts) AS ts, min(val) AS val FROM ($PI) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(I(s, d), Agg(Min, None))
    },
    Entry("agg_max_all",
      s"""SELECT series, max(ts) AS ts, max(val) AS val FROM ($PI) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(I(s, d), Agg(Max, None))
    },
    Entry("agg_first_all",
      s"""SELECT series, min(ts) AS ts, first(val $ORD) AS val FROM ($PF) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(F(s, d), Agg(First, None))
    },
    Entry("agg_last_all",
      s"""SELECT series, max(ts) AS ts, last(val $ORD) AS val FROM ($PF) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(F(s, d), Agg(Last, None))
    })

  // ---- §2.5 pairwise / projection stages ----

  private def pairwise = Seq(
    Entry("pw_difference",
      s"""SELECT series, ts, val - prev AS val FROM (
         |  SELECT series, ts, val, lag(val) OVER (PARTITION BY series $ORD) AS prev FROM ($PI)
         |) WHERE prev IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => chain(I(s, d), Difference)
    },
    Entry("pw_interval",
      s"""SELECT series, ts, ts - pt AS val FROM (
         |  SELECT series, ts, lag(ts) OVER (PARTITION BY series $ORD) AS pt FROM ($PI)
         |) WHERE pt IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => chain(I(s, d), Interval)
    },
    Entry("pw_timeval",
      s"""SELECT series, ts, ts AS val FROM ($PF) ORDER BY ALL""") {
      (s, d) => chain(F(s, d), Timeval)
    },
    Entry("us_tail",
      s"""SELECT series, ts, val FROM ($PUS)
         |QUALIFY row_number() OVER (PARTITION BY series ORDER BY ts DESC, pid DESC) <= 2 ORDER BY ALL""".stripMargin) {
      (s, d) => chain(SeriesStore.pointsUs(s, d), Tail(2))
    })

  // ---- §2.5 filter() ----

  private def filters = Seq(
    // fractional literal on an integer series truncates toward zero
    // (aggregate.c:952): >= 24500.7 behaves as >= 24500
    Entry("flt_trunc_int",
      s"""SELECT series, ts, val FROM ($PI) WHERE val >= 24500 ORDER BY ALL""") {
      (s, d) => chain(I(s, d), FilterNum(">=", 24500.7))
    },
    Entry("flt_lt_float",
      s"""SELECT series, ts, val FROM ($PF) WHERE val < 1.0 ORDER BY ALL""") {
      (s, d) => chain(F(s, d), FilterNum("<", 1.0))
    },
    Entry("flt_str_contains",
      s"""SELECT series, ts, val FROM ($PS) WHERE contains(val, '"k": 9') ORDER BY ALL""") {
      (s, d) => chain(S(s, d), FilterStr("~", "\"k\": 9"))
    },
    Entry("flt_str_regex",
      s"""SELECT series, ts, val FROM ($PS) WHERE regexp_matches(val, '"k": 1[0-9]\\}') ORDER BY ALL""") {
      (s, d) => chain(S(s, d), FilterRegex(".*\"k\": 1[0-9]\\}.*"))
    },
    Entry("str_first_1d", aggSql(PS, 86400, s"first(val $ORD)")) {
      (s, d) => chain(S(s, d), Agg(First, Some(86400)))
    },
    Entry("str_count_all",
      s"""SELECT series, max(ts) AS ts, count(*) AS val FROM ($PS) GROUP BY 1 ORDER BY ALL""") {
      (s, d) => chain(S(s, d), Agg(Count, None))
    })

  // ---- §2.5 chained `=>` stages + limit(N, fn) ----

  private def chains = Seq(
    Entry("chain_sum1h_diff",
      s"""WITH b AS (SELECT series, ${bkt(3600)} AS ts, CAST(sum(val) AS BIGINT) AS val
         |           FROM ($PI) GROUP BY 1, 2)
         |SELECT series, ts, val - prev AS val FROM (
         |  SELECT series, ts, val, lag(val) OVER (PARTITION BY series ORDER BY ts) AS prev FROM b
         |) WHERE prev IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => chain(I(s, d), Agg(Sum, Some(3600)), Difference)
    },
    Entry("chain_mean6h_deriv",
      s"""WITH m AS (SELECT series, ${bkt(21600)} AS ts, avg(val) AS val
         |           FROM ($PF) GROUP BY 1, 2),
         |w AS (SELECT series, ts,
         |        (val - lag(val) OVER (PARTITION BY series ORDER BY ts)) * 21600.0
         |          / CAST(ts - lag(ts) OVER (PARTITION BY series ORDER BY ts) AS DOUBLE) AS val
         |      FROM m)
         |SELECT series, ts, round(val, 6) AS val FROM w WHERE val IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => chainR(F(s, d), Agg(Mean, Some(21600)), Derivative(21600.0))
    },
    Entry("chain_flt_sum1d",
      s"""SELECT series, ${bkt(86400)} AS ts, CAST(sum(val) AS BIGINT) AS val
         |FROM ($PI) WHERE val >= 100 GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => chain(I(s, d), FilterNum(">=", 100), Agg(Sum, Some(86400)))
    },
    // chained pairwise stages re-window the PREVIOUS stage's output
    // (SURVEY §7.4 hard part 2: difference() => difference())
    Entry("chain_diff_diff",
      s"""WITH d1 AS (
         |  SELECT series, ts, val - prev AS val, pid FROM (
         |    SELECT series, ts, val, pid, lag(val) OVER (PARTITION BY series $ORD) AS prev FROM ($PI)
         |  ) WHERE prev IS NOT NULL)
         |SELECT series, ts, val - prev AS val FROM (
         |  SELECT series, ts, val, lag(val) OVER (PARTITION BY series $ORD) AS prev FROM d1
         |) WHERE prev IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => chain(I(s, d), Difference, Difference)
    },
    // the reference's greedy bucket scan (aggregate.c:1188-1210):
    // each group is labeled GROUP_TS(first point of the group) and
    // runs until the first point past that label — replayed in SQL as
    // a recursive per-series walk over the boundary chain, each point
    // joining the smallest boundary at or past its ts
    Entry("limit_fn_mean",
      s"""WITH RECURSIVE p AS ($PF),
         |s AS (SELECT series, count(*) AS len, min(ts) AS t0, max(ts) AS t1 FROM p GROUP BY 1),
         |g AS (SELECT series, len, (t1 - t0) // 50 + 1 AS gb,
         |             (t0 - 1) % ((t1 - t0) // 50 + 1) AS off FROM s),
         |j AS (SELECT p.series, p.ts, p.val, g.len, g.gb, g.off FROM p JOIN g USING (series)),
         |small AS (SELECT series, ts, val FROM j WHERE len <= 50),
         |walk(series, gb, off, lbl) AS (
         |  SELECT series, gb, off, (min(ts) + gb - 1) // gb * gb + off
         |  FROM j WHERE len > 50 GROUP BY 1, 2, 3
         |  UNION ALL
         |  SELECT w.series, w.gb, w.off, (nxt.ts + w.gb - 1) // w.gb * w.gb + w.off
         |  FROM walk w
         |  JOIN LATERAL (SELECT min(ts) AS ts FROM j WHERE j.series = w.series AND j.ts > w.lbl) nxt
         |    ON nxt.ts IS NOT NULL),
         |big AS (SELECT j.series,
         |          (SELECT min(w.lbl) FROM walk w WHERE w.series = j.series AND w.lbl >= j.ts) AS ts,
         |          avg(val) AS val
         |        FROM j WHERE len > 50 GROUP BY 1, 2)
         |SELECT series, ts, round(val, 6) AS val
         |FROM (SELECT * FROM small UNION ALL SELECT * FROM big) ORDER BY ALL""".stripMargin) {
      (s, d) => chainR(F(s, d), LimitFn(50, Mean))
    })

  // ---- §2.6 merge as "name" [using <chain>] ----

  private def merges = Seq(
    Entry("merge_sum_1d",
      s"""SELECT 'clicks' AS series, ${bkt(86400)} AS ts, round(sum(val), 6) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.click\\.')
         |GROUP BY 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(rounded(Pipeline.merge(
        SeriesMatch.select(F(s, d), Regex("^f\\.click\\..*"), env(s, d)),
        "clicks", Seq(Agg(Sum, Some(86400))))))
    },
    // int+float mix promotes to double (points.c:368-376)
    Entry("merge_mixed_mean_1d",
      s"""SELECT 'purchase-all' AS series, ${bkt(86400)} AS ts, round(avg(val), 6) AS val
         |FROM ($PM) WHERE regexp_matches(series, '^[fi]\\.purchase\\.')
         |GROUP BY 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(rounded(Pipeline.merge(
        SeriesMatch.select(M(s, d), Regex("^[fi]\\.purchase\\..*"), env(s, d)),
        "purchase-all", Seq(Agg(Mean, Some(86400))))))
    })

  // ---- §2.7 list / count metadata queries over the catalog ----

  private def metadata = Seq(
    Entry("list_series",
      s"""SELECT series, "length", "start", "end", "type", pool FROM ($CAT) ORDER BY ALL""") {
      (s, d) => ordered(SeriesStore.catalogAll(s, d)
        .select(col("series"), col("length"), col("start"), col("end"), col("type"), col("pool")))
    },
    Entry("count_series",
      s"""SELECT count(*) AS n FROM ($CAT)""") {
      (s, d) => SeriesStore.catalogAll(s, d).agg(count(lit(1)).as("n"))
    },
    Entry("count_series_length",
      s"""SELECT CAST(sum("length") AS BIGINT) AS n FROM ($CAT)""") {
      (s, d) => SeriesStore.catalogAll(s, d).agg(sum(col("length")).as("n"))
    },
    // `list series where ...` — cexpr predicates on catalog props
    // (src/cexpr/cexpr.c; siridb_series_cexpr_cb series.c:85-112)
    Entry("list_series_where",
      s"""SELECT series, "length", "type" FROM ($CAT)
         |WHERE "length" > 250 AND "type" = 'integer' AND contains(series, 'click') ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(SeriesStore.catalogAll(s, d)
        .where(col("length") > 250 && col("type") === "integer" && col("series").contains("click"))
        .select(col("series"), col("length"), col("type")))
    },
    Entry("count_series_where",
      s"""SELECT count(*) AS n FROM ($CAT) WHERE "length" > 250 AND pool = 1""") {
      (s, d) => SeriesStore.catalogAll(s, d)
        .where(col("length") > 250 && col("pool") === 1)
        .agg(count(lit(1)).as("n"))
    })
}
