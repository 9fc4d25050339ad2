package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over the raw event stream — the
  * product-analytics question a TSDB's series view cannot answer
  * because it needs the USER axis, not the series axis: of the users
  * who did step 1, how many went on to do step 2, then step 3, in
  * order, within a window of the first step?
  *
  * Semantics (FIRST-ENTRY funnel — the "first touch" definition
  * product-analytics suites default to): t1 = the user's FIRST
  * step-1 event; t_{i+1} = the first step-(i+1) event strictly after
  * t_i and within `window` seconds of t1; depth = number of
  * consecutive steps reached. Only users who entered the funnel
  * (t1 non-null) are returned. NOTE this is not ClickHouse
  * windowFunnel's max-depth semantic, which retries LATER step-1
  * events as chain starts and reports the best chain — here a user
  * whose first entry stalls reports the stalled depth.
  *
  * Spark-first shape: events reduce to ONE per-(user, step) sorted
  * timestamp array (hash aggregation; the only data that shuffles is
  * user/step/ts triples for the funnel's own event types), then one
  * per-user pivot row and a NARROW array-lambda chain walk — no
  * self-joins, no window functions, no per-step passes over the
  * event table; per-user cost is bounded by that user's own funnel
  * events. All timestamps are exact int64 seconds, so the chain and
  * depth are integer-exact and fully oracle-replayable. */
object Funnel {

  /** (user_id, t1..tN, depth) for an ordered `steps` funnel with a
    * completion window of `window` seconds from t1. `events` needs
    * (`user`, `ts` epoch-seconds, `etype`) columns. */
  def funnel(events: DataFrame, user: String, ts: String, etype: String,
      steps: Seq[String], window: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct")
    val ut = events.where(col(etype).isin(steps: _*))
      .groupBy(col(user).as("user_id"), col(etype).as("__t"))
      .agg(sort_array(collect_list(col(ts))).as("tss"))
    // ≤1 non-null array per (user, step): max() selects it (DuckDB's
    // any_value does the same in the oracle)
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      max(when(col("__t") === st, col("tss"))).as(s"l$i")
    }
    var df = ut.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      .withColumn("t1",
        expr("CASE WHEN l0 IS NOT NULL AND size(l0) > 0 THEN l0[0] END"))
    for (i <- 1 until steps.size) {
      df = df
        .withColumn(s"__f$i",
          expr(s"filter(l$i, x -> x > t$i AND x <= t1 + $window)"))
        .withColumn(s"t${i + 1}", expr(
          s"CASE WHEN __f$i IS NOT NULL AND size(__f$i) > 0 THEN __f$i[0] END"))
    }
    val depth = (steps.size to 1 by -1)
      .map(i => s"WHEN t$i IS NOT NULL THEN $i")
      .mkString("CASE ", " ", " ELSE 0 END")
    df.where(col("t1").isNotNull)
      .select(col("user_id") +:
        (1 to steps.size).map(i => col(s"t$i")) :+
        expr(s"CAST($depth AS BIGINT)").as("depth"): _*)
  }

  /** Funnel-significance readout — "did cohort B's per-step
    * conversion move, and is the move real?": the [[funnel]] depths
    * split into two cohorts by `armExpr` (the [[UserStats.abTest]]
    * arm convention), and each step i ≥ 2 reports the at-risk counts
    * (users whose depth reached i−1), the converted counts (depth
    * reached i), and the pooled two-proportion z on the STEP
    * conversion c/n — the per-step drill-down an overall-conversion
    * A/B readout can't give (a loss at step 2 and a gain at step 3
    * cancel in the aggregate but show here). z is
    * [[UserStats.pooledZQ6]] — shared, so the two tests can't drift;
    * degenerate splits emit NULL.
    *
    * Plan: everything after the funnel walk is a ≤ 2·(#steps+1)-row
    * depth histogram crossed with a (#steps−1)-row step frame — the
    * significance layer adds NO user-sized shuffle on top of the
    * funnel's own one. Output (step, n0, c0, n1, c1, z_q6). */
  def funnelSignificance(events: DataFrame, user: String, ts: String,
      etype: String, steps: Seq[String], window: Long,
      armExpr: String = "user_id % 2"): DataFrame = {
    val f = funnel(events, user, ts, etype, steps, window)
      .select(expr(armExpr).cast("long").as("arm"), col("depth"))
    val hist = f.groupBy(col("arm"), col("depth"))
      .agg(count(lit(1)).as("cnt"))
    val stepFrame = events.sparkSession.range(2, steps.size + 1)
      .toDF("step")
    hist.crossJoin(broadcast(stepFrame))
      .groupBy(col("step"))
      .agg(
        sum(when(col("arm") === 0L && col("depth") >= col("step") - 1,
          col("cnt")).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0L && col("depth") >= col("step"),
          col("cnt")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1L && col("depth") >= col("step") - 1,
          col("cnt")).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1L && col("depth") >= col("step"),
          col("cnt")).otherwise(0L)).as("c1"))
      .select(col("step"), col("n0"), col("c0"), col("n1"), col("c1"),
        UserStats.pooledZQ6.as("z_q6"))
  }

  /** Max-depth funnel (ClickHouse windowFunnel semantics) — the
    * retry-later-entries variant [[funnel]] deliberately does not do:
    * EVERY step-1 event is a candidate chain start (t_{i+1} = the
    * first step-(i+1) event strictly after t_i and within `window` of
    * THAT chain's own t1), and the user reports the BEST depth over
    * all starts. A user whose first entry stalls but whose later entry
    * completes reports the completed depth here and the stalled one in
    * [[funnel]] (TsAnalyticsSpec pins the divergence).
    *
    * The walk is a single sorted-merge DP, not a per-start replay: all
    * the user's funnel events merge into ONE (ts, step) array sorted
    * ascending, and one `aggregate()` pass keeps, per funnel level,
    * the latest chain-start t1 of any chain reaching that level (the
    * latest start dominates — its window constraint is the loosest and
    * the strict-order constraint is handled by the sort). Final depth
    * = the non-null prefix length. This equals max-over-starts of the
    * greedy earliest-next walk (greedy is depth-optimal for a fixed
    * start; the DP maximizes over all chains), which is what the
    * oracle replays per start — but costs O(E log E + E·steps) per
    * user instead of the product of the per-step list lengths a
    * nested filter-per-start expression pays. Equal-timestamp events
    * sort higher-step-first (the `-step` struct field), so a chain
    * never links two events at the same second — the strict `>` in
    * the chain definition. Exact int64 timestamps. */
  def funnelRetry(events: DataFrame, user: String, ts: String,
      etype: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val ut = events.where(col(etype).isin(steps: _*))
      .groupBy(col(user).as("user_id"), col(etype).as("__t"))
      .agg(sort_array(collect_list(col(ts))).as("tss"))
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      max(when(col("__t") === st, col("tss"))).as(s"l$i")
    }
    val df = ut.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    val n = steps.size
    val merged = (0 until n).map(i =>
      s"transform(coalesce(l$i, array()), " +
        s"x -> struct(x AS t, ${-(i + 1)} AS ns))")
      .mkString("sort_array(concat(", ", ", "))")
    // best[i] = latest t1 of a chain that has reached level i+1 so
    // far; a step-s event extends level s-1 when its chain start is
    // set and the event lands inside that start's window. greatest()
    // skips nulls, so the first reach just stores the start.
    val dp =
      s"""aggregate($merged,
         |  array_repeat(CAST(NULL AS BIGINT), $n),
         |  (best, e) -> transform(best, (b, i) ->
         |    CASE WHEN i = 0 AND e.ns = -1 THEN greatest(b, e.t)
         |         WHEN i > 0 AND i = -e.ns - 1
         |              AND element_at(best, i) IS NOT NULL
         |              AND e.t <= element_at(best, i) + $window
         |           THEN greatest(b, element_at(best, i))
         |         ELSE b END),
         |  best -> size(filter(best, b -> b IS NOT NULL)))""".stripMargin
    df.where(col("l0").isNotNull && size(col("l0")) > 0)
      .select(col("user_id"), size(col("l0")).cast("long").as("n_starts"),
        expr(dp).cast("long").as("depth"))
  }

  /** Top user journeys — the ranked-paths table behind a flows
    * report: each user's FIRST `pathLen` events (in (ts, event) order
    * — deterministic without a pid) join into a ">"-separated path
    * string, and the `k` most common paths win. The per-user prefix
    * is a partial-top-N window (WindowGroupLimit below the exchange),
    * the path table is at most #users rows collapsing to distinct
    * paths, and the final top-k is a TakeOrderedAndProject — no
    * global sort anywhere. Ties rank by path string so the report is
    * a total order. Output (path, n_users). */
  def topPaths(events: DataFrame, user: String, ts: String,
      etype: String, pathLen: Int = 5, k: Int = 20): DataFrame = {
    require(pathLen >= 1 && k >= 1, "pathLen and k must be positive")
    val w = Window.partitionBy(col(user))
      .orderBy(col(ts).asc, col(etype).asc)
    events
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= pathLen)
      .groupBy(col(user).as("user_id"))
      .agg(expr(s"array_join(transform(array_sort(" +
        s"collect_list(struct($ts AS t, $etype AS e))), s -> s.e), '>')")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }

  /** Event-transition matrix — the "user flows" / Sankey view every
    * product-analytics suite renders: for each consecutive pair of
    * events by the same user, how often A was followed by B and the
    * total dwell time between them (sum_dt / n = mean time-to-next).
    * `maxGap` (0 = unbounded) cuts flows at inactivity: a pair more
    * than maxGap seconds apart is a new visit, not a transition.
    *
    * One lag window per user (ties at equal ts break by event name —
    * deterministic without a pid), one hash aggregation onto the
    * event-type × event-type matrix: output is vocabulary², never
    * user- or event-sized. */
  def transitions(events: DataFrame, user: String, ts: String,
      etype: String, maxGap: Long = 0L): DataFrame = {
    require(maxGap >= 0L, "maxGap must be non-negative (0 = unbounded)")
    val w = Window.partitionBy(col(user))
      .orderBy(col(ts).asc, col(etype).asc)
    val gapOk =
      if (maxGap == 0L) lit(true)
      else col(ts) - col("__pts") <= maxGap
    events
      .withColumn("__pe", lag(col(etype), 1).over(w))
      .withColumn("__pts", lag(col(ts), 1).over(w))
      .where(col("__pe").isNotNull && gapOk)
      .groupBy(col("__pe").as("from_event"), col(etype).as("to_event"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col(ts) - col("__pts")).as("sum_dt"))
  }

  /** Non-overlapping sequence count — the ClickHouse `sequenceCount`
    * shape: how many DISJOINT strict-order step-1→…→step-N chains the
    * user completed, each within `window` seconds of its own chain
    * start, scanning left to right and restarting after every
    * completion (events of a counted chain can never be reused).
    * [[funnelRetry]] answers "how deep did the best chain get";
    * this answers "how many times did they convert". Output
    * (user_id, n_matches), users with ≥1 match only.
    *
    * Same sorted-merge DP shape as [[funnelRetry]] — all the user's
    * funnel events merge into ONE sorted (ts, −step) array and a
    * single `aggregate()` pass carries, per in-flight level, the
    * latest chain-start reaching it (latest start dominates: loosest
    * window) plus the match count. A step-N event whose level-(N−1)
    * chain is live within window COMPLETES: count+1 and all levels
    * reset, which is exactly the "continue searching after the
    * match" non-overlap rule. Equal-timestamp events sort
    * higher-step-first so a chain never links two events at the same
    * second (strict `>`). O(E log E + E·steps) per user, exact
    * int64. */
  def sequenceCount(events: DataFrame, user: String, ts: String,
      etype: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.size >= 2, "a sequence needs at least two steps")
    val ut = events.where(col(etype).isin(steps: _*))
      .groupBy(col(user).as("user_id"), col(etype).as("__t"))
      .agg(sort_array(collect_list(col(ts))).as("tss"))
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      max(when(col("__t") === st, col("tss"))).as(s"l$i")
    }
    val df = ut.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    val n = steps.size
    val merged = (0 until n).map(i =>
      s"transform(coalesce(l$i, array()), " +
        s"x -> struct(x AS t, ${-(i + 1)} AS ns))")
      .mkString("sort_array(concat(", ", ", "))")
    // acc = (lv, cnt): lv(i) = latest start of a chain at level i+1
    // (size n−1 — reaching level n IS the completion), cnt = matches
    val dp =
      s"""aggregate($merged,
         |  struct(array_repeat(CAST(NULL AS BIGINT), ${n - 1}) AS lv,
         |         0L AS cnt),
         |  (acc, e) -> CASE
         |    WHEN e.ns = ${-n} AND element_at(acc.lv, ${n - 1}) IS NOT NULL
         |         AND e.t <= element_at(acc.lv, ${n - 1}) + $window
         |      THEN struct(array_repeat(CAST(NULL AS BIGINT), ${n - 1}) AS lv,
         |                  acc.cnt + 1L AS cnt)
         |    ELSE struct(transform(acc.lv, (b, i) -> CASE
         |           WHEN i = 0 AND e.ns = -1 THEN greatest(b, e.t)
         |           WHEN i > 0 AND i = -e.ns - 1
         |                AND element_at(acc.lv, i) IS NOT NULL
         |                AND e.t <= element_at(acc.lv, i) + $window
         |             THEN greatest(b, element_at(acc.lv, i))
         |           ELSE b END) AS lv,
         |         acc.cnt AS cnt) END,
         |  acc -> acc.cnt)""".stripMargin
    df.select(col("user_id"), expr(dp).cast("long").as("n_matches"))
      .where(col("n_matches") > 0)
  }

  /** Unordered (any-order) funnel — the Amplitude/Mixpanel "in any
    * order" completion mode [[funnel]]'s strict sequencing cannot
    * express: the window anchors at the user's FIRST event of ANY
    * step, and a step counts as completed if the user did it at any
    * point inside [t_start, t_start + window], regardless of order.
    * Output (user_id, t_start, n_steps, completed).
    *
    * Spark-first shape: because t_start is the minimum over ALL the
    * user's funnel events, every funnel event is ≥ t_start — so "step
    * s completed within the window" reduces to `min ts of step s ≤
    * t_start + window`. One (user, step) min aggregation (map-side
    * combine over the event stream — the only thing that shuffles),
    * then a per-user regroup over ≤ |steps| rows whose lambda counts
    * the qualifying mins. No joins, no windows, exact int64. */
  def funnelUnordered(events: DataFrame, user: String, ts: String,
      etype: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val pm = events.where(col(etype).isin(steps: _*))
      .groupBy(col(user).as("user_id"), col(etype).as("__t"))
      .agg(min(col(ts)).as("m"))
    pm.groupBy(col("user_id"))
      .agg(min(col("m")).as("t_start"), collect_list(col("m")).as("__ms"))
      .select(col("user_id"), col("t_start"),
        expr(s"CAST(size(filter(__ms, x -> x <= t_start + $window)) AS BIGINT)")
          .as("n_steps"))
      .withColumn("completed", col("n_steps") === lit(steps.size.toLong))
  }

  /** Cohort retention — the companion table: users bucketed by the
    * period of their FIRST `cohortEvent`, counted in every later
    * period they were active at all. (cohort_wk, week_k, n_users).
    *
    * Scale shape: activity first reduces to DISTINCT (user, period) —
    * one hash aggregation, ~#users × #periods rows regardless of
    * event volume — and the cohort frame is one min() per user; the
    * only join keys on user_id between those two reduced frames.
    * Pure integer bucket arithmetic, exact oracle. */
  def retention(events: DataFrame, user: String, ts: String,
      etype: String, cohortEvent: String,
      bucket: Long = 604800L): DataFrame = {
    val cohort = events.where(col(etype) === cohortEvent)
      .groupBy(col(user).as("user_id"))
      .agg(min(expr(s"$ts div $bucket")).as("cohort_wk"))
    val active = events
      .select(col(user).as("user_id"), expr(s"$ts div $bucket").as("wk"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .where(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_k"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling ("unbounded" / "return on or after") retention — the
    * Amplitude rolling mode [[retention]]'s exact-period counting
    * cannot express: a cohort user counts as retained at period k if
    * they were active in period k OR ANY LATER period. The curve is
    * monotonically non-increasing in k (classic retention dips and
    * recovers), which is what "will they ever come back" analyses
    * want. Output (cohort_wk, week_k, n_users).
    *
    * Spark-first shape: a user's whole contribution is determined by
    * ONE number — d_max = last active period − cohort period — so the
    * event stream reduces to two per-user aggregates (min cohort
    * period, max activity period: hash aggs with map-side combine),
    * one user-keyed join between those user-sized frames, then a
    * count per (cohort_wk, d_max) and an explode of each count onto
    * k = 0..d_max. The exploded frame is bounded by #cohorts ×
    * #periods — the output grid, NOT the user count (users collapse
    * into (cohort, d_max) cells first), and never the event volume. */
  def rollingRetention(events: DataFrame, user: String, ts: String,
      etype: String, cohortEvent: String,
      bucket: Long = 604800L): DataFrame = {
    val cohort = events.where(col(etype) === cohortEvent)
      .groupBy(col(user).as("user_id"))
      .agg(min(expr(s"$ts div $bucket")).as("cohort_wk"))
    val last = events
      .groupBy(col(user).as("user_id"))
      .agg(max(expr(s"$ts div $bucket")).as("last_wk"))
    // last_wk ≥ cohort_wk always: the cohort event itself is activity
    cohort.join(last, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("last_wk") - col("cohort_wk")).as("__dmax"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("cohort_wk"),
        explode(expr("sequence(0L, __dmax)")).as("week_k"), col("__cnt"))
      .groupBy(col("cohort_wk"), col("week_k"))
      .agg(sum(col("__cnt")).as("n_users"))
  }

  /** A user's live chain: first-entry anchor, ts of the last completed
    * step, depth reached — 3 numbers, the smallest funnel state. */
  final case class FunnelState(t1: Long, tLast: Long, depth: Int)

  /** One live funnel advance: the user just reached `depth` at `ts`. */
  final case class FunnelAdvance(user_id: Long, depth: Int, ts: Long)

  /** Streaming funnel — the live half of [[funnel]] (same FIRST-ENTRY
    * strict-order semantics): each arriving event either starts a
    * user's chain (their first step-1 event) or advances it (the next
    * step, strictly after the last one, within `window` of t1), and
    * every advance is emitted the moment it lands — the live
    * conversion ticker a dashboard wants, vs the batch replay's
    * settled depths. State is one [[FunnelState]] per user (3 numbers;
    * O(#users), never event-sized). Events are sorted by ts within
    * each micro-batch so intra-batch disorder folds exactly like the
    * batch walk; a cross-batch late event is ignored if its chain
    * already advanced past it (live funnels are now-facing —
    * re-running [[funnel]] over the settled store is the audit path,
    * and with per-user in-order feeds the final streamed depth equals
    * the batch depth user-for-user, which StreamingSpec pins). Append
    * mode, advance-sized output.
    *
    * State is BOUNDED BY ACTIVE CHAINS, not all users ever seen: a
    * watermark (`maxLateness` seconds of allowed disorder) drives an
    * event-time timeout at t1 + window, the moment after which the
    * chain can never legally advance — a lapsed chain's state is
    * EVICTED, so on a 100 TB/day event stream the store holds only
    * users inside an open funnel window. After eviction a later
    * step-1 event starts a FRESH chain (the live re-entrant reading a
    * conversion ticker wants); the settled batch [[funnel]] remains
    * the first-entry-only audit, so a re-entered user is the one
    * documented live-vs-batch divergence — users whose single chain
    * never lapses agree user-for-user, which StreamingSpec pins.
    *
    * `maxLateness` is ALSO the cross-batch disorder budget: the
    * watermark it sets (max event time seen − maxLateness) causes
    * Spark to SILENTLY DROP any event that arrives in a later
    * micro-batch with ts below the watermark. The default 0 therefore
    * tolerates zero cross-batch disorder — exactly-ordered feeds (or
    * single-batch tests) only; a production deployment with
    * out-of-order transports should set maxLateness to its p99
    * delivery skew, paying for it with that much extra state
    * retention before eviction. Intra-batch disorder is always safe
    * (each micro-batch is sorted before folding). */
  def streamingFunnel(stream: DataFrame, steps: Seq[String],
      window: Long, maxLateness: Long = 0L)
      : org.apache.spark.sql.Dataset[FunnelAdvance] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct")
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val stepIdx = steps.zipWithIndex.toMap
    stream.select(col("user_id"), col("ts"), col("event_type"),
        timestamp_seconds(col("ts")).as("__et"))
      .withWatermark("__et", s"$maxLateness seconds")
      .where(col("event_type").isin(steps: _*))
      // __et rides along untouched: the event-time checker requires the
      // watermarked attribute in the stateful operator's input
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // t1 + window is behind the watermark: the chain can never
            // advance again — drop it so state stays active-sized.
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray.sortBy(_._2)
            var st = state.getOption
            val out = Vector.newBuilder[FunnelAdvance]
            batch.foreach { case (_, ts, etype, _) =>
              st match {
                case None if stepIdx(etype) == 0 =>
                  st = Some(FunnelState(ts, ts, 1))
                  out += FunnelAdvance(user, 1, ts)
                case Some(s) if s.depth < steps.size &&
                    stepIdx(etype) == s.depth &&
                    ts > s.tLast && ts <= s.t1 + window =>
                  st = Some(FunnelState(s.t1, ts, s.depth + 1))
                  out += FunnelAdvance(user, s.depth + 1, ts)
                case Some(s) if stepIdx(etype) == 0 && ts > s.t1 + window =>
                  // the old chain lapsed (its eviction may still be
                  // pending — timeouts only fire on data-less batches):
                  // the same fresh start eviction-then-arrival gives.
                  st = Some(FunnelState(ts, ts, 1))
                  out += FunnelAdvance(user, 1, ts)
                case _ => // not the next step, out of window, or pre-entry
              }
            }
            st.foreach { s =>
              state.update(s)
              // evict once the watermark passes the chain's last legal
              // advance (+ lateness slack already inside the watermark);
              // clamp above the current watermark — Spark rejects a
              // timeout at or below it (possible when replaying history).
              state.setTimeoutTimestamp(math.max(
                (s.t1 + window) * 1000L + 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            }
            out.result().iterator
          }
      }
  }
}
