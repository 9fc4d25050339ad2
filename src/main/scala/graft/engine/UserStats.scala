package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-activity health metrics over the raw event stream — the
  * product-analytics counterpart of the funnel/retention family
  * (Amplitude/Mixpanel "stickiness" and "power user curve"): how
  * OFTEN users come back, not merely whether they convert.
  *
  * Both operators reduce events FIRST to the distinct (user, day)
  * frame — one hash aggregation, |users|·|days| rows max — so
  * everything after touches a frame ~1000× smaller than raw events.
  * All outputs are exact integer counts or truncating-DIV quantized
  * ratios; no floats anywhere. */
object UserStats {

  /** Stickiness — per day: DAU, trailing-`windowDays` WAU, and their
    * ratio ("what fraction of this week's actives came today").
    *
    * WAU's sliding DISTINCT cannot ride a window frame (no
    * distinct-count frames in any engine), so each distinct
    * (user, day) row is exploded to the `windowDays` day-slots it
    * contributes to — a constant small-factor widening of the
    * ALREADY-REDUCED user-day frame, then one distinct-agg per slot
    * day. Days are only emitted when the day itself had activity
    * (`dau` row exists) — trailing slots past the data's tail would
    * otherwise report phantom days. stickiness_q6 = dau·10⁶ DIV wau,
    * exact integer. At 100 TB the user-day frame is the scale knob:
    * |users|·horizon rows, the explode factor a constant 7. */
  def stickiness(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val ud = events.select(col("user_id"),
        expr("ts DIV 86400").as("day")).distinct()
    val dau = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val slots = (0 until windowDays).map(_.toString).mkString(", ")
    val wau = ud.withColumn("slot", explode(expr(s"array($slots)")))
      .withColumn("slot_day", col("day") + col("slot"))
      .groupBy(col("slot_day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, dau("day") === wau("slot_day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000 DIV wau").as("stickiness_q6"))
  }

  /** Growth accounting — per day, the active users split into NEW
    * (first day ever), RETAINED (also active within the previous
    * `gapDays` days), and RESURRECTED (returning after a gap longer
    * than `gapDays`) — the startup-metrics decomposition of "DAU went
    * up: is that acquisition or recovery?". One lag() window over the
    * reduced user-day frame classifies every row (prev NULL → new),
    * one hash aggregation pivots the counts; all comparisons exact
    * int64 day arithmetic. */
  def lifecycle(events: DataFrame, gapDays: Long = 7L): DataFrame = {
    val ud = events.select(col("user_id"),
        expr("ts DIV 86400").as("day")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    ud.withColumn("prev", lag(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev").isNotNull &&
          col("day") - col("prev") <= gapDays, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev").isNotNull &&
          col("day") - col("prev") > gapDays, 1L).otherwise(0L))
          .as("n_resurrected"))
  }

  /** Power-user curve — the engagement histogram: how many users were
    * active exactly k distinct days over the whole window. Two hash
    * aggregations over the reduced user-day frame; output is at most
    * `horizon` rows. The shape product teams read off it (L7/L30
    * bars) is a straight re-bucketing of these exact counts. */
  def powerCurve(events: DataFrame): DataFrame = {
    events.select(col("user_id"), expr("ts DIV 86400").as("day"))
      .distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("active_days"))
      .groupBy(col("active_days")).agg(count(lit(1)).as("n_users"))
  }

  /** Per-user session stats — [[graft.engine.Sessionize]] aimed at the
    * USER axis (the product-analytics flavor: visit counts and visit
    * lengths, not series activity): events more than `gap` seconds
    * apart split sessions; per user, the session count, event count,
    * and summed session duration. One lag window + running sum per
    * user (the sessionize idiom) + two hash aggregations; all exact
    * int64 seconds. */
  def sessionStats(events: DataFrame, gap: Long = 1800L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc)
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events.select(col("user_id"), col("ts"))
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts") - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("__sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts")) - min(col("ts"))).as("dur"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"),
        sum(col("dur")).as("dur_sum"))
  }

  /** Cohort LTV — revenue per signup cohort by week since signup: the
    * triangle finance reads payback periods off. Users cohort by
    * their FIRST `cohortEvent` week; every `revenueEvent`'s value
    * (exact integer cents — same ×100 round as the integer point
    * family) lands in (cohort_wk, event week − cohort week), plus the
    * running cumulative per cohort. `events` needs (user_id, ts
    * seconds, event_type, cents). Pre-cohort revenue (a purchase
    * before the first signup) is dropped — it belongs to no cohort.
    *
    * Scale shape: the cohort frame is ONE min-agg (user-sized), the
    * revenue stream joins it on user_id (co-partitioned hash join; at
    * 100 TB both sides shuffle once on the user key they already
    * aggregate on), the grid agg collapses to #cohorts × #weeks rows,
    * and the cumulative is a window over that tiny grid. */
  def cohortLtv(events: DataFrame, cohortEvent: String = "signup",
      revenueEvent: String = "purchase",
      bucket: Long = 604800L): DataFrame = {
    val cohort = events.where(col("event_type") === cohortEvent)
      .groupBy(col("user_id"))
      .agg(min(expr(s"ts DIV $bucket")).as("cohort_wk"))
    val rev = events.where(col("event_type") === revenueEvent)
      .select(col("user_id"), expr(s"ts DIV $bucket").as("wk"),
        col("cents"))
    val grid = rev.join(cohort, Seq("user_id"))
      .where(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_k"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("ltv_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_wk")).orderBy(col("week_k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.withColumn("cum_ltv_cents", sum(col("ltv_cents")).over(w))
  }

  /** RFM segmentation — the CRM staple: each purchasing user scored
    * 1..5 on Recency (latest purchase ts), Frequency (purchase
    * count), and Monetary (total cents), by quintile. One hash
    * aggregation to the per-user triple, then three ntile(5) windows
    * over that user-sized frame (global sorts of USERS, not events —
    * and each ordering carries user_id as the tiebreak, so every
    * score is deterministic and the oracle replays bucket-for-bucket:
    * SQL-standard ntile puts the remainder in the leading buckets in
    * both engines). ntile needs a total order, so each scoring window
    * is a single-partition sort OF USERS — fine to ~10⁸ users; at
    * billions, swap to approx quintile cut points broadcast onto the
    * frame (the scores stop being exactly rank-based, which is why
    * that is not the default). Output (user_id, last_ts, n_purchases,
    * cents, r, f, m, rfm). */
  def rfm(events: DataFrame, revenueEvent: String = "purchase")
      : DataFrame = {
    val u = events.where(col("event_type") === revenueEvent)
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("cents"))
    def quintile(metric: String) = ntile(5).over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col(metric).asc, col("user_id").asc))
    u.withColumn("r", quintile("last_ts").cast("long"))
      .withColumn("f", quintile("n_purchases").cast("long"))
      .withColumn("m", quintile("cents").cast("long"))
      .withColumn("rfm", col("r") * 100L + col("f") * 10L + col("m"))
  }

  /** A/B conversion readout — per candidate goal event: the
    * two-proportion pooled z-test between the control and treatment
    * arms, the number an experimentation dashboard prints next to
    * every metric. Arms come from `armExpr` over the user id
    * (default: the parity split — a deterministic stand-in for the
    * assignment column a real experiment platform would carry;
    * deployments pass their own expression). A user converts on goal
    * g when they emitted g at least `minCount` times (1 = the classic
    * did-it-at-all conversion; pass a higher cut when the corpus is
    * dense enough that everyone does everything — a universal
    * conversion has no variance and reads NULL); every distinct user
    * in the event stream is an exposure.
    *
    * Plan: one distinct (user, goal) reduction + one distinct-user
    * arm frame, two hash aggs to a ≤ (#event_types × 2)-row frame,
    * the 2-row arm totals broadcast — nothing user-sized survives the
    * aggregation. Exactness: n/c are integers; p0, p1, pooled p and z
    * are ONE fixed IEEE sequence from them, floor-quantized ×1e6.
    * Degenerate splits (either arm empty, pooled p ∈ {0, 1} — no
    * variance) emit a NULL z rather than a fake zero. Output
    * (goal, n0, c0, n1, c1, z_q6). */
  /** Pooled two-proportion z over (n0, c0, n1, c1) columns,
    * floor-quantized ×1e6 — ONE fixed IEEE sequence from exact int64
    * counts; NULL (not a fake 0) when either arm is empty or the
    * pooled p has no variance. Shared by [[abTest]] and
    * [[Funnel.funnelSignificance]] so the two z definitions can never
    * drift from each other or their oracles. */
  private[engine] def pooledZQ6: Column = expr(
    """CAST(floor(CASE
      |  WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1
      |    THEN CAST(NULL AS DOUBLE)
      |  ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |        - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |    / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |           * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |           * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
      |  END * 1e6) AS BIGINT)""".stripMargin)

  def abTest(events: DataFrame, armExpr: String = "user_id % 2",
      minCount: Long = 1L): DataFrame = {
    val ua = events.select(col("user_id"),
        expr(armExpr).cast("long").as("arm")).distinct()
    val arms = ua.groupBy(col("arm")).agg(count(lit(1)).as("n"))
    // an absent arm must read 0, not NULL — the oracle's
    // sum(CASE WHEN..ELSE 0 END) over per-user rows yields 0 there,
    // and the z/power guards key on n = 0
    val tot = arms.agg(
      coalesce(sum(when(col("arm") === 0L, col("n"))), lit(0L)).as("n0"),
      coalesce(sum(when(col("arm") === 1L, col("n"))), lit(0L)).as("n1"))
    val conv = events.select(col("user_id"),
        expr(armExpr).cast("long").as("arm"),
        col("event_type").as("goal"))
      .groupBy(col("user_id"), col("arm"), col("goal"))
      .agg(count(lit(1)).as("__k"))
      .where(col("__k") >= minCount)
      .groupBy(col("goal"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("c1"))
    conv.crossJoin(broadcast(tot))
      .select(col("goal"), col("n0"), col("c0"), col("n1"), col("c1"),
        pooledZQ6.as("z_q6"))
  }

  /** Experiment design readout — the power half of [[abTest]] (the
    * trust-gate-per-family pattern): per goal, alongside the arm
    * counts and z, the observed arm rates, the signed observed
    * effect, the MINIMUM DETECTABLE EFFECT at the current sample
    * sizes (two-sided α = 0.05, 80 % power — the normal-approximation
    * textbook formula with the baseline-arm variance), and the
    * PER-ARM sample size that would detect the observed effect at
    * that power (NULL when the observed effect is zero — no n
    * detects nothing). This is the table that says whether a NULL or
    * small z means "no effect" or "underpowered experiment".
    *
    * The z quantiles appear as the literal sum (1.959964 + 0.841621)
    * in BOTH engines, so the constant is one identical IEEE add, and
    * every derived value is one fixed IEEE sequence from exact int64
    * counts, floor-quantized ×1e6 (n_required is a ceil of the same
    * shared double — exact on equal inputs, no round() boundary).
    * Same plan as [[abTest]]: the power columns are a projection on
    * its goal-sized output. */
  def abPower(events: DataFrame, armExpr: String = "user_id % 2",
      minCount: Long = 1L): DataFrame = {
    val zs = "(1.959964 + 0.841621)"
    abTest(events, armExpr, minCount)
      // an empty arm would make these 0/0 = NaN double divides (double
      // division never ANSI-faults) and NaN casts diverge by engine —
      // guard to NULL, which then propagates through every derived
      // column below (a NULL comparison falls to the CASE ELSE branch,
      // whose arithmetic is NULL on NULL inputs)
      .withColumn("p0", expr(
        "CASE WHEN n0 = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) END"))
      .withColumn("p1", expr(
        "CASE WHEN n1 = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) END"))
      .select(col("goal"), col("n0"), col("c0"), col("n1"), col("c1"),
        col("z_q6"),
        expr("CAST(floor(p0 * 1e6) AS BIGINT)").as("p0_q6"),
        expr("CAST(floor(p1 * 1e6) AS BIGINT)").as("p1_q6"),
        expr("CAST(floor((p1 - p0) * 1e6) AS BIGINT)").as("effect_q6"),
        expr(
          s"""CAST(floor(CASE
             |  WHEN n0 = 0 OR n1 = 0 OR p0 * (1.0 - p0) = 0.0
             |    THEN CAST(NULL AS DOUBLE)
             |  ELSE $zs * sqrt(p0 * (1.0 - p0)
             |    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
             |  END * 1e6) AS BIGINT)""".stripMargin).as("mde_q6"),
        expr(
          s"""CASE WHEN p1 = p0 THEN CAST(NULL AS BIGINT)
             |  ELSE CAST(ceil($zs * $zs
             |    * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
             |    / ((p1 - p0) * (p1 - p0))) AS BIGINT) END""".stripMargin)
          .as("n_required"))
  }
}
