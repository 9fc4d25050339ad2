package graft.engine

import org.apache.spark.sql.DataFrame
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
}
