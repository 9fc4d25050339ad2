package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Counter-reset-aware rate — the monitoring-stack `increase()` /
  * `rate()` semantic the reference's plain `derivative` lacks: a
  * monotone counter that drops (process restart) did not go
  * negative, it RESET — the increase since the previous sample is
  * the new value itself, not the negative delta. Per series: one
  * lag window pass computes reset-corrected increases (the first
  * sample contributes nothing, as in Prometheus), then one hash
  * aggregation sums them per time bucket and derives the per-second
  * rate. Integer series keep every increase exact int64, so the
  * bucket sums are order-independent and the oracle replays them
  * bit-for-bit; only the final rate division is floating point. */
object CounterRate {

  /** (series, bucket, increase, rate) over an integer-valued points
    * frame; buckets of `bucket` seconds, rate rounded to 9. */
  def bucketedRate(points: DataFrame, bucket: Long): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
    points
      .withColumn("__prev", lag(col("val"), 1).over(w))
      .withColumn("__inc", when(col("__prev").isNull, lit(null))
        .otherwise(when(col("val") >= col("__prev"),
          col("val") - col("__prev")).otherwise(col("val"))))
      .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
      .agg(coalesce(sum(col("__inc")), lit(0L)).as("increase"))
      .withColumn("rate",
        round(col("increase") / lit(bucket.toDouble), 9))
  }

  /** Stability counters per bucket — the monitoring-stack `changes()`
    * and `resets()` pair: how many times the value CHANGED between
    * consecutive samples in the bucket, and how many of those were
    * counter RESETS (drops). A sample pair straddling a bucket edge
    * counts in the LATER sample's bucket (the sample that observed
    * the change), matching [[bucketedRate]]'s attribution; the first
    * sample of a series contributes nothing. Same plan shape as the
    * rate: one lag window pass, one hash aggregation, all integer.
    * Output (series, bucket, n_changes, n_resets). */
  def bucketedChanges(points: DataFrame, bucket: Long): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("ts").asc, col("pid").asc)
    points
      .withColumn("__prev", lag(col("val"), 1).over(w))
      .groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
      .agg(
        sum(when(col("__prev").isNotNull &&
          col("val") =!= col("__prev"), 1L).otherwise(0L)).as("n_changes"),
        sum(when(col("__prev").isNotNull &&
          col("val") < col("__prev"), 1L).otherwise(0L)).as("n_resets"))
  }

  /** The previous sample carried across micro-batches — the same
    * 3-longs-per-series state shape as Anomaly.CrossState. */
  final case class PrevSample(ts: Long, pid: Long, value: Long)

  /** One live increase observation; `increase` is null-free — the
    * first sample of a series emits nothing (as in the batch lag). */
  final case class Increase(series: String, ts: Long, pid: Long,
      `val`: Long, increase: Long)

  /** Live reset-corrected increases — the streaming half of
    * [[bucketedRate]]: each arriving sample emits its increase since
    * the previous sample the moment it lands (reset ⇒ the new value
    * itself), with the per-series previous sample carried in
    * flatMapGroupsWithState (O(#series) × 3 longs). Points are
    * ordered by (ts, pid) WITHIN each micro-batch so intra-batch
    * disorder folds exactly like the batch lag; a point arriving in a
    * later batch than its successor is scored against the newest seen
    * sample — the same now-facing rule as streamingThresholdCross,
    * with the settled-store [[bucketedRate]] as the audit path. With
    * per-series in-order feeds the two agree increase-for-increase
    * (StreamingSpec pins it, including the cross-batch state carry).
    * Append mode; downstream can bucket the emitted stream for live
    * rate panels.
    *
    * State retires with the series (the round-14 eviction pattern
    * shared by every alerting twin): the watermark passing the newest
    * sample + `idleEvict` drops the 3-long state; the first sample
    * back emits nothing (a counter that vanished for a day restarts
    * its lag, exactly like a brand-new series — and a counter restart
    * across the gap would have read as a reset anyway). `maxLateness`
    * sets the watermark delay (later-batch events below it are
    * silently dropped by Spark); the fold is additionally MONOTONE —
    * an admitted cross-batch event at or behind the held newest
    * sample is ignored rather than read against the newer held value
    * (which would fake a reset and emit a phantom increase), so
    * cross-batch disorder costs a missed increase, never a phantom
    * one. */
  def streamingIncrease(stream: DataFrame, idleEvict: Long = 86400L,
      maxLateness: Long = 3600L): Dataset[Increase] = {
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
         state: GroupState[PrevSample]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray.sortBy(r => (r._2, r._3))
            var prev = state.getOption
            val out = Vector.newBuilder[Increase]
            batch.foreach { case (_, ts, pid, v, _) =>
              // monotone guard (the streamingThresholdCross rule): a
              // cross-batch late event at or behind the held newest
              // sample is ignored — read against the NEWER held value
              // it would fake a counter reset and emit a phantom
              // increase the batch operator never produces
              val stale = prev.exists(p =>
                ts < p.ts || (ts == p.ts && pid <= p.pid))
              if (!stale) {
                prev.foreach { p =>
                  out += Increase(series, ts, pid, v,
                    if (v >= p.value) v - p.value else v)
                }
                prev = Some(PrevSample(ts, pid, v))
              }
            }
            prev.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp(math.max(
                (p.ts + idleEvict) * 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            }
            out.result().iterator
          }
      }
  }
}
