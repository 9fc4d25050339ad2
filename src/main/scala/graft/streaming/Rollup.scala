package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous maintenance jobs over the ingest stream — the Structured
  * Streaming surface proper (the ingest path itself is a foreachBatch
  * exactly-once writer, Ingest.start).
  *
  * [[bucketed]] is a watermarked windowed pre-aggregation: per
  * (series, time bucket) count/sum/min/max, the rollup a 100 TB store
  * maintains continuously so coarse dashboards never rescan raw
  * points (the reference instead re-aggregates per query and relies on
  * its per-shard indexes, shard.c — a standing rollup is the
  * Spark-native equivalent). The watermark bounds state: windows
  * older than the allowed lateness are finalized, emitted once
  * (append mode), and their state dropped — without it, streaming
  * state grows with every distinct window forever.
  *
  * [[liveStats]] maintains the reference's per-series catalog facts
  * (length / start / end / last value, series.c's series->length,
  * ->start, ->end bookkeeping) as streaming state via
  * flatMapGroupsWithState: one state row per series, updated per
  * micro-batch, emitting a snapshot whenever it changes. State is
  * O(#series), the same size class the reference keeps resident.
  */
object Rollup {

  /** One finalized rollup row per (series, bucket). */
  final case class Bucket(series: String, bucket: Long, n: Long,
      sum: Double, min: Double, max: Double)

  /** Live per-series stats (the catalog facts as streaming state). */
  final case class SeriesStats(series: String, length: Long, start: Long,
      end: Long, last_val: Double)

  /** Watermarked windowed rollup of a PointIn stream. `bucket` is the
    * window width in RAW ts units of the database and `factor` its
    * precision factor (1/1000/10⁶ for s/ms/us — time.h); `lateness`
    * is how far out-of-order a point may arrive and still count;
    * anything later is dropped by the watermark, exactly like any
    * late-data policy at scale. Raw ts map onto Spark event time at
    * the matching sub-second type (timestamp_seconds/millis/micros),
    * so bucket labels stay exact in raw units; ns databases are
    * refused — Spark event time is µs-precision — and keep their
    * standing rollup with batch maintenance instead
    * (Rollup.fromPoints backfill + Ingest's per-mutation hooks, which
    * operate on raw longs end to end).
    *
    * Windows are RIGHT-aligned — (j·R, (j+1)·R], achieved by sliding
    * the floor-aligned window grid forward one raw unit — and `bucket`
    * is the window's right edge, i.e. exactly the GROUP_TS label
    * (Pipeline.bucket) of every point inside it. Right alignment is
    * what makes the rollup servable: a select's width-W bucket
    * (W = m·R) is the disjoint union of m rollup buckets, which floor
    * -aligned windows do NOT satisfy (a floor window straddles the
    * W-boundary point ts = k·W, which GROUP_TS assigns to the bucket
    * ENDING there). */
  def bucketed(src: DataFrame, bucket: Long, lateness: String,
      factor: Long = 1L): DataFrame = {
    require(factor == 1L || factor == 1000L || factor == 1000000L,
      s"streaming rollups support s/ms/us precision (factor $factor): " +
        "Spark event time is microsecond-precision; ns stores use " +
        "batch-maintained rollups (Rollup.fromPoints)")
    val (toEv, toRaw, unit) = factor match {
      case 1000L =>
        ((c: org.apache.spark.sql.Column) => timestamp_millis(c),
          (c: org.apache.spark.sql.Column) => unix_millis(c), "millisecond")
      case 1000000L =>
        ((c: org.apache.spark.sql.Column) => timestamp_micros(c),
          (c: org.apache.spark.sql.Column) => unix_micros(c), "microsecond")
      case _ =>
        ((c: org.apache.spark.sql.Column) => timestamp_seconds(c),
          (c: org.apache.spark.sql.Column) => unix_timestamp(c), "second")
    }
    src.select(col("series"), toEv(col("ts")).as("ev"),
        col("val_num").as("val"))
      .withWatermark("ev", lateness)
      .groupBy(col("series"),
        window(col("ev"), s"$bucket ${unit}s", s"$bucket ${unit}s",
          s"1 $unit"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum"),
        min(col("val")).as("min"), max(col("val")).as("max"))
      .select(col("series"),
        (toRaw(col("window.start")) + bucket - 1L).as("bucket"),
        col("n"), col("sum"), col("min"), col("max"))
  }

  /** The same rollup as a batch job over an existing points frame
    * (series, ts, val) — the backfill path: a store adopts a standing
    * rollup by materializing history once with this into
    * `<storeDir>/rollup/<bucket>`; from then on Ingest's maintenance
    * hooks keep the view exact through every store mutation (insert
    * deltas, retention pruning, shard drops, re-index — see
    * Ingest.rollupAppend and friends), which is what lets the planner
    * serve from it. Bucket labels are identical (GROUP_TS at
    * `bucketSec`), so backfill and delta rows mix — the read path
    * re-aggregates per (series, bucket). */
  def fromPoints(points: DataFrame, bucketSec: Long): DataFrame =
    points.groupBy(col("series"),
        graft.engine.Pipeline.bucket(bucketSec).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum"),
        min(col("val")).as("min"), max(col("val")).as("max"))

  /** Start the rollup as an append-mode parquet sink: rows appear
    * when their window passes the watermark — finalized exactly once.
    * The sink's output is a streaming ARTIFACT (dashboards read it
    * directly, accepting the watermark's late-data drop); the planner
    * never serves selects from it — its `_spark_metadata` log marks it
    * as not store-owned (Ingest.rollupDirs) — because the raw store
    * accepts late points the watermark discards, so the two could
    * disagree. */
  def startBucketed(src: DataFrame, outDir: String, checkpoint: String,
      bucket: Long = 3600L, lateness: String = "1 hour",
      factor: Long = 1L): StreamingQuery =
    bucketed(src, bucket, lateness, factor).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .format("parquet").option("path", outDir)
      .start()

  /** Per-series running stats via flatMapGroupsWithState: emits the
    * updated snapshot for every series touched by a micro-batch.
    * Duplicate and out-of-order timestamps are folded exactly like
    * the batch catalog (first/last decided by (ts, pid) order).
    * Deliberately NO idle eviction (unlike the alerting/forecast
    * twins): this state IS the catalog — the reference's series table
    * never forgets a series until DROP, and a catalog that silently
    * dropped quiet series would corrupt `list series` parity. Its
    * bound is the catalog's own O(#series) row count. */
  def liveStats(src: Dataset[Ingest.PointIn]): Dataset[SeriesStats] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Ingest.PointIn],
         state: GroupState[SeriesStats]) =>
          var cur = state.getOption.getOrElse(
            SeriesStats(series, 0L, Long.MaxValue, Long.MinValue, 0.0))
          var lastKey = (cur.end, Long.MinValue)
          var changed = false
          rows.foreach { p =>
            changed = true
            val k = (p.ts, p.pid)
            if (Ordering[(Long, Long)].gteq(k, lastKey)) {
              lastKey = k
              cur = cur.copy(end = math.max(cur.end, p.ts), last_val = p.val_num)
            }
            cur = cur.copy(length = cur.length + 1,
              start = math.min(cur.start, p.ts),
              end = math.max(cur.end, p.ts))
          }
          if (changed) { state.update(cur); Iterator(cur) }
          else Iterator.empty
      }
  }
}
