package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average per (series, bucket) — the irregular-sampling
  * average every industrial TSDB ships (TimescaleDB `time_weight`,
  * InfluxDB `integral`) and the reference's plain `mean` cannot
  * express: `mean` weights every SAMPLE equally, so a series that
  * reports 1 Hz while idle and 100 Hz during an incident averages the
  * incident 100× too heavily. The TWA weights each VALUE by how long
  * it was current (last-observation-carried-forward step function),
  * integrating v(t) dt over the bucket.
  *
  * Shape: duplicate timestamps collapse to the last-ingested value
  * (max pid — the step function needs one value per instant; the
  * reference keeps duplicate-ts points in insert order, so "last
  * write" is its visible final state). One per-series window pass
  * attaches each sample's successor timestamp; each LOCF segment
  * [ts, nxt) then explodes onto the buckets it overlaps and
  * contributes val × overlap to each — a segment-ends stream, NEVER a
  * per-second densification, so cost is samples + crossed bucket
  * boundaries (a gap of G buckets emits G rows: bounded by
  * span/bucket per series, the output grid itself). The final hash
  * aggregation is exact int64 (ANSI mode faults overflow loudly);
  * the quantized average is one floor division of exact integers —
  * engine-reproducible, no floats anywhere. A series' last sample
  * has no successor and contributes no coverage (the step function
  * is undefined past the last observation).
  *
  * Output: (series, bucket, dur, wsum, twa_q6) where dur = covered
  * seconds within the bucket (≤ bucket), wsum = Σ val·dt, and
  * twa_q6 = wsum·10⁶ DIV dur. `wsum·10⁶` requires
  * 0 ≤ val ≤ Long.MaxValue / (10⁶ · bucket) — ENFORCED per row by an
  * inline guard CASE on the collapsed value (a codegen'd comparison,
  * not an extra pass over the data): out-of-range values fault via
  * `raise_error` naming the value and the remedy (coarsen the
  * quantum, or read wsum/dur directly) instead of surfacing as a raw
  * ANSI overflow deep in the aggregation. Non-negativity is part of
  * the same guard — the truncating DIV equals floor division only for
  * non-negative wsum (a signed variant would use the pmod form
  * [[BucketStats.valueHistogram]] uses).
  */
object TimeWeighted {

  def bucketTwa(points: DataFrame, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val bound = Long.MaxValue / 1000000L / bucket
    val w = Window.partitionBy(col("series")).orderBy(col("ts").asc)
    points
      // ONE shuffle for the whole operator: hash(series) satisfies the
      // dup-ts collapse's (series, ts) clustering, the window's
      // series partitioning, AND the final (series, bucket)
      // aggregation (subset-key partitioning satisfies a
      // ClusteredDistribution) — without it Spark plans a second
      // exchange between the collapse and the window
      .repartition(col("series"))
      // step function: one value per (series, ts) — last write wins.
      // The guard CASE substitutes for the bare value (so column
      // pruning can never drop it) and faults loudly at the API's
      // documented bound rather than as a raw ANSI overflow later.
      .groupBy(col("series"), col("ts"))
      .agg(max_by(col("val"), col("pid")).as("__v"))
      .withColumn("val", expr(
        s"""CASE WHEN __v >= 0L AND __v <= ${bound}L THEN __v
           |ELSE raise_error(concat('bucketTwa: val ', CAST(__v AS STRING),
           |  ' outside [0, ${bound}] — exact int64 headroom for bucket=$bucket;',
           |  ' coarsen the quantum or read wsum/dur directly')) END""".stripMargin))
      .drop("__v")
      .withColumn("__nxt", lead(col("ts"), 1).over(w))
      .where(col("__nxt").isNotNull)
      // segment [ts, nxt) → one row per overlapped bucket
      .select(col("series"), col("ts"), col("val"), col("__nxt"),
        explode(expr(s"sequence(ts DIV $bucket, (__nxt - 1) DIV $bucket)"))
          .as("bucket"))
      .withColumn("__dt",
        least(col("__nxt"), (col("bucket") + 1) * bucket) -
          greatest(col("ts"), col("bucket") * bucket))
      .groupBy(col("series"), col("bucket"))
      .agg(sum(col("__dt")).as("dur"),
        sum(col("val") * col("__dt")).as("wsum"))
      .withColumn("twa_q6", expr("wsum * 1000000L DIV dur"))
  }
}
