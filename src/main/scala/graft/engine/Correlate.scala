package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-series correlation discovery — "which metrics move
  * together": Pearson r between every series pair over their hourly
  * rollups, the monitoring-stack feature that surfaces a latency
  * series tracking a queue-depth series before a human suspects it.
  *
  * Scale shape: points reduce FIRST to the (series, bucket, sum)
  * rollup — one exact-int64 hash aggregation, the same frame a
  * standing rollup already maintains — and only that rollup
  * (S × buckets rows, ~points/1000) self-joins on the bucket; raw
  * points never pair. Per-bucket fan-out is S² with S = series
  * count — inherently small here; at larger S block by metric group
  * before pairing. All five pair moments (Σx, Σy, Σxy, Σx², Σy²)
  * are exact int64 sums (order-independent), the covariance /
  * variance terms stay INTEGER (n·Σxy − ΣxΣy), and r follows by one
  * fixed sequence of correctly-rounded IEEE ops (int→double
  * conversion is deterministic) — bit-identical in any engine,
  * shipped floor-quantized ×1e6. Exact while n·Σx² < 2^63 —
  * comfortable through ~100× the shipped scale; beyond that,
  * pre-scale the rollup. Pairs with fewer than `minBuckets` common
  * buckets or a constant side (zero variance) are dropped. */
object Correlate {

  /** (series_a, series_b, n, r_q6) for every series pair sharing
    * >= minBuckets `bucket`-second rollup buckets.
    *
    * `groupExpr` (SQL over `series` ONLY — it is evaluated on the
    * (series, bucket) rollup, where ts/val no longer exist, so an
    * expression over them fails analysis; e.g. a metric-family
    * prefix of `series`) blocks the pairing: only series in the SAME
    * group pair, so the per-bucket fan-out drops from S² to
    * Σ groupSize² — the blocking that keeps correlation discovery
    * viable at large S (nobody correlates a CPU counter against every
    * unrelated tenant's metric anyway). The group key rides the join
    * key, so blocking also CO-PARTITIONS the self-join. None = the
    * unblocked all-pairs matrix. */
  def pairwisePearson(points: DataFrame, bucket: Long = 3600L,
      minBuckets: Long = 24L, groupExpr: Option[String] = None): DataFrame = {
    val grp = groupExpr.getOrElse("''")
    // grp is a function of series: derive it on the rollup (one
    // evaluation per (series, bucket) row), never per raw point —
    // the rollup itself is the bit-identical integer aggregation
    val h = points.groupBy(col("series"), expr(s"ts DIV $bucket").as("bucket"))
      .agg(sum(col("val")).as("x"))
      .withColumn("grp", expr(grp))
    val pairs = h.as("a").join(h.as("b"),
        col("a.grp") === col("b.grp") &&
          col("a.bucket") === col("b.bucket") && col("a.series") < col("b.series"))
      .select(col("a.series").as("series_a"), col("b.series").as("series_b"),
        col("a.x").as("x"), col("b.x").as("y"))
    pairs.groupBy(col("series_a"), col("series_b"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .where(col("n") >= minBuckets)
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
      .where(col("dx") > 0 && col("dy") > 0)
      .withColumn("r", col("num").cast("double") /
        (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))))
      .select(col("series_a"), col("series_b"), col("n"),
        expr("CAST(floor(r * 1e6) AS BIGINT)").as("r_q6"))
  }
}
