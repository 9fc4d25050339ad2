package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-bucket series ranking — the "top N series right now" panel
  * every metrics dashboard renders (InfluxDB `TOP()`, Grafana topk):
  * for each time bucket, the k series with the largest bucket
  * aggregate, rank-ordered. The reference's query language can
  * aggregate within a series but has no cross-series ranking axis —
  * this is the beyond-reference operator that adds it.
  *
  * Spark-first shape: points reduce to the (series, bucket, agg)
  * rollup FIRST — one hash aggregation with map-side combine; the
  * raw stream never ranks — then a row_number window partitioned by
  * bucket over that rollup-sized frame (#series × #buckets rows,
  * orders of magnitude below the point count) keeps rank ≤ k.
  * Deterministic total order: value descending, then series name
  * ascending, so equal values cannot flap between runs or engines.
  * Exact int64 sums (ANSI overflow faults loudly).
  */
object Rank {

  /** (bucket, rank, series, agg_val): top `k` series per bucket by
    * per-bucket SUM of `val`. */
  def topSeriesPerBucket(points: DataFrame, bucket: Long,
      k: Int): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    require(k >= 1, "k must be at least 1")
    val rollup = points
      .groupBy(expr(s"ts DIV $bucket").as("bucket"), col("series"))
      .agg(sum(col("val")).as("agg_val"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("agg_val").desc, col("series").asc)
    rollup
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("bucket"), col("rank"), col("series"), col("agg_val"))
  }
}
