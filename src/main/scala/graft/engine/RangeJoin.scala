package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to every interval that
  * contains them, with NO equi-key: the second canonical TSDB join
  * the reference lacks (alongside [[AsOfJoin]]), used for "how many
  * events fell in each maintenance window / session / outage" style
  * questions.
  *
  * Spark's native plan for a pure theta join is a nested loop —
  * O(points × intervals), a scale-killer. The Spark-first shape here
  * is bucketization: each interval explodes to the time buckets it
  * covers, each point maps to its ONE bucket, and the join becomes an
  * equi-join on the bucket followed by an exact range filter. Cost is
  * linear in points + Σ interval-spans/bucket, distributed by bucket;
  * a point meets only the intervals overlapping its bucket. Choose
  * `bucket` near the typical interval length: shorter buckets fan
  * intervals wider, longer ones fan points into more candidate
  * intervals per bucket.
  */
object RangeJoin {

  /** Per-interval count of contained points (LEFT semantics: empty
    * intervals report 0). Output (idCol, n_points). */
  def bucketedCount(points: DataFrame, tsCol: String,
      intervals: DataFrame, idCol: String, loCol: String, hiCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0)
    val iv = intervals.select(col(idCol), col(loCol).as("__lo"),
        col(hiCol).as("__hi"))
      .withColumn("__b", explode(expr(
        s"sequence(__lo DIV $bucket, __hi DIV $bucket)")))
    val pt = points.select(col(tsCol).as("__ts"))
      .withColumn("__b", expr(s"__ts DIV $bucket"))
    iv.join(pt, Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(sum(when(col("__ts").between(col("__lo"), col("__hi")), 1L)
        .otherwise(0L)).as("n_points"))
  }
}
