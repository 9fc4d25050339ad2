package graft.tools

import org.apache.spark.sql.SparkSession

/** Oversized-cell probe — the sf10 spot-check protocol's loud-failure
  * check (BASELINE.md): run a cell-buffering operator with `maxCell`
  * set BELOW the corpus' worst cell and require the reference-style
  * "maximum number of selected points" QueryError, proving the guard
  * fires before a buffering aggregation can OOM a task silently; run
  * it again at the shipped entry's guard value and require success.
  * Usage:
  *   runMain graft.tools.CellProbe <sfDir> <op> <maxCell>
  * where <op> is one of robustZ | anomalyIntervals | tukeyOutliers |
  * bucketPercentiles (6 h buckets). Prints `PROBE PASS rows=N` on
  * success or `PROBE FAULT <message>` when the guard fires; any other
  * failure propagates (a probe must never hide a real error). */
object CellProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: CellProbe <sfDir> <op> <maxCell>")
    val Array(sfDir, op, maxCellS) = args
    val maxCell = maxCellS.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.core.Tables
      .sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = graft.engine.SeriesStore.pointsI(spark, sfDir)
    try {
      val df = op match {
        case "robustZ" => graft.engine.Anomaly.robustZ(pts, maxCell)
        case "anomalyIntervals" =>
          graft.engine.Anomaly.anomalyIntervals(pts, maxCell = maxCell)
        case "tukeyOutliers" =>
          graft.engine.Anomaly.tukeyOutliers(pts, maxCell)
        case "bucketPercentiles" =>
          graft.engine.BucketStats.bucketPercentiles(pts, 21600L,
            Seq(50, 95, 99), maxCell)
        case other => sys.error(s"unknown op: $other")
      }
      println(s"PROBE PASS rows=${df.count()}")
    } catch {
      case e: graft.parser.QueryError =>
        println(s"PROBE FAULT ${e.getMessage}")
    } finally spark.stop()
  }
}
