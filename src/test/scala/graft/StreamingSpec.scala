package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Ingest, Rollup}
import graft.streaming.Ingest.PointIn

/** Structured-Streaming maintenance jobs: the watermarked windowed
  * rollup (append-mode finalization, late-data drop, bounded state)
  * and the flatMapGroupsWithState per-series catalog facts. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("watermarked rollup finalizes windows once; late data is dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[PointIn]
    val q = Rollup.bucketed(ms.toDF(), bucketSec = 60L, lateness = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("roll").start()
    try {
      ms.addData(PointIn("s", 10L, 1.0, "float", 1),
        PointIn("s", 20L, 2.0, "float", 2))
      q.processAllAvailable()
      // watermark still behind the first window: nothing finalized yet
      assert(spark.sql("SELECT * FROM roll").count() === 0)
      // advance event time two batches (the watermark trails a batch)
      ms.addData(PointIn("s", 200L, 5.0, "float", 3))
      q.processAllAvailable()
      ms.addData(PointIn("s", 400L, 7.0, "float", 4))
      q.processAllAvailable()
      val done = spark.sql("SELECT series, bucket, n, sum FROM roll")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(done.contains(("s", 60L, 2L, 3.0)), done.toSeq) // right-aligned: ts 10,20 in (0,60]
      // a point behind the watermark is dropped, the finalized window
      // is never re-emitted or amended
      ms.addData(PointIn("s", 30L, 9.0, "float", 5))
      q.processAllAvailable()
      val after = spark.sql("SELECT n, sum FROM roll WHERE bucket = 60")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(after.toSeq === Seq((2L, 3.0)))
    } finally q.stop()
  }

  test("liveStats keeps per-series catalog facts as streaming state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[PointIn]
    val q = Rollup.liveStats(ms.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("live").start()
    try {
      ms.addData(PointIn("a", 100L, 1.5, "float", 1),
        PointIn("a", 50L, 9.9, "float", 2))
      q.processAllAvailable()
      def snap() = spark.sql(
        "SELECT length, start, end, last_val FROM live ORDER BY length DESC LIMIT 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).head
      // out-of-order batch: last value decided by ts, not arrival
      assert(snap() === ((2L, 50L, 100L, 1.5)))
      // duplicate ts in a later batch: later insertion wins (pid order)
      ms.addData(PointIn("a", 100L, 7.7, "float", 3))
      q.processAllAvailable()
      assert(snap() === ((3L, 50L, 100L, 7.7)))
      // state is per series: a second series gets its own row
      ms.addData(PointIn("b", 7L, 3.0, "float", 4))
      q.processAllAvailable()
      assert(spark.sql("SELECT DISTINCT series FROM live").count() === 2)
    } finally q.stop()
  }
}
