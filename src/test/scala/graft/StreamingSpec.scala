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
    val q = Rollup.bucketed(ms.toDF(), bucket = 60L, lateness = "60 seconds")
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

  test("streaming exact-dedup: first copy passes, dups drop, state evicts at the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = ms.toDF().toDF("doc_id", "text", "event_time")
    val q = graft.llm.Dedup.streamingExactDedup(docs, lateness = "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    try {
      ms.addData((1L, "alpha beta", ts(10)), (2L, "alpha beta", ts(11)),
        (3L, "gamma delta", ts(12)))
      q.processAllAvailable()
      val first = spark.sql("SELECT doc_id FROM dedup_stream")
        .collect().map(_.getLong(0)).sorted
      assert(first.toSeq === Seq(1L, 3L), "only the first copy of each text passes")
      // far past the horizon: the old hash state is evicted, so the
      // same content is admitted again — bounded state, by design
      ms.addData((4L, "advance watermark", ts(1000)))
      q.processAllAvailable()
      ms.addData((5L, "alpha beta", ts(1001)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_stream")
        .collect().map(_.getLong(0)).sorted
      assert(ids.contains(5L), s"post-eviction copy must pass: ${ids.toSeq}")
      assert(!ids.contains(2L))
    } finally q.stop()
  }

  test("streaming rollup buckets in RAW units at ms precision — time.h factors") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[PointIn]
    // 60 s bucket on an ms database = 60,000 raw units; labels must be
    // raw-ms right edges (a seconds-typed event time would mislabel
    // sub-second remainders at bucket boundaries)
    val q = Rollup.bucketed(ms.toDF(), bucket = 60000L,
      lateness = "60 seconds", factor = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("rollms").start()
    try {
      ms.addData(PointIn("s", 10500L, 1.0, "float", 1),
        PointIn("s", 60000L, 2.0, "float", 2)) // exact right edge: in (0, 60000]
      q.processAllAvailable()
      ms.addData(PointIn("s", 200000L, 5.0, "float", 3))
      q.processAllAvailable()
      ms.addData(PointIn("s", 400000L, 7.0, "float", 4))
      q.processAllAvailable()
      val done = spark.sql("SELECT series, bucket, n, sum FROM rollms")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(done.contains(("s", 60000L, 2L, 3.0)), done.toSeq)
    } finally q.stop()
    // ns databases are refused: Spark event time is µs-precision
    intercept[IllegalArgumentException] {
      Rollup.bucketed(ms.toDF(), 60L, "1 hour", factor = 1000000000L)
    }
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

  test("streaming IVF ingest: arriving vectors land in their batch-trained cell, statelessly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // batch-train centroids on a 2-cluster corpus (axis-aligned)
    val corpus = (0 until 20).map { i =>
      val c = i % 2
      (i.toLong, Array.tabulate(4)(d => if (d % 2 == c) 1.0f else 0.05f), c)
    }.toDF("vec_id", "embedding", "label")
    val cents = graft.llm.Ann.trainCentroids(corpus, nlist = 2, iters = 2)
    val ms = MemoryStream[(Long, Array[Float])]
    val assigned = graft.llm.Ann.streamingIvfAssign(
      ms.toDF().toDF("vec_id", "embedding"), cents)
    val q = assigned.writeStream.outputMode("append").format("memory")
      .queryName("ivf_ingest").start()
    try {
      // new arrivals near each cluster axis
      ms.addData((100L, Array(1.0f, 0.1f, 0.9f, 0.0f)),
        (101L, Array(0.0f, 1.1f, 0.1f, 0.9f)))
      q.processAllAvailable()
      val out = spark.sql("SELECT vec_id, cell, csim FROM ivf_ingest")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      // the streamed assignment must agree with a BATCH re-assignment
      // through the same trained table
      val batch = graft.llm.Ann.streamingIvfAssign(
        Seq((100L, Array(1.0f, 0.1f, 0.9f, 0.0f)),
          (101L, Array(0.0f, 1.1f, 0.1f, 0.9f))).toDF("vec_id", "embedding"),
        cents).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(out(100L)._1 !== out(101L)._1, "opposite-axis vectors split cells")
      assert(out.view.mapValues(_._1).toMap ===
        Map(100L -> batch(100L), 101L -> batch(101L)))
      assert(out.values.forall(_._2 > 0.5), "axis arrivals sit close to their centroid")
    } finally q.stop()
  }

  test("streaming seasonal anomaly: arrivals score identically to a batch re-score, statelessly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // train on hour-0 history: values alternate 95/105 (mu 100, sd 5)
    val hist = (0 until 20).map(i =>
      ("s", 10L * i, i.toLong, if (i % 2 == 0) 95L else 105L))
      .toDF("series", "ts", "pid", "val")
    val base = graft.engine.Anomaly.seasonalBaselines(hist)
    val ms = MemoryStream[(String, Long, Long, Long)]
    val scored = graft.engine.Anomaly.streamingSeasonalZ(
      ms.toDF().toDF("series", "ts", "pid", "val"), base)
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("anom_live").start()
    try {
      val arrivals = Seq(("s", 1000L, 100L, 100L), ("s", 2000L, 101L, 150L))
      ms.addData(arrivals: _*)
      q.processAllAvailable()
      val live = spark.sql("SELECT pid, zq, is_anomaly FROM anom_live")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val batch = graft.engine.Anomaly.streamingSeasonalZ(
        arrivals.toDF("series", "ts", "pid", "val"), base)
        .collect().map(r => r.getLong(2) -> ((r.getLong(5), r.getBoolean(6)))).toMap
      assert(live === batch, s"live=$live batch=$batch")
      assert(!live(100L)._2 && live(101L)._2,
        "the in-band arrival passes, the 150 outlier flags")
    } finally q.stop()
  }

  test("streaming threshold-cross agrees with batch event-for-event; state carries across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val pts = Seq(
      ("s", 10L, 1L, 10L),  // below
      ("s", 20L, 2L, 60L),  // up
      ("s", 30L, 3L, 70L),  // sustained — no event
      ("s", 40L, 4L, 40L),  // down
      ("t", 10L, 1L, 80L),  // first sample — no event
      ("t", 20L, 2L, 20L))  // down
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingThresholdCross(
      ms.toDF().toDF("series", "ts", "pid", "val"), threshold = 50L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cross_live").start()
    try {
      // split mid-run so the 30→40 'down' edge and t's edge need the
      // previous sample CARRIED in state across micro-batches
      ms.addData(pts.take(3): _*)
      q.processAllAvailable()
      ms.addData(pts.drop(3): _*)
      q.processAllAvailable()
      val live = spark.sql("SELECT series, ts, direction FROM cross_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val batch = graft.engine.Anomaly.thresholdCross(
        pts.toDF("series", "ts", "pid", "val"), threshold = 50L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(5))).toSet
      assert(live === batch, s"live=$live batch=$batch")
      assert(live === Set(("s", 20L, "up"), ("s", 40L, "down"), ("t", 20L, "down")))
    } finally q.stop()
  }

  test("threshold cross and counter increase ignore admitted cross-batch late events (monotone guard)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingThresholdCross(
      ms.toDF().toDF("series", "ts", "pid", "val"), threshold = 50L,
      maxLateness = 3600L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cross_late").start()
    val ms2 = MemoryStream[(String, Long, Long, Long)]
    val q2 = graft.engine.CounterRate.streamingIncrease(
      ms2.toDF().toDF("series", "ts", "pid", "val"), maxLateness = 3600L)
      .writeStream.outputMode("append").format("memory")
      .queryName("incr_late").start()
    try {
      ms.addData(("s", 100L, 1L, 60L)); q.processAllAvailable()
      // admitted by the 3600 s watermark but BEHIND the held sample:
      // folding 60 -> 10 would fabricate a 'down' the batch twin
      // (which sorts 10@50 before 60@100) never emits
      ms.addData(("s", 50L, 2L, 10L)); q.processAllAvailable()
      ms.addData(("s", 200L, 3L, 10L)); q.processAllAvailable()
      val live = spark.sql("SELECT series, ts, direction FROM cross_late")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSet
      // the late event costs the up@100 edge the batch twin sees (the
      // documented miss) but no spurious edge exists and state never
      // regressed: the genuine 60 -> 10 'down' lands at ts=200
      assert(live === Set(("s", 200L, "down")), live.toString)

      ms2.addData(("c", 100L, 1L, 100L)); q2.processAllAvailable()
      // read against the newer held 100 this would fake a reset and
      // emit a phantom increase of 10
      ms2.addData(("c", 50L, 2L, 10L)); q2.processAllAvailable()
      ms2.addData(("c", 200L, 3L, 120L)); q2.processAllAvailable()
      val inc = spark.sql("SELECT series, ts, increase FROM incr_late")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(inc === Set(("c", 200L, 20L)), inc.toString)
    } finally { q.stop(); q2.stop() }
  }

  test("streaming mixture filter matches batch sampleMixture; the monitor's counts settle exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // a=800 docs, d=100 docs, weights 1:1 → T = min(800/1, 100/1) =
    // 100 → rates a = 100/800 = 0.125 (exact binary), d = 1.0 — the
    // same literals the batch op derives, so the kept sets are equal
    val rows = (0 until 800).map(i => (i.toLong, "w", "a")) ++
      (0 until 100).map(i => (3000L + i, "w", "d"))
    val rates = Map("a" -> 0.125, "d" -> 1.0)
    val batch = graft.llm.TextStats.sampleMixture(
      rows.toDF("doc_id", "text", "source"),
      Map("a" -> 1.0, "d" -> 1.0)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.llm.TextStats.streamingSampleMixture(
      ms.toDF().toDF("doc_id", "text", "source"), rates)
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_live").start()
    val qm = graft.llm.TextStats.streamingMixtureMonitor(
      ms.toDF().toDF("doc_id", "text", "source"), rates)
      .writeStream.outputMode("complete").format("memory")
      .queryName("mix_monitor").start()
    try {
      // split mid-source so the draw spans micro-batches
      ms.addData(rows.take(500): _*)
      q.processAllAvailable(); qm.processAllAvailable()
      ms.addData(rows.drop(500): _*)
      q.processAllAvailable(); qm.processAllAvailable()
      val live = spark.sql("SELECT doc_id, source FROM mix_live")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(live === batch,
        s"stateless draw must equal the batch mixture: ${live.size} vs ${batch.size}")
      val mon = spark.sql("SELECT source, n_sampled FROM mix_monitor")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = batch.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(mon === want, s"monitor $mon vs batch $want")
      assert(mon("d") === 100L, "the argmin source keeps everything")
    } finally { q.stop(); qm.stop() }
  }

  test("streaming mixture drift: windowed achieved-vs-plan rows finalize exactly (append mode)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // rates 1.0 keep everything → the kept set is the input, so the
    // windowed proportions are hand-checkable; plan weights 3:1 →
    // targets 750000 / 250000. Window 0: 6 a + 2 d; window 1: 2 a + 2 d
    val rows = Seq.tabulate(6)(i => (i.toLong, "w", "a", 10L + i)) ++
      Seq((100L, "w", "d", 20L), (101L, "w", "d", 30L)) ++
      Seq((200L, "w", "a", 70L), (201L, "w", "a", 80L),
        (300L, "w", "d", 75L), (301L, "w", "d", 85L))
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = graft.llm.TextStats.streamingMixtureDrift(
      ms.toDF().toDF("doc_id", "text", "source", "ts"),
      rates = Map("a" -> 1.0, "d" -> 1.0),
      weights = Map("a" -> 3.0, "d" -> 1.0), windowSec = 60L)
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_drift").start()
    try {
      // split mid-window so the count spans micro-batches
      ms.addData(rows.take(4): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(4): _*)
      q.processAllAvailable()
      ms.addData((999L, "w", "a", 100000L)) // push the watermark
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT window_start, source, n_sampled, n_total, achieved_q6, " +
          "target_q6, err_q6 FROM mix_drift WHERE window_start < 1000")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))).toMap
      assert(out((0L, "a")) === ((6L, 8L, 750000L, 750000L, 0L)),
        out.toString)
      assert(out((0L, "d")) === ((2L, 8L, 250000L, 250000L, 0L)))
      // window 1 drifts: a reads 50% against a 75% plan
      assert(out((60L, "a")) === ((2L, 4L, 500000L, 750000L, -250000L)))
      assert(out((60L, "d")) === ((2L, 4L, 500000L, 250000L, 250000L)))
    } finally q.stop()
  }

  test("streaming mixture drift scopes totals to PLANNED sources: a rates-kept unplanned source cannot fake drift") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // rates keep a, d AND x; the plan covers only a:d at 3:1. Window
    // 0 receives 6 a + 2 d (a perfect 3:1) + 8 x — the x rows must
    // not dilute n_total into phantom negative drift on a and d
    val rows = Seq.tabulate(6)(i => (i.toLong, "w", "a", 10L + i)) ++
      Seq((100L, "w", "d", 20L), (101L, "w", "d", 30L)) ++
      Seq.tabulate(8)(i => (500L + i, "w", "x", 12L + i))
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = graft.llm.TextStats.streamingMixtureDrift(
      ms.toDF().toDF("doc_id", "text", "source", "ts"),
      rates = Map("a" -> 1.0, "d" -> 1.0, "x" -> 1.0),
      weights = Map("a" -> 3.0, "d" -> 1.0), windowSec = 60L)
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_drift_scope").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      ms.addData((999L, "w", "a", 100000L))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT source, n_sampled, n_total, err_q6 FROM mix_drift_scope " +
          "WHERE window_start < 1000").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(out("a") === ((6L, 8L, 0L)), out.toString)
      assert(out("d") === ((2L, 8L, 0L)), out.toString)
      assert(!out.contains("x"), "unplanned sources emit no drift rows")
    } finally q.stop()
  }

  test("streaming session windows finalize past the watermark and agree with batch sessionize") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val pts = Seq(
      ("s", 10L, 1L, 0L), ("s", 40L, 2L, 0L),   // diff 30 = gap: MERGES (batch rule)
      ("s", 100L, 3L, 0L),                      // diff 60 > gap: new session
      ("t", 20L, 1L, 0L))
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Sessionize.streamingSessions(
      ms.toDF().toDF("series", "ts", "pid", "val"), gap = 30L,
      lateness = "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_live").start()
    try {
      ms.addData(pts: _*)
      q.processAllAvailable()
      // push the watermark far ahead so every session closes
      ms.addData(("w", 10000L, 9L, 0L))
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT series, session_start, session_end, n_points FROM sess_live")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = graft.engine.Sessionize.sessions(
        pts.toDF("series", "ts", "pid", "val"), gap = 30L)
        .select("series", "session_start", "session_end", "n_points")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(live === batch, s"live=$live batch=$batch")
      assert(live.contains(("s", 10L, 40L, 2L)),
        "a gap exactly at the threshold must merge, as in batch")
      assert(live.contains(("s", 100L, 100L, 1L)))
    } finally q.stop()
  }

  test("streaming Holt forecast equals the batch fold after every prefix; late points re-slot") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Double)]
    val q = graft.engine.Forecast.streamingHolt(
      ms.toDF().toDF("series", "ts", "pid", "val"), lastN = 8)
      .writeStream.outputMode("update").format("memory")
      .queryName("holt_live").start()
    def batchOf(pts: Seq[(String, Long, Long, Double)]) =
      graft.engine.Forecast.holt(
        pts.toDF("series", "ts", "pid", "val"), lastN = 8).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    try {
      val batch1 = Seq(("s", 10L, 1L, 10.0), ("s", 20L, 2L, 20.0))
      ms.addData(batch1: _*)
      q.processAllAvailable()
      // the LATE point at ts 15 arrives after ts 30 — it must slot
      // between 10 and 20 in the fold, exactly as batch places it
      val batch2 = Seq(("s", 30L, 3L, 30.0), ("s", 15L, 4L, 99.0))
      ms.addData(batch2: _*)
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT series, n_samples, last_ts, forecast_q6 FROM holt_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val afterB1 = batchOf(batch1)("s")
      val afterB2 = batchOf(batch1 ++ batch2)("s")
      assert(live.contains(("s", afterB1._1, afterB1._2, afterB1._3)),
        s"prefix-1 emission must equal the batch fold: $afterB1 in ${live.toSeq}")
      assert(live.contains(("s", afterB2._1, afterB2._2, afterB2._3)),
        s"prefix-2 emission must equal the batch fold: $afterB2 in ${live.toSeq}")
    } finally q.stop()
  }

  test("streaming counter increase agrees with the batch lag; resets emit the new value; state carries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val pts = Seq(
      ("s", 10L, 1L, 100L), // first sample — nothing
      ("s", 20L, 2L, 130L), // +30
      ("s", 30L, 3L, 25L),  // reset → 25
      ("s", 40L, 4L, 40L),  // +15
      ("t", 10L, 1L, 7L),   // first sample — nothing
      ("t", 20L, 2L, 7L))   // +0
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.CounterRate.streamingIncrease(
      ms.toDF().toDF("series", "ts", "pid", "val"))
      .writeStream.outputMode("append").format("memory")
      .queryName("inc_live").start()
    try {
      // split so s's 30→40 increase and t's 10→20 need carried state
      ms.addData(pts.take(3): _*)
      q.processAllAvailable()
      ms.addData(pts.drop(3): _*)
      q.processAllAvailable()
      val live = spark.sql("SELECT series, ts, increase FROM inc_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // the batch operator's pre-aggregation lag over the same points
      import org.apache.spark.sql.functions.{col, lag, when, expr}
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("series")).orderBy(col("ts").asc, col("pid").asc)
      val batch = pts.toDF("series", "ts", "pid", "val")
        .withColumn("prev", lag(col("val"), 1).over(w))
        .where(col("prev").isNotNull)
        .withColumn("inc",
          when(col("val") >= col("prev"), col("val") - col("prev"))
            .otherwise(col("val")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(5))).toSet
      assert(live === batch, s"live=$live batch=$batch")
      assert(live === Set(("s", 20L, 30L), ("s", 30L, 25L), ("s", 40L, 15L),
        ("t", 20L, 0L)))
    } finally q.stop()
  }

  test("streaming Holt-Winters equals batch after every bucket split; short windows stay silent") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the TsAnalyticsSpec hand-trace: m=2, y=[10,20,12,22] — but
    // bucket 2's sum (12) arrives SPLIT across two batches (5+7).
    // Base 3600000 (an EVEN bucket count, so slot parity and the
    // hand-traced forecast are unchanged): an event at ts 0 would sit
    // at the initial watermark and be dropped by the watermarked
    // operator
    val B = 3600000L
    val batch1 = Seq(("s", B, 10L), ("s", B + 3600L, 20L),
      ("s", B + 7200L, 5L),
      ("t", B, 1L))                      // t: one bucket, never emits
    val batch2 = Seq(("s", B + 7200L, 7L), ("s", B + 10800L, 22L))
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.engine.Forecast.streamingHoltWinters(
      ms.toDF().toDF("series", "ts", "val"),
      bucket = 3600L, lastN = 4, m = 2)
      .writeStream.outputMode("update").format("memory")
      .queryName("hw_live").start()
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      ms.addData(batch2: _*)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT series, n_buckets, last_bucket, forecast_q6 FROM hw_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(!rows.exists(_._1 == "t"), "a 1-bucket window must stay silent")
      // final emission equals the batch operator over all points seen
      val pts = (batch1 ++ batch2).filter(_._1 == "s").zipWithIndex
        .map { case ((se, ts, v), i) => (se, ts, i.toLong, v) }
        .toDF("series", "ts", "pid", "val")
      val batch = graft.engine.Forecast.holtWinters(pts,
        bucket = 3600L, lastN = 4, m = 2).collect().head
      val fin = rows.filter(_._1 == "s").maxBy(_._3)
      assert(fin === (("s", batch.getLong(1), batch.getLong(2),
        batch.getLong(3))), s"live=$fin batch=$batch")
      assert(fin._4 === 12218750L, "the hand-traced forecast")
    } finally q.stop()
  }

  test("streaming funnel advances live and ends at the batch depths; chain state carries across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val ev = Seq(
      (1L, 10L, "view"),      // u1 enters
      (1L, 20L, "click"),     // u1 depth 2
      (2L, 15L, "click"),     // u2 pre-entry click: ignored
      (2L, 30L, "view"),      // u2 enters
      // ---- batch split: u1's purchase needs the chain CARRIED ----
      (1L, 40L, "purchase"),  // u1 depth 3
      (2L, 25L, "purchase"),  // late + out of order: ignored
      (3L, 50L, "view"),      // u3 enters
      (3L, 900L, "click"))    // outside u3's 100 s window: ignored
    val ms = MemoryStream[(Long, Long, String)]
    val q = graft.engine.Funnel.streamingFunnel(
      ms.toDF().toDF("user_id", "ts", "event_type"), steps, window = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_live").start()
    try {
      ms.addData(ev.take(4): _*)
      q.processAllAvailable()
      ms.addData(ev.drop(4): _*)
      q.processAllAvailable()
      val adv = spark.sql("SELECT user_id, depth, ts FROM funnel_live")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(adv === Set((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 40L),
        (2L, 1, 30L), (3L, 1, 50L)), adv.toString)
      // final streamed depth per user == batch funnel depth
      val liveDepth = adv.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val batch = graft.engine.Funnel.funnel(
        ev.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, window = 100L)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      assert(liveDepth.map { case (u, d) => u -> d.toLong } === batch,
        s"live=$liveDepth batch=$batch")
    } finally q.stop()
  }

  test("streaming funnel evicts lapsed chains (state stays active-sized) and a later entry starts fresh") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val ms = MemoryStream[(Long, Long, String)]
    val q = graft.engine.Funnel.streamingFunnel(
      ms.toDF().toDF("user_id", "ts", "event_type"), steps, window = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_evict").start()
    try {
      // b1: u1 and u2 enter (windows close at 110 / 130)
      ms.addData((1L, 10L, "view"), (2L, 30L, "view"))
      q.processAllAvailable()
      // b2: u9 enters far later — pushes the watermark to 300
      ms.addData((9L, 300L, "view"))
      q.processAllAvailable()
      // b3: u9 advances; u1/u2 have no data and their timeouts are
      // behind the 300 s watermark → their state is evicted here
      ms.addData((9L, 310L, "click"))
      q.processAllAvailable()
      // b4: u1 re-enters AFTER its old window lapsed → fresh chain
      ms.addData((1L, 400L, "view"), (1L, 420L, "click"))
      q.processAllAvailable()
      val adv = spark.sql("SELECT user_id, depth, ts FROM funnel_evict")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(adv === Set((1L, 1, 10L), (2L, 1, 30L), (9L, 1, 300L),
        (9L, 2, 310L), (1L, 1, 400L), (1L, 2, 420L)), adv.toString)
      // without eviction the store would still hold u1-old, u2 and u9
      // (3 keys); eviction leaves at most {u9, u1-fresh}
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("streaming SLO burn pages exactly where the batch operator does; window state carries across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // 100 good then 50 bad, one per minute (the SeriesMathSpec
    // scenario: first page at bad #17 when the long window crosses),
    // split mid-burst so the window state must carry
    // base offset: an event at ts 0 sits AT the initial watermark and
    // the watermarked operator drops it — real feeds never start at
    // epoch 0, so the scenario starts at a positive base
    val pts = (0 until 150).map(i =>
      ("svc", 1000000L + i * 60L, i.toLong, if (i >= 100) 20000L else 0L))
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingSloBurn(
      ms.toDF().toDF("series", "ts", "pid", "val"), threshold = 10000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("slo_live").start()
    try {
      ms.addData(pts.take(110): _*)
      q.processAllAvailable()
      ms.addData(pts.drop(110): _*)
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT series, ts, short_bad, short_n, long_bad, long_n FROM slo_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      val batch = graft.engine.Anomaly.sloBurn(
        pts.toDF("series", "ts", "pid", "val"), threshold = 10000L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(live === batch, s"live=${live.size} batch=${batch.size}")
      assert(batch.nonEmpty, "the scenario must actually page")
    } finally q.stop()
  }

  test("streaming threshold-cross evicts idle series and re-trains on re-arrival") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingThresholdCross(
      ms.toDF().toDF("series", "ts", "pid", "val"), threshold = 50L,
      idleEvict = 100L, maxLateness = 0L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cross_evict").start()
    try {
      // b1: s crosses up (prev 10 → 60); timeout arms at 20 + 100
      ms.addData(("s", 10L, 1L, 10L), ("s", 20L, 2L, 60L))
      q.processAllAvailable()
      // b2: w pushes the watermark to 10000, far past s's timeout
      ms.addData(("w", 10000L, 1L, 10L))
      q.processAllAvailable()
      // b3: a data-less batch for s — its timeout fires here
      ms.addData(("w", 10010L, 2L, 10L))
      q.processAllAvailable()
      // b4: s re-arrives BELOW the threshold — with the old prev=60
      // still held this would be a 'down' edge; a retired series
      // re-trains instead, so the first sample back emits nothing
      ms.addData(("s", 10020L, 3L, 5L))
      q.processAllAvailable()
      val live = spark.sql("SELECT series, ts, direction FROM cross_evict")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(live === Set(("s", 20L, "up")), live.toString)
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
      // and the re-trained series alerts again on its next real edge
      ms.addData(("s", 10030L, 4L, 70L))
      q.processAllAvailable()
      val after = spark.sql("SELECT series, ts, direction FROM cross_evict")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(after === Set(("s", 20L, "up"), ("s", 10030L, "up")), after.toString)
    } finally q.stop()
  }

  test("streaming SLO burn evicts a series once the watermark clears its long window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingSloBurn(
      ms.toDF().toDF("series", "ts", "pid", "val"), threshold = 10L,
      shortWin = 60L, longWin = 120L, maxLateness = 0L)
      .writeStream.outputMode("append").format("memory")
      .queryName("slo_evict").start()
    try {
      // b1: s pages twice (every bad sample burns with budget 1%);
      // positive base — ts 0 would sit at the initial watermark
      ms.addData(("s", 1000000L, 1L, 20L), ("s", 1000030L, 2L, 20L))
      q.processAllAvailable()
      // b2: w pushes the watermark far past s's 30 + 120 timeout
      ms.addData(("w", 1100000L, 1L, 0L))
      q.processAllAvailable()
      // b3: a data-less batch for s — eviction fires
      ms.addData(("w", 1100010L, 2L, 0L))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
      // b4: s re-arrives — a FRESH window (short_n = long_n = 1), not
      // the stale pairs, proves the held samples were dropped
      ms.addData(("s", 1100020L, 3L, 20L))
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT ts, short_bad, short_n, long_bad, long_n FROM slo_evict WHERE series = 's'")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(live === Set((1000000L, 1L, 1L, 1L, 1L),
        (1000030L, 2L, 2L, 2L, 2L),
        (1100020L, 1L, 1L, 1L, 1L)), live.toString)
    } finally q.stop()
  }

  test("streaming CUSUM fires exactly where batch does: mid-window split, reset carried across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // baseline buckets 0-3 = 10,14,10,14 (mu=12, sg=2, k*sg=1,
    // h*sg=4); drift buckets 4-12 = 15 → S⁺ walks 2,4,6: an alarm
    // (and reset) at every third drift bucket: 6, 9, 12
    val vals = Seq(10L, 14L, 10L, 14L) ++ Seq.fill(9)(15L)
    val pts = vals.zipWithIndex.map { case (v, b) =>
      ("c", b * 10L + 1L, b.toLong, v) }
    // bucket 13 seals bucket 12 for the stream; batch scores it too
    // (S⁺ = max(0, 12-12-1) = 0 → no alarm), so the sets agree
    val sentinel = ("c", 131L, 99L, 12L)
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingCusum(
      ms.toDF().toDF("series", "ts", "pid", "val"), lastN = 20,
      base = 4, k = 0.5, h = 2.0, minBuckets = 6, bucketSec = 10L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cusum_live").start()
    try {
      // split right after bucket 8 (S⁺ = 4, mid-accumulation, one
      // reset already behind): both the post-alarm reset at 6 and the
      // in-flight S⁺ must carry into the next micro-batch's walk
      ms.addData(pts.take(9): _*)
      q.processAllAvailable()
      ms.addData(pts.drop(9) :+ sentinel: _*)
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT series, bucket, side, s_sigma_q6 FROM cusum_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val batch = graft.engine.Anomaly.cusum(
        (pts :+ sentinel).toDF("series", "ts", "pid", "val"), lastN = 20,
        base = 4, k = 0.5, h = 2.0, minBuckets = 6, bucketSec = 10L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(live === batch, s"live=$live batch=$batch")
      assert(live === Set(("c", 6L, 1L, 3000000L), ("c", 9L, 1L, 3000000L),
        ("c", 12L, 1L, 3000000L)), live.toString)
      // no duplicate emissions: bucket 6's alarm appeared once even
      // though the second batch's walk re-crossed it
      assert(spark.sql("SELECT count(*) FROM cusum_live").head.getLong(0) === 3L)
    } finally q.stop()
  }

  test("streaming CUSUM evicts an idle series once the watermark clears its window; re-arrival re-trains") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val vals = Seq(10L, 14L, 10L, 14L) ++ Seq.fill(5)(15L)
    val pts = vals.zipWithIndex.map { case (v, b) =>
      ("c", b * 10L + 1L, b.toLong, v) }
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.Anomaly.streamingCusum(
      ms.toDF().toDF("series", "ts", "pid", "val"), lastN = 20,
      base = 4, k = 0.5, h = 2.0, minBuckets = 6, bucketSec = 10L,
      maxLateness = 0L) // default idleEvict = 20 buckets = 200 s
      .writeStream.outputMode("append").format("memory")
      .queryName("cusum_evict").start()
    try {
      // b1: sealed buckets 0..7 walk and fire at bucket 6
      ms.addData(pts: _*)
      q.processAllAvailable()
      // b2: w pushes the watermark far past c's 81 + 200 timeout
      ms.addData(("w", 100000L, 1L, 10L))
      q.processAllAvailable()
      // b3: a data-less batch for c — eviction fires
      ms.addData(("w", 100010L, 2L, 10L))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
      // b4: c re-arrives and RE-TRAINS — one bucket of fresh state,
      // far below minBuckets, so no alarm can fire from stale sums
      ms.addData(("c", 100020L, 99L, 1000L))
      q.processAllAvailable()
      val live = spark.sql("SELECT series, bucket, side FROM cusum_evict")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(live === Set(("c", 6L, 1L)), live.toString)
    } finally q.stop()
  }

  test("streaming counter increase evicts an idle series; the sample back emits nothing") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = graft.engine.CounterRate.streamingIncrease(
      ms.toDF().toDF("series", "ts", "pid", "val"),
      idleEvict = 100L, maxLateness = 0L)
      .writeStream.outputMode("append").format("memory")
      .queryName("inc_evict").start()
    try {
      ms.addData(("s", 10L, 1L, 100L), ("s", 20L, 2L, 130L)) // +30
      q.processAllAvailable()
      ms.addData(("w", 10000L, 1L, 1L))
      q.processAllAvailable()
      ms.addData(("w", 10010L, 2L, 2L)) // s's timeout (120) fires
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
      // with prev=130 still held this would read as a reset (emit 5);
      // a retired series restarts its lag instead
      ms.addData(("s", 10020L, 3L, 5L))
      q.processAllAvailable()
      val live = spark.sql("SELECT series, ts, increase FROM inc_evict")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(live === Set(("s", 20L, 30L), ("w", 10010L, 1L)), live.toString)
    } finally q.stop()
  }

  test("streaming Holt residual alert fires exactly where batch does; warmup carries across a batch split") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Double)]
    val q = graft.engine.Forecast.streamingHoltResidual(
      ms.toDF().toDF("series", "ts", "pid", "val"),
      lastN = 64, k = 4.0, minWarm = 8)
      .writeStream.outputMode("update").format("memory")
      .queryName("resid_live").start()
    def batchOf(pts: Seq[(String, Long, Long, Double)]) =
      graft.engine.Forecast.holtResidualAnomaly(
        pts.toDF("series", "ts", "pid", "val"),
        lastN = 64, k = 4.0, minWarm = 8).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    try {
      // "s" completes warmup in batch 1; "t" splits its warmup across
      // the batches (the carried buffer must rebuild the scale)
      val b1 = (0 until 11).map(i => ("s", i.toLong, i.toLong, 10.0)) ++
        (0 until 6).map(i => ("t", i.toLong, i.toLong, 20.0))
      ms.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM resid_live").count() === 0L,
        "no alert may fire during warmup")
      assert(batchOf(b1).isEmpty)
      val b2 = Seq(("s", 11L, 11L, 100.0)) ++
        (6 until 11).map(i => ("t", i.toLong, i.toLong, 20.0)) :+
        (("t", 11L, 11L, 120.0))
      ms.addData(b2: _*)
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT series, ts, forecast_q6, resid_q6 FROM resid_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(live === batchOf(b1 ++ b2), s"live $live")
      assert(live === Set(("s", 11L, 10000000L, 90000000L),
        ("t", 11L, 20000000L, 100000000L)))
      // a third batch touching t re-walks a window that still holds
      // the flagged spike — emit-once: the alarm must NOT re-fire
      // (t@12 forecast 82.5 vs 82.0 is a sub-scale residual, no flag
      // in batch either)
      ms.addData(("t", 12L, 12L, 82.0))
      q.processAllAvailable()
      val after = spark.sql(
        "SELECT series, ts, forecast_q6, resid_q6 FROM resid_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(after.toSet === batchOf(b1 ++ b2 :+ (("t", 12L, 12L, 82.0))))
      assert(after.length === 2,
        s"an alarm re-fired on a later touch: ${after.toSeq}")
      // a same-second HIGHER-PID arrival is NEW under the buffer's
      // (ts, pid) order — the emit-once horizon must not swallow it
      val b4 = ("t", 12L, 13L, 200.0)
      ms.addData(b4)
      q.processAllAvailable()
      val fin = spark.sql(
        "SELECT series, ts, forecast_q6, resid_q6 FROM resid_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(fin.toSet === batchOf(b1 ++ b2 ++ Seq(
        ("t", 12L, 12L, 82.0), b4)))
      assert(fin.length === 3,
        s"the same-second spike must emit exactly once: ${fin.toSeq}")
    } finally q.stop()
  }

  test("streaming Holt residual alert evicts an idle series; a lone re-arrival alerts nothing") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Double)]
    val q = graft.engine.Forecast.streamingHoltResidual(
      ms.toDF().toDF("series", "ts", "pid", "val"),
      lastN = 8, k = 4.0, minWarm = 2,
      idleEvict = 100L, maxLateness = 0L)
      .writeStream.outputMode("update").format("memory")
      .queryName("resid_evict").start()
    try {
      ms.addData(("s", 10L, 1L, 10.0), ("s", 20L, 2L, 20.0))
      q.processAllAvailable()
      // the watermark passes s's idle horizon: its buffer retires
      ms.addData(("w", 10000L, 1L, 1.0))
      q.processAllAvailable()
      ms.addData(("w", 10010L, 2L, 1.0))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
      // a retired series re-trains: one sample = no evaluation, no
      // alert — and no stale pre-eviction scale resurrects
      ms.addData(("s", 10020L, 3L, 500.0))
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT * FROM resid_evict WHERE series = 's'").count() === 0L)
    } finally q.stop()
  }

  test("streaming Holt evicts an idle series; re-arrival re-trains from its own samples") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Double)]
    val q = graft.engine.Forecast.streamingHolt(
      ms.toDF().toDF("series", "ts", "pid", "val"), lastN = 8,
      idleEvict = 100L, maxLateness = 0L)
      .writeStream.outputMode("update").format("memory")
      .queryName("holt_evict").start()
    try {
      ms.addData(("s", 10L, 1L, 10.0), ("s", 20L, 2L, 20.0))
      q.processAllAvailable()
      ms.addData(("w", 10000L, 1L, 1.0))
      q.processAllAvailable()
      ms.addData(("w", 10010L, 2L, 1.0))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
      // re-arrival: n_samples restarts at 1 — the old buffer is gone
      ms.addData(("s", 10020L, 3L, 50.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT n_samples, last_ts, forecast_q6 FROM holt_evict " +
          "WHERE series = 's' ORDER BY last_ts DESC LIMIT 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
      assert(last === ((1L, 10020L, 50000000L)),
        s"a retired series re-trains from scratch: $last")
    } finally q.stop()
  }

  test("streaming Holt-Winters evicts an idle series once the watermark clears its window span") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val B = 3600000L
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.engine.Forecast.streamingHoltWinters(
      ms.toDF().toDF("series", "ts", "val"),
      bucket = 3600L, lastN = 4, m = 2, maxLateness = 0L)
      // default idleEvict = lastN * bucket = 14400 s of silence
      .writeStream.outputMode("update").format("memory")
      .queryName("hw_evict").start()
    try {
      ms.addData(("s", B, 10L), ("s", B + 3600L, 20L),
        ("s", B + 7200L, 12L), ("s", B + 10800L, 22L))
      q.processAllAvailable()
      // w pushes the watermark far past s's (B+10800) + 14400 timeout
      ms.addData(("w", B + 10000000L, 1L))
      q.processAllAvailable()
      ms.addData(("w", B + 10000100L, 1L))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2L, s"state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("streaming boilerplate: arrivals flag against the standing index; an index refresh flips a line between runs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // seen corpus: the cookie banner repeats in 2 docs (df 2), the
    // motto appears once (df 1 — below the minDf 2 threshold)
    val seen1 = Seq(
      (1L, "cookie banner\nreal text one"),
      (2L, "cookie banner\nreal text two"),
      (3L, "our motto\nreal text three")).toDF("doc_id", "text")
    val idx1 = graft.llm.TextStats.boilerplateIndex(seen1)
    val arrival = (100L, "cookie banner\nour motto\nfresh line")
    val ms = MemoryStream[(Long, String)]
    val q = graft.llm.TextStats.streamingBoilerplate(
        ms.toDF().toDF("doc_id", "text"), idx1)
      .writeStream.outputMode("append").format("memory")
      .queryName("bp_live").start()
    try {
      ms.addData(arrival)
      q.processAllAvailable()
      val got = spark.sql("SELECT line, df, is_boilerplate FROM bp_live")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(got === Set(
        ("cookie banner", 2L, true), // seen-corpus banner flags live
        ("our motto", 1L, false),    // sub-threshold df passes
        ("fresh line", 0L, false)),  // never-seen line passes
        got.toString)
      // micro-batch parity: the same docs through the same scorer as
      // a plain batch frame produce identical rows
      val batch = graft.llm.TextStats.streamingBoilerplate(
          Seq(arrival).toDF("doc_id", "text"), idx1)
        .collect().map(r => (r.getString(2), r.getLong(3), r.getBoolean(4)))
        .toSet
      assert(batch === got, s"live=$got batch=$batch")
      // stateless by construction: a broadcast probe holds no state
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static boilerplate must not create a state store")
    } finally q.stop()
    // the operational loop: the motto has since repeated in a DELTA,
    // the daily job MERGES the delta's counts into the standing index
    // (mergeBoilerplateIndex — no corpus re-read), the stream
    // restarts against it — the SAME arrival now flags the motto
    val delta = Seq((4L, "our motto\nmore text")).toDF("doc_id", "text")
    val idx2 = graft.llm.TextStats.mergeBoilerplateIndex(idx1, delta)
    // the merge IS the rebuild over seen ∪ delta (disjoint doc_ids)
    val rebuilt = graft.llm.TextStats.boilerplateIndex(
        seen1.unionAll(delta))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(idx2.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === rebuilt, "merged index must equal the full rebuild")
    val ms2 = MemoryStream[(Long, String)]
    val q2 = graft.llm.TextStats.streamingBoilerplate(
        ms2.toDF().toDF("doc_id", "text"), idx2)
      .writeStream.outputMode("append").format("memory")
      .queryName("bp_live2").start()
    try {
      ms2.addData(arrival)
      q2.processAllAvailable()
      val got2 = spark.sql("SELECT line, is_boilerplate FROM bp_live2")
        .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
      assert(got2 === Set(("cookie banner", true), ("our motto", true),
        ("fresh line", false)), got2.toString)
    } finally q2.stop()
  }
}
