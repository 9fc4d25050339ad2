package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{SeriesMath, UserStats}

/** Pins the cross-series arithmetic and user-activity semantics:
  * share quantization and zero-total drop, lag alignment direction,
  * full-window-only changepoints, and the trailing-WAU day algebra. */
class SeriesMathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shareOfTotal: family shares sum via truncating DIV; zero-total bucket dropped") {
    val pts = Seq(
      ("i.a.1", 100L, 1L, 30L), ("i.a.2", 200L, 2L, 70L), // family i.a, bucket 0
      ("i.b.1", 100L, 3L, 5L),                            // singleton family
      ("i.z.1", 100L, 4L, 5L), ("i.z.2", 200L, 5L, -5L)   // total 0 -> dropped
    ).toDF("series", "ts", "pid", "val")
    val out = SeriesMath.shareOfTotal(pts, bucket = 3600L).collect()
      .map(r => r.getString(1) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("i.a.1") === ((30L, 100L, 300000L)))
    assert(out("i.a.2") === ((70L, 100L, 700000L)))
    assert(out("i.b.1") === ((5L, 5L, 1000000L)), "singleton owns its family")
    assert(!out.contains("i.z.1") && !out.contains("i.z.2"),
      "zero-total family bucket must be dropped")
  }

  test("laggedPearson: impulse pair peaks exactly at the shift between them") {
    // a fires at bucket 10, b at bucket 11 — one bucket later. The
    // join aligns a.bucket = b.bucket - lag, so the peak is lag = +1.
    val pts = (0 until 30).flatMap { i =>
      Seq(("g.m.a", i * 3600L, i.toLong, if (i == 10) 100L else 0L),
        ("g.m.b", i * 3600L, 100L + i, if (i == 11) 100L else 0L))
    }.toDF("series", "ts", "pid", "val")
    val out = SeriesMath.laggedPearson(pts, bucket = 3600L, maxLag = 2,
        minBuckets = 10L).collect()
      .map(r => r.getLong(2) -> r.getLong(4)).toMap
    // r = 1 mathematically; sqrt(dx)·sqrt(dy) rounds a hair above dx
    // in IEEE, so the floor-quantized read is 999999 — the SAME fixed
    // op sequence both engines run, which is what the oracle pins
    assert(out(1L) >= 999999L, s"aligned impulses must read r≈1: $out")
    assert(out.filter(_._1 != 1L).values.forall(_ < out(1L)),
      s"every other lag must score below the true shift: $out")
  }

  test("meanShift: only full-window boundaries score; flat series silent") {
    // 12 buckets at 10 then 12 at 20: the single boundary with 12 full
    // buckets on BOTH sides is bucket 12 (before 120, after 240).
    val step = (0 until 24).map(i =>
      ("s", i * 3600L, i.toLong, if (i < 12) 10L else 20L))
    val flat = (0 until 24).map(i => ("f", i * 3600L, 100L + i, 10L))
    val out = SeriesMath.meanShift((step ++ flat)
        .toDF("series", "ts", "pid", "val"),
      bucket = 3600L, k = 12, relPct = 30L).collect()
    assert(out.length === 1, s"exactly one boundary qualifies: ${out.toSeq}")
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (("s", 12L, 120L, 240L, 120L)))
  }

  test("acf: period-2 alternation peaks at even lags, troughs at odd") {
    val pts = (0 until 40).map(i =>
      ("s", i * 3600L, i.toLong, if (i % 2 == 0) 10L else 0L))
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.SeriesMath.acf(pts, bucket = 3600L, maxLag = 4,
        minBuckets = 10L).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(2L) >= 999999L && out(4L) >= 999999L, s"even lags ≈ +1: $out")
    assert(out(1L) <= -999000L && out(3L) <= -999000L, s"odd lags ≈ -1: $out")
  }

  test("tukeyOutliers: exact lower-element quartiles, 1.5·IQR fences") {
    // vals 10..29 (n=21 with the outlier): q1 = 6th element = 15,
    // q3 = 16th = 25, IQR 10 -> upper fence 40: only 1000 flags
    val pts = ((0 until 20).map(i => ("s", i * 10L, i.toLong, 10L + i)) :+
      (("s", 999L, 99L, 1000L))).toDF("series", "ts", "pid", "val")
    val out = graft.engine.Anomaly.tukeyOutliers(pts).collect()
    assert(out.length === 1, out.toSeq.toString)
    val r = out.head
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((1000L, 15L, 25L)))
  }

  test("lifecycle: new / retained (≤7d gap) / resurrected split") {
    val ev = Seq(
      (1L, 100L, "a"),                 // day 0: new
      (1L, 3L * 86400L, "a"),          // day 3: retained (gap 3)
      (2L, 3L * 86400L + 5L, "a"),     // day 3: new
      (1L, 20L * 86400L, "a")          // day 20: resurrected (gap 17)
    ).toDF("user_id", "ts", "event_type")
    val out = UserStats.lifecycle(ev, gapDays = 7L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L) === ((1L, 0L, 0L)))
    assert(out(3L) === ((1L, 1L, 0L)))
    assert(out(20L) === ((0L, 0L, 1L)))
  }

  test("anomalyIntervals: adjacent anomalies merge; a distant one opens a new incident") {
    // hour-0 cell: ten 99s + ten 101s (med 101, mad 2 — ordinary
    // points never flag) + three spikes; maxGap 600 merges the first
    // two spikes (gap 500) and isolates the third (gap 2000)
    val base = (0 until 20).map(i =>
      ("s", 10L * i, i.toLong, if (i % 2 == 0) 99L else 101L))
    val spikes = Seq(("s", 1000L, 50L, 200L), ("s", 1500L, 51L, 210L),
      ("s", 3500L, 52L, 220L))
    val out = graft.engine.Anomaly.anomalyIntervals(
      (base ++ spikes).toDF("series", "ts", "pid", "val"), maxGap = 600L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(out === Set((1000L, 1500L, 2L), (3500L, 3500L, 1L)), out.toString)
  }

  test("meanShift: an idle gap never stitches two regimes into one window") {
    // 24 buckets at 10, a 6-bucket hole, 24 buckets at 20: the only
    // boundary with 24 rows each side SPANS the gap — must not score
    val pts = ((0 until 24).map(i => ("g", i * 3600L, i.toLong, 10L)) ++
      (30 until 54).map(i => ("g", i * 3600L, i.toLong, 20L)))
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.SeriesMath.meanShift(pts, bucket = 3600L,
      k = 24, relPct = 30L).collect()
    assert(out.isEmpty, s"gap-spanning windows must not score: ${out.toSeq}")
  }

  test("tukeyOutliers: maxCell guard faults loudly on an oversized series") {
    val pts = (0 until 50).map(i => ("big", i.toLong, i.toLong, i.toLong))
      .toDF("series", "ts", "pid", "val")
    val e = intercept[graft.parser.QueryError] {
      graft.engine.Anomaly.tukeyOutliers(pts, maxCell = 10L).collect()
    }
    assert(e.getMessage.contains("maximum number of selected points"))
  }

  test("robustZ/anomalyIntervals: maxCell guard faults on an oversized (series, hour) cell, passes under it") {
    // 50 points all inside one hour → one (series, hour) cell of 50
    val pts = (0 until 50).map(i => ("big", i.toLong, i.toLong, i.toLong))
      .toDF("series", "ts", "pid", "val")
    val e = intercept[graft.parser.QueryError] {
      graft.engine.Anomaly.robustZ(pts, maxCell = 10L).collect()
    }
    assert(e.getMessage.contains("maximum number of selected points"))
    val e2 = intercept[graft.parser.QueryError] {
      graft.engine.Anomaly.anomalyIntervals(pts, maxCell = 10L).collect()
    }
    assert(e2.getMessage.contains("maximum number of selected points"))
    // under the cap both run clean
    assert(graft.engine.Anomaly.robustZ(pts, maxCell = 100L)
      .collect().length == 50)
    graft.engine.Anomaly.anomalyIntervals(pts, maxCell = 100L).collect()
  }

  test("stickiness: trailing-7d WAU; only active days emitted") {
    val ev = Seq(
      (1L, 100L, "view"), (2L, 200L, "view"),       // day 0: users 1, 2
      (1L, 86400L + 5L, "view"),                    // day 1: user 1
      (3L, 8L * 86400L + 9L, "view")                // day 8: user 3
    ).toDF("user_id", "ts", "event_type")
    val out = UserStats.stickiness(ev, windowDays = 7).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L) === ((2L, 2L, 1000000L)))
    assert(out(1L) === ((1L, 2L, 500000L)), "day 0 actives still in the week")
    assert(out(8L) === ((1L, 1L, 1000000L)), "day 0/1 fell out of [2, 8]")
    assert(out.size === 3, "inactive days must not be emitted")
  }

  test("psiDrift: identical halves read exactly 0; a shifted band reads positive") {
    val same = (0 until 10).map(i => ("same", i * 10L, i.toLong, 100L))
    val shift = (0 until 5).map(i => ("shift", i * 10L, 100L + i, 100L)) ++
      (5 until 10).map(i => ("shift", i * 10L, 100L + i, 10000L))
    val out = graft.engine.SeriesMath.psiDrift(
      (same ++ shift).toDF("series", "ts", "pid", "val"), binWidth = 5000L)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("same") === ((1L, 0L)), "no drift must read exactly 0")
    assert(out("shift")._1 === 2L && out("shift")._2 > 0L, out.toString)
  }

  test("trendSlope: exact OLS per bucket; degenerate time axis dropped") {
    val pts = Seq(
      ("s", 0L, 1L, 0L), ("s", 1L, 2L, 2L), ("s", 2L, 3L, 4L), // slope 2
      ("f", 0L, 1L, 7L), ("f", 5L, 2L, 7L),                    // flat: 0
      ("d", 9L, 1L, 1L), ("d", 9L, 2L, 5L)                     // den 0: out
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.SeriesMath.trendSlope(pts, bucket = 21600L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out === Map("s" -> 2000000L, "f" -> 0L))
  }

  test("rollupPyramid: each level recomposes exactly from the one below") {
    val pts = Seq(("s", 10L, 1L, 1L), ("s", 20L, 2L, 5L),
      ("s", 6L * 3600L + 1L, 3L, 2L)).toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats.rollupPyramid(pts).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(("1h", 0L)) === ((2L, 6L, 1L, 5L)))
    assert(out(("1h", 6L * 3600L)) === ((1L, 2L, 2L, 2L)))
    assert(out(("6h", 0L)) === ((2L, 6L, 1L, 5L)))
    assert(out(("6h", 21600L)) === ((1L, 2L, 2L, 2L)))
    assert(out(("1d", 0L)) === ((3L, 8L, 1L, 5L)))
    assert(out.size === 5)
  }

  test("heavyValueBins: exactly the true heavy set; negative values floor-bin") {
    val pts = ((0 until 7).map(i => ("s", i.toLong, i.toLong, 100L)) ++
      Seq(("s", 7L, 7L, 5200L), ("s", 8L, 8L, 5300L), ("s", 9L, 9L, 10100L)) ++
      Seq(("n", 0L, 10L, -1L), ("n", 1L, 11L, -1L), ("n", 2L, 12L, -1L),
        ("n", 3L, 13L, 100L))
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.HeavyHitters.heavyValueBins(pts,
      binWidth = 5000L, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // s: bin 0 at 7/10 (21 > 10 qualifies); bin 1 at 2/10 (6 < 10) out
    // n: bin -1 at 3/4 (9 > 4); bin 0 at 1/4 out
    assert(out === Map(("s", 0L) -> ((7L, 10L)), ("n", -1L) -> ((3L, 4L))))
  }

  test("langIdEval: confusion matrix of prediction vs label") {
    val docs = Seq(
      (1L, "the of and", "en", "src", 10L),
      (2L, "der und ist", "en", "src", 11L),
      (3L, "el la y los", "es", "src", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.llm.TextStats.langIdEval(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("en", "en") -> 1L, ("en", "de") -> 1L,
      ("es", "es") -> 1L))
  }

  test("sessionStats: gap splits sessions; ts ties stay in one session") {
    val ev = Seq((1L, 0L, "a"), (1L, 100L, "b"), (1L, 100L, "c"),
      (1L, 5000L, "d"), (2L, 9L, "a")).toDF("user_id", "ts", "event_type")
    val out = graft.engine.UserStats.sessionStats(ev, gap = 1800L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(1L -> ((2L, 4L, 100L)), 2L -> ((1L, 1L, 0L))))
  }

  test("cohortLtv: pre-cohort and cohortless revenue dropped; cumulative per cohort") {
    val wk = 604800L
    val ev = Seq(
      (1L, 0L, "signup", 0L),
      (1L, 100L, "purchase", 100L),          // cohort 0, week 0
      (1L, wk + 5L, "purchase", 200L),       // cohort 0, week 1
      (2L, 50L, "purchase", 999L),           // never signed up: dropped
      (3L, wk + 1L, "signup", 0L),
      (3L, 10L, "purchase", 888L)            // pre-cohort: dropped
    ).toDF("user_id", "ts", "event_type", "cents")
    val out = UserStats.cohortLtv(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === Map((0L, 0L) -> ((1L, 100L, 100L)),
      (0L, 1L) -> ((1L, 200L, 300L))))
  }

  test("rfm: quintiles with user tiebreaks; equal frequency ranks by user id") {
    val ev = (1 to 5).map(i =>
      (i.toLong, 100L * i, "purchase", 10L * i))
      .toDF("user_id", "ts", "event_type", "cents")
    val out = UserStats.rfm(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    // 5 users, 5 buckets: recency and monetary rank by the metric,
    // frequency (all 1) falls back to the user_id tiebreak
    (1 to 5).foreach { i =>
      assert(out(i.toLong) === ((i.toLong, i.toLong, i.toLong, 111L * i)),
        s"user $i: ${out(i.toLong)}")
    }
  }

  test("powerCurve: distinct active-day histogram, repeats collapse") {
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 86400L + 1L, "a"), // user 1: 2 days
      (2L, 30L, "a"),                                          // user 2: 1 day
      (3L, 5L * 86400L, "a"), (3L, 6L * 86400L, "a"),
      (3L, 7L * 86400L, "a")                                   // user 3: 3 days
    ).toDF("user_id", "ts", "event_type")
    val out = UserStats.powerCurve(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("sloBurn: long window suppresses short blips; sustained burn alerts from the exact boundary") {
    // 100 good samples then 50 bad, one per minute: the short (1h)
    // window crosses 14.4% at bad #9 but the long (6h) window only at
    // bad #17 — the multi-window AND is the blip filter
    val pts = (0 until 150).map(i =>
      ("svc", i * 60L, i.toLong, if (i >= 100) 20000L else 0L)) ++
      (0 until 150).map(i => ("quiet", i * 60L, (1000 + i).toLong, 0L))
    val out = graft.engine.Anomaly.sloBurn(
      pts.toDF("series", "ts", "pid", "val"), threshold = 10000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(out.forall(_._1 == "svc"), "an all-good series never alerts")
    assert(out.length === 34, s"expected bads 16..49 to alert: ${out.length}")
    assert(out.head._2 === 116L * 60L,
      s"first alert at the long-window boundary: ${out.head}")
  }

  test("seasonalStrength: hour-determined series reads R²=1 exactly; constant series dropped") {
    val diurnal = (0 until 48).map(i =>
      ("day", i * 3600L, i.toLong, (i % 24).toLong))
    val flat = (0 until 48).map(i =>
      ("flat", i * 3600L, (100 + i).toLong, 7L))
    val out = graft.engine.SeriesMath.seasonalStrength(
      (diurnal ++ flat).toDF("series", "ts", "pid", "val"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("day" -> 1000000L),
      s"hour explains everything; a constant has no variance: $out")
  }

  test("thresholdEta: a perfect 10/hour line hits cap 300 in exactly 10 hours; falling series dropped") {
    val rising = (0 to 10).map(i =>
      ("up", i * 3600L, i.toLong, 100L + 10L * i))
    val falling = (0 to 10).map(i =>
      ("down", i * 3600L, (100 + i).toLong, 300L - 10L * i))
    val out = graft.engine.SeriesMath.thresholdEta(
      (rising ++ falling).toDF("series", "ts", "pid", "val"), cap = 300L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("up", 10000000L, 10000L)),
      s"slope 10.000000/h, ETA 10.000 h, no row for the falling series: ${out.toSeq}")
  }

  test("thresholdEta: only the trailing window is fitted — ancient flat history cannot dilute the recent trend") {
    // 1000 h of flat 100s, then a clean 10/h ramp over the last 11 h.
    // A lifetime fit would blend the ramp with the flat era (slope
    // far below 10/h); the trailing 720 h window still SEES 709 h of
    // the flat era, so shrink the window to 10 h and the fit must be
    // the pure ramp: slope exactly 10/h, cap 300 hit in 10 h from the
    // last point (val 200). n must count only in-window points (11).
    val pts = ((0 until 1000).map(i => ("s", i * 3600L, i.toLong, 100L)) ++
      (0 to 10).map(i => ("s", (1000 + i) * 3600L, (1000 + i).toLong,
        100L + 10L * i))).toDF("series", "ts", "pid", "val")
    val out = graft.engine.SeriesMath.thresholdEta(pts, cap = 300L,
      windowHours = 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("s", 11L, 10000000L, 10000L)),
      s"pure ramp fit over 11 in-window points: ${out.toSeq}")
  }

  test("abTest: pooled two-proportion z matches the hand computation; universal goal has no variance") {
    val ev = Seq(
      (1L, 10L, "visit"), (2L, 10L, "visit"), (3L, 10L, "visit"), (4L, 10L, "visit"),
      (1L, 20L, "buy"), (3L, 20L, "buy"), (2L, 20L, "buy"))
      .toDF("user_id", "ts", "event_type")
    val out = UserStats.abTest(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // arms: 0 = {2,4}, 1 = {1,3}; buy: c0=1 (u2), c1=2 (u1,u3)
    // z = (1 - 0.5)/sqrt(0.75·0.25·(1/2+1/2)) = 1.1547005…
    assert(out("buy") === ((2L, 1L, 2L, 2L, Some(1154700L))), out.toString)
    assert(out("visit") === ((2L, 2L, 2L, 2L, None)),
      "everyone converts: pooled p = 1 has no variance, z is NULL")
    // minCount raises the conversion bar: only u1 bought twice
    val ev2 = ev.union(Seq((1L, 30L, "buy")).toDF("user_id", "ts", "event_type"))
    val strict = UserStats.abTest(ev2, minCount = 2L).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(strict("buy") === ((0L, 1L, Some(1154700L))),
      s"c0=0, c1=1 (u1 only): $strict")
  }

  test("abPower: hand-computed MDE and required n; degenerate goals read NULL") {
    val ev = Seq(
      (1L, 10L, "visit"), (2L, 10L, "visit"), (3L, 10L, "visit"), (4L, 10L, "visit"),
      (1L, 20L, "buy"), (3L, 20L, "buy"), (2L, 20L, "buy"))
      .toDF("user_id", "ts", "event_type")
    val out = UserStats.abPower(ev).collect()
      .map(r => r.getString(0) -> ((6 to 10).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))))).toMap
    val zs = 1.959964 + 0.841621
    // buy: p0 = 1/2, p1 = 2/2 → effect 0.5; mde = zs·sqrt(.25·1) = zs/2;
    // n = ceil(zs²·(0.25 + 0)/0.25) = ceil(zs²) = 8
    assert(out("buy") === Seq(Some(500000L), Some(1000000L), Some(500000L),
      Some(math.floor(zs * 0.5 * 1e6).toLong), Some(math.ceil(zs * zs).toLong)))
    // visit: both arms fully convert — zero baseline variance (mde
    // NULL) and zero effect (n_required NULL)
    assert(out("visit") === Seq(Some(1000000L), Some(1000000L), Some(0L),
      None, None))
  }

  test("abPower: an empty arm reads n=0 and NULL everywhere derived, never NaN or a fault") {
    // all user_ids even → arm 1 is empty; the oracle's
    // sum(CASE..ELSE 0) reads 0 there, so the Spark side must too
    val ev = Seq((2L, 10L, "buy"), (4L, 20L, "buy"))
      .toDF("user_id", "ts", "event_type")
    val row = UserStats.abPower(ev).collect()
    assert(row.length === 1)
    val r = row.head
    assert(r.getLong(1) === 2L && r.getLong(3) === 0L, "n0=2, n1=0")
    // z, p1, effect, mde, n_required are all NULL on the empty arm
    assert(Seq(5, 7, 8, 9, 10).forall(r.isNullAt),
      s"empty-arm derived columns must be NULL: $r")
    assert(r.getLong(6) === 1000000L, "p0 is still real")
  }
}
