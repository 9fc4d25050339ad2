package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Anomaly, MovingAgg}

/** Pins the edge semantics of the alerting/rolling analytics ops:
  * short heads, per-series isolation, sd-0 cells, and that crossings
  * emit TRANSITIONS only. */
class TsAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("trailing: heads shorter than k aggregate over what exists; series isolated") {
    val pts = Seq(
      ("a", 10L, 1L, 2L), ("a", 20L, 2L, 4L), ("a", 30L, 3L, 6L),
      ("b", 10L, 4L, 100L)
    ).toDF("series", "ts", "pid", "val")
    val out = MovingAgg.trailing(pts, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // head: window of 1; then sliding pairs; avg floor-quantized ×1e9
    assert(out(("a", 10L)) === ((2L, 2L, 2L, 2000000000L)))
    assert(out(("a", 20L)) === ((6L, 2L, 4L, 3000000000L)))
    assert(out(("a", 30L)) === ((10L, 4L, 6L, 5000000000L)))
    assert(out(("b", 10L)) === ((100L, 100L, 100L, 100000000000L)),
      "b must not see a's window")
  }

  test("trailingTime: RANGE window adapts to density; ts-peers share one frame") {
    val pts = Seq(
      ("s", 0L, 1L, 1L), ("s", 1800L, 2L, 2L), ("s", 3600L, 3L, 4L),
      ("s", 7000L, 4L, 8L), ("s", 7000L, 5L, 16L) // ts-peers
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.MovingAgg.trailingTime(pts, horizon = 3600L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap
    assert(out((3600L, 3L)) === 6L, "ts 0 just fell out of [1, 3600]")
    assert(out((7000L, 4L)) === 28L, "both peers + ts 3600 in frame")
    assert(out((7000L, 5L)) === 28L, "peer rows see the identical frame")
  }

  test("seasonalZ: same value anomalous at a tight hour, normal at a spread hour; sd-0 cell never flags") {
    // hour 0 (ts 0..3599): twenty 100s and one 150 → 150 is >3σ out.
    // hour 1 (ts 3600..7199): values spread 0..200, 150 is ordinary.
    // hour 2: a single point → sd 0 → never an anomaly.
    val h0 = (0 until 20).map(i => ("s", 10L * i, i.toLong, 100L)) :+
      (("s", 3000L, 98L, 150L))
    val h1 = (0 until 21).map(i => ("s", 3600L + 10L * i, 200L + i, i * 10L))
    val h2 = Seq(("s", 7200L, 400L, 999L))
    val out = Anomaly.seasonalZ((h0 ++ h1 ++ h2).toDF("series", "ts", "pid", "val"))
      .collect().map(r => r.getLong(2) -> (r.getLong(5), r.getBoolean(6))).toMap
    assert(out(98L)._2, s"150 among twenty 100s must flag: zq=${out(98L)._1}")
    assert(h1.forall(p => !out(p._3)._2), "spread hour has no anomalies")
    assert(out(400L) === ((0L, false)), "single-point cell: z 0, never flagged")
  }

  test("pairwisePearson: perfect tracker r=+1, inverse r=-1, constant series dropped") {
    // 30 hourly buckets: up = i, dbl = 2i (r=+1), inv = 1000-i (r=-1),
    // flat = 7 (zero variance -> dropped)
    val pts = (0 until 30).flatMap { i =>
      Seq(("up", i * 3600L, i.toLong, i.toLong),
        ("dbl", i * 3600L, 100L + i, 2L * i),
        ("inv", i * 3600L, 200L + i, 1000L - i),
        ("flat", i * 3600L, 300L + i, 7L))
    }.toDF("series", "ts", "pid", "val")
    val out = graft.engine.Correlate.pairwisePearson(pts).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("dbl", "up")) === 1000000L)
    assert(out(("inv", "up")) === -1000000L)
    assert(out(("dbl", "inv")) === -1000000L)
    assert(!out.keySet.exists(k => k._1 == "flat" || k._2 == "flat"),
      "zero-variance series never pairs")
  }

  test("funnel: strict order, window cutoff, out-of-order steps don't count") {
    val ev = Seq(
      // u1: full chain in order, inside the window
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: purchase BEFORE click — depth stops at 2
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // u3: click lands outside the window from t1 — depth 1
      (3L, 10L, "view"), (3L, 10L + 200L, "click"),
      // u4: never viewed — not in the funnel at all
      (4L, 10L, "click"), (4L, 20L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), window = 100L).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out === Map(1L -> 3L, 2L -> 2L, 3L -> 1L), out.toString)
  }

  test("funnelSignificance: per-step pooled z matches the hand computation; empty at-risk arm goes NULL") {
    // arms by user_id % 2: arm 0 = {0, 2}, arm 1 = {1, 3}.
    // Depths: u0 = 1, u2 = 2, u1 = 3, u3 = 2.
    val ev = Seq(
      (0L, 10L, "view"),
      (2L, 10L, "view"), (2L, 20L, "click"),
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (3L, 10L, "view"), (3L, 20L, "click")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.funnelSignificance(ev, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), window = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // step 2: n0=2 c0=1, n1=2 c1=2 → z = 0.5/sqrt(0.75·0.25·1) = 1.1547005
    assert(out(2L) === ((2L, 1L, 2L, 2L, Some(1154700L))), out.toString)
    // step 3: n0=1 c0=0, n1=2 c1=1 → z = 0.5/sqrt((1/3)(2/3)(3/2)) = 0.8660254
    assert(out(3L) === ((1L, 0L, 2L, 1L, Some(866025L))), out.toString)
    // arm-0 users never reach step 1's depth → n0 = 0 at step 2 → NULL z
    val solo = graft.engine.Funnel.funnelSignificance(
      Seq((1L, 10L, "view"), (1L, 20L, "click"))
        .toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), window = 100L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(solo === Map(2L -> None, 3L -> None), solo.toString)
  }

  test("funnel: duplicated step names are rejected loudly") {
    val ev = Seq((1L, 10L, "view")).toDF("user_id", "ts", "event_type")
    val e = intercept[IllegalArgumentException] {
      graft.engine.Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "view"), window = 100L)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("funnelRetry: a stalled first entry retries from later step-1 events (the funnel divergence)") {
    val ev = Seq(
      // u1: first view's chain stalls (click lands outside the 100 s
      // window of t1=10), but the SECOND view at 500 completes the
      // chain — first-entry funnel reports 1, retry reports 3
      (1L, 10L, "view"), (1L, 500L, "view"),
      (1L, 520L, "click"), (1L, 540L, "purchase"),
      // u2: single entry, full chain — both semantics agree on 3
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 30L, "purchase"),
      // u3: both entries stall at depth 2 — best depth is still 2
      (3L, 10L, "view"), (3L, 20L, "click"),
      (3L, 400L, "view"), (3L, 450L, "click"),
      // u4: never viewed — not in the funnel at all
      (4L, 10L, "click"), (4L, 20L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val retry = graft.engine.Funnel.funnelRetry(ev, "user_id", "ts",
      "event_type", steps, window = 100L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(retry === Map(1L -> ((2L, 3L)), 2L -> ((1L, 3L)), 3L -> ((2L, 2L))),
      retry.toString)
    val first = graft.engine.Funnel.funnel(ev, "user_id", "ts",
      "event_type", steps, window = 100L).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(first(1L) === 1L, "first-entry semantics stall where retry completes")
  }

  test("bucketPercentiles: maxCell guard fails loudly on an oversized cell, passes under it") {
    val pts = (0 until 40).map(i => ("s", i.toLong, i.toLong, i.toLong))
      .toDF("series", "ts", "pid", "val")
    val e = intercept[graft.parser.QueryError](
      graft.engine.BucketStats.bucketPercentiles(pts, bucket = 100L,
        pcts = Seq(50), maxCell = 10L))
    assert(e.getMessage.contains("maximum number of selected points"))
    // under the cap the guard is invisible: identical output
    val guarded = graft.engine.BucketStats.bucketPercentiles(pts,
      bucket = 100L, pcts = Seq(50), maxCell = 100L).collect()
    val plain = graft.engine.BucketStats.bucketPercentiles(pts,
      bucket = 100L, pcts = Seq(50)).collect()
    assert(guarded.toSeq === plain.toSeq)
  }

  test("valueHistogram: floor-division bins keep signed data uniform around zero") {
    val pts = Seq(("s", 0L, 1L, -700L), ("s", 1L, 2L, -500L),
      ("s", 2L, 3L, -1L), ("s", 3L, 4L, 0L), ("s", 4L, 5L, 499L))
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats.valueHistogram(pts, binWidth = 500L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // truncating DIV would fold -499..499 into one double-width bin 0;
    // floor assigns -700 -> bin -2, -500/-1 -> bin -1, 0/499 -> bin 0
    assert(out === Map(-2L -> 1L, -1L -> 2L, 0L -> 2L), out.toString)
  }

  test("pairwisePearson: groupExpr blocks pairing to same-group series only") {
    val pts = (0 until 30).flatMap { i =>
      Seq(("g1.up", i * 3600L, i.toLong, i.toLong),
        ("g1.dbl", i * 3600L, 100L + i, 2L * i),
        ("g2.inv", i * 3600L, 200L + i, 1000L - i))
    }.toDF("series", "ts", "pid", "val")
    val out = graft.engine.Correlate.pairwisePearson(pts,
        groupExpr = Some("substring_index(series, '.', 1)")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("g1.dbl", "g1.up")),
      "cross-group pairs must not appear: " + out)
  }

  test("topPaths: first-N prefix, deterministic ties, k bound") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 30L, "purchase"),
      (3L, 10L, "view"), (3L, 20L, "error"),
      (4L, 5L, "signup"),
      // prefix bound: the 4th event never enters a pathLen=3 path
      (5L, 1L, "view"), (5L, 2L, "click"), (5L, 3L, "purchase"), (5L, 4L, "error")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.topPaths(ev, "user_id", "ts",
      "event_type", pathLen = 3, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("view>click>purchase", 3L), ("signup", 1L)),
      out.toSeq.toString) // k=2 cuts; ties rank by path string
  }

  test("transitions: consecutive pairs per user; inactivity cut; dwell sums exact") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "view"), // v->c, c->v
      (1L, 5000L, "click"),       // 4970 s gap > 3600: cut, no v->c here
      (2L, 10L, "view"), (2L, 15L, "click"),                    // v->c
      (3L, 10L, "view")           // singleton — no pairs
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.transitions(ev, "user_id", "ts",
      "event_type", maxGap = 3600L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      ("view", "click") -> ((2L, 15L)),   // dwell 10 + 5
      ("click", "view") -> ((1L, 10L))), out.toString)
    // unbounded keeps the long pair
    val unb = graft.engine.Funnel.transitions(ev, "user_id", "ts",
      "event_type").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(unb(("view", "click")) === 3L)
  }

  test("sequenceCount: disjoint completions; reset after match; stalled starts retried; window enforced") {
    val ev = Seq(
      // u1: two clean back-to-back conversions
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (1L, 40L, "view"), (1L, 50L, "click"), (1L, 60L, "purchase"),
      // u2: a second purchase cannot reuse the counted chain's events
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 30L, "purchase"),
      (2L, 35L, "purchase"),
      // u3: first start stalls (window 50), later start completes
      (3L, 0L, "view"), (3L, 100L, "view"), (3L, 110L, "click"),
      (3L, 120L, "purchase"),
      // u4: click outside the window — no match, user absent
      (4L, 10L, "view"), (4L, 200L, "click"), (4L, 210L, "purchase"),
      // u5: same-second events never chain (strict order)
      (5L, 10L, "view"), (5L, 10L, "click"), (5L, 20L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.sequenceCount(ev, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), window = 50L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L, 3L -> 1L), out.toString)
  }

  test("funnelUnordered: any-order completion inside the first-event window; order never matters") {
    val ev = Seq(
      // u1: purchase BEFORE click — ordered funnel stalls at 1, the
      // unordered mode completes all 3 (all within 100 s of ts 10)
      (1L, 10L, "view"), (1L, 20L, "purchase"), (1L, 30L, "click"),
      // u2: anchor is the CLICK (first step event of any kind); the
      // view lands outside the window → 2 of 3
      (2L, 10L, "click"), (2L, 50L, "purchase"), (2L, 500L, "view"),
      // u3: only one step type, repeated — depth 1, never completed
      (3L, 10L, "view"), (3L, 20L, "view"),
      // u4: no funnel events at all — absent
      (4L, 10L, "error")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.funnelUnordered(ev, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), window = 100L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out === Map(
      1L -> ((10L, 3L, true)),
      2L -> ((10L, 2L, false)),
      3L -> ((10L, 1L, false))), out.toString)
    // the ordered funnel disagrees on u1 — it still chains view→click
    // but the out-of-order purchase can never be t3: depth 2, not 3
    val ordered = graft.engine.Funnel.funnel(ev, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), window = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(ordered(1L) === 2L)
  }

  test("rollingRetention: retained at k means active at k or later; curve is non-increasing") {
    val W = 604800L
    val ev = Seq(
      // u1: signs up wk 0, last active wk 3 → counts at k=0,1,2,3
      (1L, 0L * W, "signup"), (1L, 1L * W, "view"), (1L, 3L * W, "view"),
      // u2: signs up wk 0, never returns → counts at k=0 only
      (2L, 0L * W + 5, "signup"),
      // u3: never signed up — absent
      (3L, 0L * W, "view"),
      // u4: signs up wk 1, returns wk 2 → cohort 1: k=0,1
      (4L, 1L * W, "signup"), (4L, 2L * W, "click")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.rollingRetention(ev, "user_id", "ts",
      "event_type", cohortEvent = "signup").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L), out.toString)
    // exact-period retention disagrees: u1 skipped wk 2, so classic
    // retention has a dip rolling retention does not
    val classic = graft.engine.Funnel.retention(ev, "user_id", "ts",
      "event_type", cohortEvent = "signup").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(!classic.contains((0L, 2L)))
  }

  test("cumulativeSum: exact running total in (ts, pid) order per series") {
    val pts = Seq(
      ("a", 10L, 2L, 5L), ("a", 10L, 1L, 3L), // ts tie: pid orders
      ("a", 20L, 3L, -4L),
      ("b", 5L, 1L, 7L)
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.MovingAgg.cumulativeSum(pts).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(4)).toMap
    assert(out === Map(("a", 1L) -> 3L, ("a", 2L) -> 8L, ("a", 3L) -> 4L,
      ("b", 1L) -> 7L), out.toString)
  }

  test("robustZ: outlier flags without dragging the baseline; mad-0 cell never flags") {
    // hour 0: values 98..102 cycling + one 10000 — med 100, mad small,
    // so the outlier flags and in-band points don't
    val h0 = (0 until 20).map(i => ("s", 10L * i, i.toLong, 98L + (i % 5))) :+
      (("s", 3000L, 98L, 10000L))
    // hour 1: all identical → mad 0 → degenerate cell, never flags
    val h1 = (0 until 5).map(i => ("s", 3600L + 10L * i, 200L + i, 50L))
    val out = graft.engine.Anomaly.robustZ(
      (h0 ++ h1).toDF("series", "ts", "pid", "val")).collect()
      .map(r => r.getLong(2) -> ((r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8))))
      .toMap
    assert(out(98L)._4, s"the 10000 outlier must flag: ${out(98L)}")
    assert(h0.dropRight(1).forall(p => !out(p._3)._4),
      "in-band points must not flag (median/MAD resist the outlier drag)")
    assert(out(200L) === ((50L, 0L, 0L, false)), "mad-0 cell: rz 0, never flagged")
  }

  test("holt forecast: hand-traced recurrence; constants forecast themselves; singleton = itself") {
    // y = [10, 20, 30], alpha 0.5, beta 0.25:
    //   init l=10 b=0; y=20 -> l=15, b=1.25; y=30 -> l=23.125,
    //   b=0.25*(23.125-15)+0.9375=2.96875; forecast 26.09375
    val pts = Seq(("s", 0L, 1L, 10L), ("s", 10L, 2L, 20L), ("s", 20L, 3L, 30L),
      ("c", 0L, 1L, 7L), ("c", 10L, 2L, 7L), ("c", 20L, 3L, 7L),
      ("one", 5L, 1L, 42L))
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.Forecast.holt(pts, lastN = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("s") === ((3L, 20L, 26093750L)), out.toString)
    assert(out("c") === ((3L, 20L, 7000000L)), "a constant series forecasts itself")
    assert(out("one") === ((1L, 5L, 42000000L)), "a single sample forecasts itself")
    // the trailing-window bound holds: only the last N samples fold
    val long = (0 until 100).map(i => ("L", i.toLong, i.toLong, 5L))
      .toDF("series", "ts", "pid", "val")
    val n = graft.engine.Forecast.holt(long, lastN = 8).collect().head
    assert(n.getLong(1) === 8L && n.getLong(3) === 5000000L)
  }

  test("cusum: hand-traced two-sided alarms with reset; sigma-0 and short series dropped") {
    // bucketSec=1 -> each point is its own bucket. base=2: baseline
    // y=[10,14] -> mu=12, sigma=2; k=0.5 -> slack 1, h=2 -> alarm at 4.
    //   y=16: S+ = 3        (no alarm)
    //   y=16: S+ = 6 > 4    -> alarm +1, S/sigma = 3, reset
    //   y=12: S+ = 0, S- = 0
    //   y=8:  S- = 3        (no alarm)
    //   y=8:  S- = 6 > 4    -> alarm -1, S/sigma = 3
    val drift = Seq(10L, 14L, 16L, 16L, 12L, 8L, 8L).zipWithIndex
      .map { case (v, i) => ("d", (i + 1).toLong, (i + 1).toLong, v) }
    // constant baseline (sigma=0): dropped even though it jumps
    val flat = Seq(5L, 5L, 100L, 100L).zipWithIndex
      .map { case (v, i) => ("z", (i + 1).toLong, (i + 1).toLong, v) }
    // too short for minBuckets=3
    val short = Seq(("t", 1L, 1L, 9L), ("t", 2L, 2L, 9L))
    val pts = (drift ++ flat ++ short)
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.Anomaly.cusum(pts, lastN = 10, base = 2,
      k = 0.5, h = 2.0, minBuckets = 3, bucketSec = 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(("d", 4L, 1L, 3000000L), ("d", 7L, -1L, 3000000L)),
      out.toString)
  }

  test("holt backtest: hand-traced errors; constant series score zero; singletons dropped") {
    // y = [10, 20, 30], alpha 0.5, beta 0.25 (the holt test's trace):
    //   pred@20 = 10        -> err 10;    l=15, b=1.25
    //   pred@30 = 16.25     -> err 13.75
    //   sae = 23.75, say = 50, naive sne = |20-10| + |30-20| = 20
    //   mae = 11.875, wape = 0.475, skill = 1 - 23.75/20 = -0.1875
    val pts = Seq(("s", 0L, 1L, 10L), ("s", 10L, 2L, 20L), ("s", 20L, 3L, 30L),
      ("c", 0L, 1L, 7L), ("c", 10L, 2L, 7L), ("c", 20L, 3L, 7L),
      ("one", 5L, 1L, 42L))
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.Forecast.holtBacktest(pts, lastN = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out("s") === ((2L, 11875000L, Some(475000L), Some(-187500L))),
      out.toString)
    assert(out("c") === ((2L, 0L, Some(0L), None)),
      "constant series: zero error, no naive error to beat -> NULL skill")
    assert(!out.contains("one"), "a single sample has no evaluation")
    // the trailing-window bound holds: only the last N samples score
    val long = (0 until 100).map(i => ("L", i.toLong, i.toLong, 5L))
      .toDF("series", "ts", "pid", "val")
    val n = graft.engine.Forecast.holtBacktest(long, lastN = 8)
      .collect().head
    assert(n.getLong(1) === 7L && n.getLong(2) === 0L)
  }

  test("holtResidualAnomaly: a spike after warmup flags with its pre-update forecast; early spikes and steady series never flag") {
    import spark.implicits._
    // "s": constant 10 for 11 points then a spike to 100 — every
    // warmup residual is 0 (l stays 10, b stays 0, sae stays 0), so
    // at the spike cnt-1 = 10 >= 8 and |90| > 4·0: flagged with the
    // pre-update forecast 10
    val spiked = (0 until 11).map(i => ("s", i.toLong, i.toLong, 10L)) :+
      (("s", 11L, 11L, 100L))
    // "w": the same spike at arrival 4 (cnt-1 = 2 < 8) — suppressed
    val early = (0 until 3).map(i => ("w", i.toLong, i.toLong, 10L)) :+
      (("w", 3L, 3L, 100L))
    // "c": steady — zero residuals never exceed the (zero) scale
    val steady = (0 until 20).map(i => ("c", i.toLong, i.toLong, 10L))
    val out = graft.engine.Forecast.holtResidualAnomaly(
      (spiked ++ early ++ steady).toDF("series", "ts", "pid", "val"),
      lastN = 64, k = 4.0, minWarm = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("s", 11L, 10000000L, 90000000L)), out.toSeq)
  }

  test("holtWinters: hand-traced seasonal recurrence; holed and short windows dropped") {
    // m=2, lastN=4, one point per hourly bucket, y = [10, 20, 12, 22]:
    //   init l0 = 15, s = [-5, 5], b = 0
    //   bucket 2 (slot 0): nl = .5*(12-(-5)) + .5*15 = 16,
    //     b = .25*1 = 0.25, s[0] = .25*(12-16) + .75*(-5) = -4.75
    //   bucket 3 (slot 1): nl = .5*(22-5) + .5*16.25 = 16.625,
    //     b = .25*.625 + .75*.25 = 0.34375,
    //     s[1] = .25*(22-16.625) + .75*5 = 5.09375
    //   forecast (slot 0) = 16.625 + 0.34375 - 4.75 = 12.21875
    val ok = Seq(10L, 20L, 12L, 22L).zipWithIndex.map { case (v, i) =>
      ("s", i * 3600L, i.toLong, v) }
    val holed = Seq(0L, 1L, 3L, 4L).map(bk => ("g", bk * 3600L, bk, 5L))
    val short3 = (0 until 3).map(i => ("t", i * 3600L, i.toLong, 5L))
    val out = graft.engine.Forecast.holtWinters(
      (ok ++ holed ++ short3).toDF("series", "ts", "pid", "val"),
      bucket = 3600L, lastN = 4, m = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("s") === ((4L, 3L, 12218750L)), out.toString)
    assert(!out.contains("g"), "a holed window would misalign slots: dropped")
    assert(!out.contains("t"), "under two seasons: dropped")
  }

  test("hwBacktest: hand-traced one-step errors; seasonal beats naive and plain Holt; constant series NULL skills") {
    // m=2, one point per 10 s bucket, y = [10,20,10,20,12,22,12,22]
    // (season [10,20], +2 level shift at bucket 4): init l0=15,
    // s=[-5,5], b=0; Holt warm over y[1]: hl=15, hb=1.25; py=20.
    // Walking the six evals by hand (independent python replay of the
    // fold): sae=3.23828125, say=98, sne=58, she=38.916542...
    //   mae_q6 = floor(3.23828125/6*1e6)        = 539713
    //   wape_q6 = floor(3.23828125/98*1e6)      = 33043
    //   skill_naive_q6 = floor((1-sae/58)*1e6)  = 944167
    //   skill_holt_q6  = floor((1-sae/she)*1e6) = 916789
    val ys = Seq(10L, 20L, 10L, 20L, 12L, 22L, 12L, 22L)
    val pts = ys.zipWithIndex.map { case (v, i) =>
      ("s", i * 10L, i.toLong, v) } ++
      // constant series: zero error AND zero naive/holt error -> the
      // skill ratios have no denominator and must be NULL, not 1
      (0 until 6).map(i => ("c", i * 10L, i.toLong, 5L)) ++
      // holed window: bucket 2 missing -> dropped like holtWinters
      Seq(0L, 1L, 3L, 4L, 5L).map(bk => ("g", bk * 10L, bk, 5L))
    val out = graft.engine.Forecast.hwBacktest(
      pts.toDF("series", "ts", "pid", "val"),
      bucket = 10L, lastN = 8, m = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out("s") === ((6L, 539713L, Some(33043L), Some(944167L),
      Some(916789L))), out.toString)
    assert(out("c") === ((4L, 0L, Some(0L), None, None)), out.toString)
    assert(!out.contains("g"), "a holed window would misalign slots: dropped")
  }

  test("bucketMode: Long.MinValue participates without overflow (negated-count tie-break)") {
    val pts = Seq(("s", 0L, 1L, Long.MinValue), ("s", 1L, 2L, Long.MinValue),
      ("s", 2L, 3L, 5L)).toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats.bucketMode(pts, bucket = 100L)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((Long.MinValue, 2L)),
      "the extreme value must win by count, not fault: " + out.toSeq)
  }

  test("seasonalDecompose: out-of-headroom values fault loudly with the remedy named") {
    val big = Seq(("s", 0L, 1L, Long.MaxValue / 1000000L),
      ("s", 3600L, 2L, 1L)).toDF("series", "ts", "pid", "val")
    val e = intercept[Exception] {
      graft.engine.Decompose.seasonalDecompose(big, halfWindow = 2).collect()
    }
    assert(e.getMessage.contains("seasonalDecompose") &&
      e.getMessage.contains("shrink the window"), e.getMessage)
  }

  test("bucketMode: plurality value per cell; equal counts break to the smallest value") {
    val pts = Seq(
      ("s", 0L, 1L, 7L), ("s", 1L, 2L, 7L), ("s", 2L, 3L, 3L), // 7 wins on count
      ("s", 100L, 4L, 9L), ("s", 101L, 5L, 2L), // tie: 2 wins (smallest)
      ("t", 0L, 1L, 5L) // singleton cell
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats.bucketMode(pts, bucket = 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      ("s", 0L) -> ((7L, 2L)), ("s", 1L) -> ((2L, 1L)),
      ("t", 0L) -> ((5L, 1L))), out.toString)
  }

  test("topSeriesPerBucket: ranks bucket sums descending; name breaks ties; k bounds output") {
    val pts = Seq(
      ("a", 0L, 1L, 10L), ("a", 5L, 2L, 10L), // bucket 0 sum 20
      ("b", 1L, 1L, 30L),                     // bucket 0 sum 30
      ("c", 2L, 1L, 20L),                     // bucket 0 sum 20: ties a, name a < c
      ("d", 3L, 1L, 1L),                      // rank 4 — cut by k=3
      ("a", 100L, 3L, 1L)                     // bucket 1, alone
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.Rank.topSeriesPerBucket(pts, bucket = 100L, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      (0L, 1L) -> (("b", 30L)), (0L, 2L) -> (("a", 20L)),
      (0L, 3L) -> (("c", 20L)), (1L, 1L) -> (("a", 1L))), out.toString)
  }

  test("seasonalDecompose: components recompose exactly; planted daily rhythm lands in seasonal") {
    // 4 days hourly: trend 0, hour-h seasonal = +100 at h=0, else 0
    val pts = (0 until 96).map { i =>
      val v = 50L + (if (i % 24 == 0) 100L else 0L)
      ("s", i * 3600L, i.toLong, v)
    }.toDF("series", "ts", "pid", "val")
    val rows = graft.engine.Decompose.seasonalDecompose(pts, halfWindow = 12)
      .collect()
    assert(rows.length === 96)
    rows.foreach { r =>
      val (v, tr, se, re) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(v * 1000000L === tr + se + re,
        s"recomposition must be exact: $v vs $tr+$se+$re")
    }
    // interior hour-0 points carry a strongly positive seasonal and a
    // small residual; plain hours sit near zero seasonal
    val byHour = rows.map(r => (r.getLong(1) / 3600 % 24, r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(byHour(0L) > 50000000L, s"hour-0 seasonal must be large: ${byHour(0L)}")
    assert(math.abs(byHour(5L)) < 20000000L, s"hour-5 seasonal small: ${byHour(5L)}")
  }

  test("toGrid maxGap: stale LOCF fills and over-wide linear bridges drop; at-bound fills keep") {
    // samples at 0 and 300; grid step 100 → grid points 0,100,200,300
    val pts = Seq(("s", 0L, 1L, 10.0), ("s", 300L, 2L, 40.0))
      .toDF("series", "ts", "pid", "val")
    // LOCF with maxGap 100: grid 0 (age 0) and 100 (age 100) fill;
    // 200 (age 200) drops; 300 (age 0, its own sample) fills
    val locf = graft.engine.Interpolate.toGrid(pts, step = 100L,
      fill = "locf", maxGap = 100L).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(locf === Map(0L -> 10000000000L, 100L -> 10000000000L,
      300L -> 40000000000L), locf.toString)
    // linear with maxGap 100: the 0→300 bridge is too wide — interior
    // grid points drop, coincident samples (bridge width 0) keep
    val lin = graft.engine.Interpolate.toGrid(pts, step = 100L,
      fill = "linear", maxGap = 100L).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(lin === Map(0L -> 10000000000L, 300L -> 40000000000L), lin.toString)
    // maxGap 0 stays unbounded: all four grid points fill linearly
    val unb = graft.engine.Interpolate.toGrid(pts, step = 100L,
      fill = "linear").collect().map(r => r.getLong(1)).sorted
    assert(unb.toSeq === Seq(0L, 100L, 200L, 300L))
  }

  test("bucketedChanges: counts value changes and resets; edge pairs go to the later bucket") {
    val pts = Seq(
      ("s", 10L, 1L, 5L),   // first sample — nothing
      ("s", 20L, 2L, 5L),   // unchanged
      ("s", 30L, 3L, 9L),   // change
      ("s", 40L, 4L, 2L),   // change + reset
      ("s", 110L, 5L, 7L),  // straddles bucket edge → bucket 1, change
      ("s", 120L, 6L, 7L)   // unchanged
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.CounterRate.bucketedChanges(pts, bucket = 100L)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(0L -> ((2L, 1L)), 1L -> ((1L, 0L))), out.toString)
  }

  test("timeValueHeatmap: floor bins keep signed data uniform; empty cells absent") {
    val pts = Seq(
      ("s", 0L, 1L, -700L), ("s", 1L, 2L, -500L), ("s", 2L, 3L, 0L),
      ("s", 150L, 4L, 0L), ("s", 151L, 5L, 450L) // second time bucket
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats.timeValueHeatmap(pts,
      bucket = 100L, binWidth = 500L).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(out === Map((0L, -2L) -> 1L, (0L, -1L) -> 1L, (0L, 0L) -> 1L,
      (1L, 0L) -> 2L), out.toString)
  }

  test("retention: cohort = first-signup week; pre-cohort activity excluded; no-signup users absent") {
    val W = 604800L
    val ev = Seq(
      (1L, 0L * W, "signup"), (1L, 0L * W + 5, "view"), (1L, 1L * W, "click"),
      (1L, 3L * W, "view"),
      (2L, 1L * W, "signup"),
      (3L, 0L * W, "view"), // never signed up — not in any cohort
      (4L, 1L * W, "view"), (4L, 2L * W, "signup") // week-1 activity pre-dates the cohort
    ).toDF("user_id", "ts", "event_type")
    val out = graft.engine.Funnel.retention(ev, "user_id", "ts", "event_type",
      cohortEvent = "signup").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (2L, 0L) -> 1L), out.toString)
  }

  test("bucketPercentiles: interpolation exact in fixed point; singleton cell is its own percentile") {
    val pts = Seq(
      ("a", 0L, 1L, 0L), ("a", 1L, 2L, 10L),          // [0,10]: p50 = 5.00
      ("b", 0L, 3L, 7L)                               // singleton: every p = 7.00
    ).toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats
      .bucketPercentiles(pts, bucket = 100L, pcts = Seq(50, 95))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out("a") === ((500L, 950L)), "p50=5.00, p95=9.50 between 0 and 10")
    assert(out("b") === ((700L, 700L)), "singleton cell returns itself")
  }

  test("valueHistogram: cumulative counts are le-style within each series") {
    val pts = Seq(("s", 0L, 1L, 10L), ("s", 1L, 2L, 510L), ("s", 2L, 3L, 520L))
      .toDF("series", "ts", "pid", "val")
    val out = graft.engine.BucketStats.valueHistogram(pts, binWidth = 500L)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(0L -> ((1L, 1L)), 1L -> ((2L, 3L))), out.toString)
  }

  test("plan shapes: funnel joins nothing, seasonalZ broadcasts its stats, correlate pairs only rollups") {
    val pts = (0 until 50).map(i =>
      ("s" + i % 3, i * 100L, i.toLong, i.toLong)).toDF("series", "ts", "pid", "val")
    val ev = (0 until 50).map(i =>
      (i.toLong % 5, i * 10L, Seq("view", "click", "purchase")(i % 3)))
      .toDF("user_id", "ts", "event_type")
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // funnel: the chain walk is array lambdas over ONE pivot row per
    // user — no join operator may appear
    val fp = plan(graft.engine.Funnel.funnel(ev, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), window = 100L))
    assert(!fp.toLowerCase.contains("join"), "funnel must not join:\n" + fp)
    // seasonalZ: the label-hour stats come back via a BROADCAST join —
    // the points side never shuffles for it
    val zp = plan(graft.engine.Anomaly.seasonalZ(pts))
    assert(zp.contains("BroadcastHashJoin"), zp)
    // correlate: no cartesian/BNLJ anywhere — the pair join is an
    // equi-join on the bucket over rollup-sized frames
    val cp = plan(graft.engine.Correlate.pairwisePearson(pts, minBuckets = 1L))
    assert(!cp.contains("BroadcastNestedLoopJoin") && !cp.contains("CartesianProduct"), cp)
    // sequence count: same no-join contract as the funnel family —
    // the DP is array lambdas over one pivot row per user
    val sq = plan(graft.engine.Funnel.sequenceCount(ev, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), window = 100L))
    assert(!sq.toLowerCase.contains("join"), "sequenceCount must not join:\n" + sq)
    // top-k per bucket: the rank window must carry WindowGroupLimit
    // (partial top-k BELOW the exchange — only k rows per partition
    // shuffle) and rank the rollup, never the raw points
    val tk = plan(graft.engine.Rank.topSeriesPerBucket(pts, bucket = 1000L, k = 3))
    assert(tk.contains("WindowGroupLimit"), "topK must push partial limits:\n" + tk)
    // decompose: seasonal stats return via broadcast — the point
    // stream shuffles once for the trend window, never for the join
    val dp = plan(graft.engine.Decompose.seasonalDecompose(pts, halfWindow = 2, pin = false))
    assert(dp.contains("BroadcastHashJoin"), "seasonal join must broadcast:\n" + dp)
    assert(!dp.contains("SortMergeJoin"), dp)
  }

  test("thresholdCross: emits up/down transitions only, never sustained breaches") {
    val pts = Seq(
      ("s", 10L, 1L, 10L),   // below
      ("s", 20L, 2L, 60L),   // crosses up
      ("s", 30L, 3L, 70L),   // stays above — no emission
      ("s", 40L, 4L, 40L),   // crosses down
      ("s", 50L, 5L, 50L)    // crosses up (boundary: val >= T)
    ).toDF("series", "ts", "pid", "val")
    val out = Anomaly.thresholdCross(pts, threshold = 50L).collect()
      .map(r => (r.getLong(1), r.getString(5)))
    assert(out.toSet === Set((20L, "up"), (40L, "down"), (50L, "up")), out.toSeq)
  }

  test("bucketTwa: LOCF segments clip at bucket edges; last write wins on dup ts; tail sample uncovered") {
    val pts = Seq(
      ("a", 2L, 10L, 1L), ("a", 5L, 20L, 2L), ("a", 5L, 99L, 5L), // dup ts: pid 5 wins
      ("a", 12L, 30L, 3L), ("a", 25L, 40L, 4L), // 40 has no successor
      ("b", 3L, 7L, 1L), // single point: no coverage at all
      ("c", 0L, 2L, 1L), ("c", 35L, 5L, 2L) // one segment spanning 4 buckets
    ).toDF("series", "ts", "val", "pid")
    val out = graft.engine.TimeWeighted.bucketTwa(pts, bucket = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bucket 0: [2,5)×10 + [5,10)×99 → dur 8, wsum 525
    assert(out(("a", 0L)) === ((8L, 525L, 65625000L)))
    // bucket 1: [10,12)×99 + [12,20)×30 → dur 10, wsum 438
    assert(out(("a", 1L)) === ((10L, 438L, 43800000L)))
    // bucket 2: [20,25)×30 → the tail sample (40) contributes nothing
    assert(out(("a", 2L)) === ((5L, 150L, 30000000L)))
    assert(!out.keySet.exists(_._1 == "b"), "singleton series has no segments")
    // the long segment fills buckets 0..2 fully and [30,35) of bucket 3
    assert(out(("c", 1L)) === ((10L, 20L, 2000000L)))
    assert(out(("c", 3L)) === ((5L, 10L, 2000000L)))
    assert(out.size === 7)
  }

  test("bucketTwa: out-of-headroom and negative values fault loudly with the remedy named") {
    // bound for bucket=10 is MaxValue/1e6/10 ≈ 9.22e11; a value above
    // it must raise the operator's own message, not a raw ANSI overflow
    val big = Seq(("s", 0L, Long.MaxValue / 1000000L, 1L),
      ("s", 5L, 1L, 2L), ("s", 20L, 1L, 3L))
      .toDF("series", "ts", "val", "pid")
    val e1 = intercept[Exception] {
      graft.engine.TimeWeighted.bucketTwa(big, bucket = 10L).collect()
    }
    assert(e1.getMessage.contains("bucketTwa") &&
      e1.getMessage.contains("coarsen the quantum"), e1.getMessage)
    val neg = Seq(("s", 0L, -1L, 1L), ("s", 5L, 1L, 2L), ("s", 20L, 1L, 3L))
      .toDF("series", "ts", "val", "pid")
    val e2 = intercept[Exception] {
      graft.engine.TimeWeighted.bucketTwa(neg, bucket = 10L).collect()
    }
    assert(e2.getMessage.contains("bucketTwa"), e2.getMessage)
    // in-range values are untouched by the guard
    val ok = graft.engine.TimeWeighted.bucketTwa(
      Seq(("s", 0L, 5L, 1L), ("s", 10L, 7L, 2L))
        .toDF("series", "ts", "val", "pid"), bucket = 10L).collect()
    assert(ok.map(r => (r.getLong(1), r.getLong(3))).toSet === Set((0L, 50L)))
  }

  test("m4: first/last by (ts,pid), min/max report earliest holder; singleton bucket collapses") {
    val pts = Seq(
      ("s", 1L, 5.0, 1L), ("s", 1L, 9.0, 2L), // dup ts: pid orders first
      ("s", 4L, 3.0, 3L), ("s", 7L, 8.0, 4L),
      ("s", 12L, 6.0, 5L),
      ("t", 0L, 5.0, 1L), ("t", 3L, 5.0, 2L) // all-equal values
    ).toDF("series", "ts", "val", "pid")
    val out = graft.engine.Downsample.m4(pts, bucket = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val s0 = out(("s", 0L))
    assert((s0.getLong(2), s0.getLong(3), s0.getDouble(4),
      s0.getLong(5), s0.getDouble(6)) === ((4L, 1L, 5.0, 7L, 8.0)))
    assert((s0.getLong(7), s0.getDouble(8)) === ((4L, 3.0)), "min at ts 4")
    assert((s0.getLong(9), s0.getDouble(10)) === ((1L, 9.0)),
      "max 9.0 entered at ts 1 (pid 2)")
    val s1 = out(("s", 12L / 10L))
    assert((s1.getLong(2), s1.getLong(3), s1.getLong(5),
      s1.getLong(7), s1.getLong(9)) === ((1L, 12L, 12L, 12L, 12L)))
    // equal values: both extrema report the EARLIEST holder
    val t0 = out(("t", 0L))
    assert((t0.getLong(7), t0.getLong(9)) === ((0L, 0L)))
  }

  test("fidelityReport: a dropped point's polyline error is exact; kept twins and singletons read zero") {
    // bucket=4: b0 {ts0} and b2 {ts9} are singleton keeps; b1 holds
    // the spike (ts5, 10.0, area 6) and the flat point (ts6, 4.0,
    // area 3) — LTOB keeps the spike, so ts6 interpolates between
    // (5, 10.0) and (9, 4.0): 10 − 6·(1/4) = 8.5, err 4.5 exactly
    // (the 0.25 fraction is an exact binary double)
    val pts = Seq(
      ("s", 0L, 4.0, 1L), ("s", 5L, 10.0, 2L), ("s", 6L, 4.0, 3L),
      ("s", 9L, 4.0, 4L),
      ("t", 0L, 1.0, 1L)
    ).toDF("series", "ts", "val", "pid")
    val out = graft.engine.Downsample.fidelityReport(pts, bucket = 4L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("s") === ((4L, 3L, 4L, 4500000L, 1125000L)), out.toString)
    assert(out("t") === ((1L, 1L, 1L, 0L, 0L)), out.toString)
  }

  test("fidelityReport: a value swing past the int64 cross-product headroom raises, never overflows silently") {
    // bucket 1 holds a 9.2e6-valued spike and a 0-valued point — LTOB
    // drops one of them, and EITHER way the dropped point's |q6
    // delta| (9.2e12) times its bracket gap (~2e9 s) is ~1.8e22 ≫
    // 2^63, which without the guard wraps into a plausible err_q6
    val pts = Seq(
      ("s", 0L, 0.0, 1L), ("s", 4L, 9.2e6, 2L), ("s", 5L, 0.0, 3L),
      ("s", 2000000000L, 0.0, 4L)
    ).toDF("series", "ts", "val", "pid")
    val e = intercept[Exception] {
      graft.engine.Downsample.fidelityReport(pts, bucket = 4L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("headroom")), msgs(e).mkString(" | "))
  }

  test("gaps: only silences over the threshold; dup-ts points never fake a gap; series isolated") {
    val pts = Seq(
      ("s", 0L, 1L), ("s", 5L, 2L), ("s", 5L, 3L), // dup ts
      ("s", 30L, 4L), ("s", 32L, 5L),
      ("u", 0L, 1L) // singleton: nothing to report
    ).toDF("series", "ts", "pid")
    val out = graft.engine.Sessionize.gaps(pts, minGap = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("s", 5L, 30L, 25L)))
  }

  test("gapCurve: per-gap sessions/silences hand-traced; pointwise monotone; n_sessions agrees with sessions() at each setting") {
    // s0: ts 0,100,500,2000 (deltas 100,400,1500; span 2000)
    // s1: ts 0,5000 (delta 5000; span 5000). Totals span 7000.
    val pts = Seq(
      ("s0", 0L, 0L), ("s0", 100L, 1L), ("s0", 500L, 2L),
      ("s0", 2000L, 3L), ("s1", 0L, 4L), ("s1", 5000L, 5L)
    ).toDF("series", "ts", "pid")
    val out = graft.engine.Sessionize.gapCurve(pts,
        gaps = Seq(200L, 1000L, 10000L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // g=200: breaks 400,1500,5000 -> 3 gaps, silence 6900,
    // avail = 100e6 DIV 7000
    assert(out(200L) === ((2L, 5L, 3L, 6900L, 7000L, 14285L)), out.toString)
    assert(out(1000L) === ((2L, 4L, 2L, 6500L, 7000L, 71428L)), out.toString)
    assert(out(10000L) === ((2L, 2L, 0L, 0L, 7000L, 1000000L)), out.toString)
    // raising the gap filters the SAME delta column: sessions/gaps/
    // silence non-increasing, availability non-decreasing
    for (Seq(lo, hi) <- Seq(200L, 1000L, 10000L).sliding(2)) {
      assert(out(lo)._2 >= out(hi)._2 && out(lo)._3 >= out(hi)._3)
      assert(out(lo)._4 >= out(hi)._4 && out(lo)._6 <= out(hi)._6)
    }
    // the curve's session count IS the sessions() operator's row count
    for (g <- Seq(200L, 1000L, 10000L))
      assert(out(g)._2 === graft.engine.Sessionize.sessions(pts, g).count(),
        s"gap $g")
  }

  test("ewma: truncated geometric weights renormalize over short heads; floor-quantized") {
    val pts = Seq(
      ("s", 1L, 1L, 6L), ("s", 2L, 2L, 3L), ("s", 3L, 3L, 9L),
      ("t", 1L, 1L, 1L), ("t", 2L, 2L, 2L)
    ).toDF("series", "ts", "pid", "val")
    // α = 1/2, k = 2 → weights (2, 1): y = (2·x_t + x_{t−1}) / 3
    val out = graft.engine.MovingAgg.ewma(pts, num = 1L, den = 2L, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out(("s", 1L)) === 6000000L, "head renormalizes to the bare value")
    assert(out(("s", 2L)) === 4000000L) // (6+6)/3
    assert(out(("s", 3L)) === 7000000L) // (18+3)/3
    assert(out(("t", 2L)) === 1666666L, "floor of 5/3 ×1e6 — never rounded")
    // the weight table itself: (den−num)^i · den^(k−1−i), newest first
    assert(graft.engine.MovingAgg.ewmaWeights(1, 4, 4).toSeq ===
      Seq(64L, 48L, 36L, 27L))
  }
}
