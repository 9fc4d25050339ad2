package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.engine.Pipeline
import graft.engine.Pipeline._

/** Golden fixtures from the reference's C unit tests
  * (/root/reference/test/test_aggr/test_aggr.c:13-330): the fixed
  * 10-point integer series ts {3,6,7,10,11,13,14,15,25,27}, vals
  * {1,3,0,2,4,8,3,5,6,3}. These pin the right-aligned GROUP_TS bucket
  * labels (aggregate.c:41-43) and per-function values/types.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val TS = Seq(3L, 6L, 7L, 10L, 11L, 13L, 14L, 15L, 25L, 27L)
  private val VALS = Seq(1L, 3L, 0L, 2L, 4L, 8L, 3L, 5L, 6L, 3L)

  private def fixture: DataFrame =
    TS.zip(VALS).zipWithIndex
      .map { case ((t, v), i) => ("aggr", t, v, i.toLong) }
      .toDF("series", "ts", "val", "pid")

  private def fixtureD: DataFrame =
    fixture.withColumn("val", col("val").cast("double"))

  private def runL(df: DataFrame, stages: Stage*): Seq[(Long, Long)] =
    Pipeline(df, stages).orderBy("ts").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq

  private def runD(df: DataFrame, stages: Stage*): Seq[(Long, Double)] =
    Pipeline(df, stages).orderBy("ts").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq

  test("count(6) — test_aggr.c:32-56") {
    assert(runL(fixture, Agg(Count, Some(6))) ===
      Seq((6L, 2L), (12L, 3L), (18L, 3L), (30L, 2L)))
  }

  test("first(5) — test_aggr.c:58-81") {
    assert(runL(fixture, Agg(First, Some(5))) ===
      Seq((5L, 1L), (10L, 3L), (15L, 4L), (25L, 6L), (30L, 3L)))
  }

  test("last(5) — test_aggr.c:85-106") {
    assert(runL(fixture, Agg(Last, Some(5))) ===
      Seq((5L, 1L), (10L, 2L), (15L, 5L), (25L, 6L), (30L, 3L)))
  }

  test("max(10) — test_aggr.c:108-133") {
    assert(runL(fixture, Agg(Max, Some(10))) ===
      Seq((10L, 3L), (20L, 8L), (30L, 6L)))
  }

  test("mean(4) — test_aggr.c:138-160") {
    val r = runD(fixtureD, Agg(Mean, Some(4)))
    assert(r.size === 5)
    assert(r.head === ((4L, 1.0)))
    assert(r.last === ((28L, 4.5)))
  }

  test("median(7) — test_aggr.c:162-186") {
    val r = runD(fixtureD, Agg(Median, Some(7)))
    assert(r.size === 4)
    assert(r(0) === ((7L, 1.0)))
    assert(r(1) === ((14L, 3.5)))
  }

  test("median_high(7) int-typed — test_aggr.c:188-212") {
    val r = runL(fixture, Agg(MedianHigh, Some(7)))
    assert(r(0) === ((7L, 1L)))
    assert(r(1) === ((14L, 4L)))
  }

  test("median_low(7) int-typed — test_aggr.c:214-238") {
    val r = runL(fixture, Agg(MedianLow, Some(7)))
    assert(r(0) === ((7L, 1L)))
    assert(r(1) === ((14L, 3L)))
  }

  test("min(2) — test_aggr.c:240-264") {
    val r = runL(fixture, Agg(Min, Some(2)))
    assert(r.size === 9)
    assert(r(0) === ((4L, 1L)))
    assert(r(5) === ((14L, 3L)))
  }

  test("pvariance(5) — test_aggr.c:266-290") {
    val r = runD(fixtureD, Agg(PVariance, Some(5)))
    assert(r(0) === ((5L, 0.0)))
    assert(r(2) === ((15L, 3.5)))
  }

  test("stddev(6); n=1 gives 0.0 not NULL — test_aggr.c:292-316, variance.c:9-52") {
    val r = runD(fixtureD, Agg(Stddev, Some(6)))
    assert(r(0)._1 === 6L)
    assert(math.abs(r(0)._2 - math.sqrt(2.0)) < 1e-12)
    assert(r(1) === ((12L, 2.0)))
    // single-point bucket → sample stddev is 0.0 in the reference
    val one = Seq(("s", 3L, 1.5, 0L)).toDF("series", "ts", "val", "pid")
    assert(runD(one, Agg(Stddev, Some(5))) === Seq((5L, 0.0)))
    assert(runD(one, Agg(Variance, Some(5))) === Seq((5L, 0.0)))
  }

  test("sum(5) int64-typed — test_aggr.c:318-330") {
    assert(runL(fixture, Agg(Sum, Some(5))) ===
      Seq((5L, 1L), (10L, 5L), (15L, 20L), (25L, 6L), (30L, 3L)))
  }

  test("to-one collapse stamps last ts (first ts for first()) — AGGREGATE_to_one") {
    assert(runL(fixture, Agg(Count, None)) === Seq((27L, 10L)))
    assert(runL(fixture, Agg(Sum, None)) === Seq((27L, 35L)))
    assert(runL(fixture, Agg(First, None)) === Seq((3L, 1L)))
    assert(runL(fixture, Agg(Last, None)) === Seq((27L, 3L)))
  }

  test("difference() pairwise — aggregate.c:760-836") {
    assert(runL(fixture, Difference) ===
      Seq((6L, 2L), (7L, -3L), (10L, 2L), (11L, 2L), (13L, 4L),
        (14L, -5L), (15L, 2L), (25L, 1L), (27L, -3L)))
  }

  test("interval() — aggregate.c:838-876") {
    assert(runL(fixture, Interval) ===
      Seq((6L, 3L), (7L, 1L), (10L, 3L), (11L, 1L), (13L, 2L),
        (14L, 1L), (15L, 1L), (25L, 10L), (27L, 2L)))
  }

  test("timeval() replaces value with its own ts, int64 — aggregate.c:878-910") {
    assert(runL(fixture, Timeval).map(_._2) === TS)
  }

  test("derivative(1) pairwise — aggregate.c:696-758") {
    val r = runD(fixtureD, Derivative(1.0))
    assert(r.head === ((6L, 2.0 / 3.0)))
    assert(r(7) === ((25L, 0.1)))
  }

  test("head/tail") {
    assert(runL(fixture, Head(3)) === Seq((3L, 1L), (6L, 3L), (7L, 0L)))
    assert(runL(fixture, Tail(2)) === Seq((25L, 6L), (27L, 3L)))
  }

  test("filter truncates fractional literal on integer series — aggregate.c:952") {
    // >= 3.7 behaves as >= 3 on an int series
    assert(runL(fixture, FilterNum(">=", 3.7)).map(_._2).forall(_ >= 3))
    assert(runL(fixture, FilterNum(">=", 3.7)).size === 7)
    // but stays fractional on a float series
    assert(runD(fixtureD, FilterNum(">=", 3.7)).size === 4)
  }

  test("equal timestamps keep insertion (pid) order — points.c:226-245") {
    val dup = Seq(("s", 5L, 1L, 0L), ("s", 5L, 2L, 1L), ("s", 5L, 3L, 2L),
      ("s", 7L, 4L, 3L), ("s", 7L, 5L, 4L), ("s", 8L, 6L, 5L))
      .toDF("series", "ts", "val", "pid")
    assert(runL(dup, Agg(First, None)) === Seq((5L, 1L)))
    assert(runL(dup, Agg(Last, None)) === Seq((8L, 6L)))
    assert(runL(dup, Tail(2)) === Seq((7L, 5L), (8L, 6L)))
    assert(runL(dup, Difference) ===
      Seq((5L, 1L), (5L, 1L), (7L, 1L), (7L, 1L), (8L, 1L)))
    // pid survives a pairwise stage so later order-dependent stages
    // stay deterministic (round-1 ADVICE item 3)
    assert(runL(dup, Difference, Head(2)) === Seq((5L, 1L), (5L, 1L)))
  }

  test("limit(N, fn) re-buckets only series above N points — aggregate.c:677-694") {
    // 10 points, N=4: gb = (27-3)/4 + 1 = 7, offset = (3-1) % 7 = 2
    // buckets (right-aligned, +2): 3->9? GROUP_TS: ((3+6)/7)*7+2 = 9
    val r = runL(fixture, LimitFn(4, Count))
    assert(r.map(_._2).sum === 10L) // every point lands in a bucket
    assert(r.size <= 5)
    val small = runL(fixture, LimitFn(100, Count))
    assert(small === TS.zip(VALS)) // untouched passthrough
  }

  test("limit(N, fn) equals the reference greedy scan on dense AND sparse series") {
    // the reference's per-group label is GROUP_TS(first point of the
    // group), assigned in a sequential scan (aggregate.c:1188-1210);
    // this reimplements that scan literally to compare against
    def greedy(ts: Seq[Long], n: Int): Seq[(Long, Long)] = {
      val gb = (ts.last - ts.head) / n + 1
      val off = (ts.head - 1) % gb
      def gts(p: Long) = (p + gb - 1) / gb * gb + off
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var b = gts(ts.head); var cnt = 0L
      ts.foreach { p =>
        if (p > b) { out += ((b, cnt)); b = gts(p); cnt = 0L }
        cnt += 1
      }
      (out += ((b, cnt))).toList
    }
    // dense series (every slot occupied)
    val denseTs = (3L to 22L)
    val dense = denseTs.zipWithIndex
      .map { case (t, i) => ("d", t, 1L, i.toLong) }
      .toDF("series", "ts", "val", "pid")
    assert(runL(dense, LimitFn(6, Count)) === greedy(denseTs, 6))
    // sparse series: gb=3 off=2, points {3,5,7} — the post-gap start 7
    // has 7 mod 3 = 1 <= off, so greedy labels the second group 11,
    // one gb past the dense grid; the streaming label scan must match
    val sparse = Seq(("s", 3L, 1L, 0L), ("s", 5L, 1L, 1L), ("s", 7L, 1L, 2L))
      .toDF("series", "ts", "val", "pid")
    assert(greedy(Seq(3L, 5L, 7L), 2) === Seq((5L, 2L), (11L, 1L)))
    assert(runL(sparse, LimitFn(2, Count)) === greedy(Seq(3L, 5L, 7L), 2))
    // the reference fixture too (gaps at 16..24 relative to gb)
    assert(runL(fixture, LimitFn(4, Count)) === greedy(TS, 4))
    assert(runL(fixture, LimitFn(3, Count)) === greedy(TS, 3))
  }

  test("int64 sum/difference overflow is an error, not a wrap — aggregate.c:1646-1652") {
    // the itest 'huge' fixture: values at int64 max must not wrap
    val huge = Seq(("huge", 1L, Long.MaxValue, 0L), ("huge", 2L, Long.MaxValue - 1, 1L))
      .toDF("series", "ts", "val", "pid")
    val e1 = intercept[Exception](Pipeline(huge, Seq(Agg(Sum, None))).collect())
    assert(e1.getMessage.contains("Overflow detected while using sum()"))
    val neg = Seq(("huge", 1L, Long.MaxValue, 0L), ("huge", 2L, -10L, 1L))
      .toDF("series", "ts", "val", "pid")
    val e2 = intercept[Exception](Pipeline(neg, Seq(Difference)).collect())
    assert(e2.getMessage.contains("Overflow detected while using difference()"))
    // non-overflowing values still flow through the checked paths
    assert(runL(fixture, Agg(Sum, None)) === Seq((27L, 35L)))
    assert(runL(fixture, Agg(DifferenceAgg, Some(30))) === Seq((30L, 2L)))
  }

  test("merge applies the using-chain after the union — listener.c:6727-6810") {
    val two = Seq(("a", 1L, 1L, 0L), ("a", 5L, 2L, 1L),
      ("b", 1L, 10L, 2L), ("b", 6L, 20L, 3L))
      .toDF("series", "ts", "val", "pid")
    val merged = Pipeline.merge(two, "m", Seq(Agg(Sum, Some(5)), Difference))
      .orderBy("ts").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // sum(5): bucket 5 -> 13, bucket 10 -> 20; difference -> (10, 7)
    assert(merged.toSeq === Seq(("m", 10L, 7L)))
  }
}
