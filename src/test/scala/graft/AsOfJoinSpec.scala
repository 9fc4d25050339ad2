package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.AsOfJoin

/** Pins the as-of join's edge semantics: equal-timestamp right rows
  * ARE visible (<=, not <), heads with no preceding right point get
  * null, keys never bleed into each other. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOf: <= tie visibility, null heads, per-key isolation") {
    val left = Seq(
      ("x", 5L, 1.0), ("x", 10L, 2.0), ("x", 20L, 3.0),
      ("y", 10L, 4.0)
    ).toDF("k", "ts", "val")
    val right = Seq(
      ("x", 10L, 100L), ("x", 15L, 150L),
      ("y", 99L, 999L)
    ).toDF("k", "ts", "bval")
    val out = AsOfJoin.asOf(left, right, key = "k", ts = "ts",
      rightVal = "bval").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(("x", 5L)) === None, "head before any right point is null")
    assert(out(("x", 10L)) === Some(100L), "equal-ts right row is visible")
    assert(out(("x", 20L)) === Some(150L), "latest preceding value carries")
    assert(out(("y", 10L)) === None, "y's only right point is later; x never bleeds")
  }

  test("asOf: a matched right row with a NULL value yields null, not an older value") {
    // DuckDB/kdb ASOF returns the MATCHED row's value even when that
    // value is null — the carried struct box must not skip it
    val left = Seq(("x", 25L, 0.0)).toDF("k", "ts", "val")
    val right = Seq(("x", 10L, Some(100L)), ("x", 20L, None))
      .toDF("k", "ts", "bval")
    val out = AsOfJoin.asOf(left, right, key = "k", ts = "ts",
      rightVal = "bval").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(3),
      "ts=20 is the as-of match; its null value must be returned, not ts=10's 100")
  }

  test("asOf forward: smallest right ts >= left ts; equal ts visible; tails null") {
    val left = Seq(
      ("x", 5L, 1.0), ("x", 10L, 2.0), ("x", 20L, 3.0),
      ("y", 10L, 4.0)
    ).toDF("k", "ts", "val")
    val right = Seq(
      ("x", 10L, 100L), ("x", 15L, 150L),
      ("y", 5L, 555L)
    ).toDF("k", "ts", "bval")
    val out = AsOfJoin.asOf(left, right, key = "k", ts = "ts",
      rightVal = "bval", forward = true).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(("x", 5L)) === Some(100L), "next observation at ts 10")
    assert(out(("x", 10L)) === Some(100L), "equal-ts right row is visible forward too")
    assert(out(("x", 20L)) === None, "tail past the last right point is null")
    assert(out(("y", 10L)) === None, "y's only right point is earlier")
  }

  test("asOf tolerance: stale matches null out; in-range matches and semantics unchanged") {
    val left = Seq(("x", 100L, 1.0), ("x", 2000L, 2.0)).toDF("k", "ts", "val")
    val right = Seq(("x", 90L, 9L)).toDF("k", "ts", "bval")
    val out = AsOfJoin.asOf(left, right, key = "k", ts = "ts",
      rightVal = "bval", tolerance = 600L).collect()
      .map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(100L) === Some(9L), "10 s stale: within tolerance")
    assert(out(2000L) === None, "1910 s stale: nulled by the tolerance")
    // tolerance composes with forward
    val fwd = AsOfJoin.asOf(left, right.union(Seq(("x", 2100L, 21L))
        .toDF("k", "ts", "bval")), key = "k", ts = "ts",
      rightVal = "bval", forward = true, tolerance = 50L).collect()
      .map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(fwd(2000L) === None, "next observation is 100 s ahead: outside 50 s")
    assert(fwd(100L) === None, "no forward match within 50 s")
  }

  test("rangeJoin: inclusive bounds, empty windows report 0, never a nested loop") {
    val pts = Seq(5L, 10L, 100L, 3600L, 3661L).toDF("ts")
    val iv = Seq((1L, 0L, 10L), (2L, 50L, 3600L), (3L, 9000L, 9100L))
      .toDF("aid", "lo", "hi")
    val out = graft.engine.RangeJoin
      .bucketedCount(pts, "ts", iv, "aid", "lo", "hi", bucket = 100L)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // [0,10] contains 5 and 10 (inclusive hi); [50,3600] contains 100
    // and 3600; [9000,9100] is empty but still reported
    assert(m === Map(1L -> 2L, 2L -> 2L, 3L -> 0L), m.toString)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bucketization must keep the theta join an equi-join:\n" + p)
  }
}
