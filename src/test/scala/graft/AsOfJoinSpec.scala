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
