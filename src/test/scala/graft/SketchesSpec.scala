package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{SeriesStore, Sketches}

/** Pins the sketch aggregates' error bounds against the exact
  * operators on the shipped sf0.01 data — approximate results can't
  * hash-match a DuckDB oracle, so THIS is their correctness gate. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("HLL distinct within 5% of exact; sketched percentiles within the exact value range") {
    val pts = SeriesStore.pointsF(spark, "/root/testdata/sf0.01")
    val approx = Sketches.approxSeriesStats(pts).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = pts.groupBy(col("series")).agg(
        countDistinct(col("ts")).as("n"),
        expr("percentile(val, 0.5)").as("p50"),
        expr("percentile(val, 0.95)").as("p95"),
        min(col("val")).as("lo"), max(col("val")).as("hi"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (s, (n, p50, p95, lo, hi)) =>
      val (an, ap50, ap95) = approx(s)
      assert(math.abs(an - n).toDouble / n <= 0.05,
        s"$s: HLL $an vs exact $n drifts > 5%")
      // the quantile sketch returns an actual data value near the
      // requested rank; with accuracy 10000 on ~1-2k points per
      // series it is exact up to interpolation of the rank itself
      assert(ap50 >= lo && ap50 <= hi && ap95 >= lo && ap95 <= hi)
      assert(ap50 <= ap95, s"$s: p50 $ap50 > p95 $ap95")
      val spread = hi - lo
      assert(math.abs(ap50 - p50) <= 0.05 * spread + 1e-9,
        s"$s: sketch p50 $ap50 vs exact $p50")
      assert(math.abs(ap95 - p95) <= 0.05 * spread + 1e-9,
        s"$s: sketch p95 $ap95 vs exact $p95")
    }
  }
}
