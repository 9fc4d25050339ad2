package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.expr

/** The DivComparisonPushdown rule only ADDS implied conjuncts, so
  * results must be identical with the rule active — including for
  * negative values, where Spark's truncate-toward-zero `div` differs
  * from floor (the reason thresholds below 1 are never rewritten). */
class DivPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("div-comparison filters keep exact semantics across sign boundaries") {
    import spark.implicits._
    val vals: Seq[Long] = (-2005L to 2005L by 3L) ++
      Seq(-1000L, -999L, -1L, 0L, 999L, 1000L, 1999L, 2000L, 2001L,
        Long.MaxValue, Long.MinValue + 1)
    val df = vals.toDF("a")
    def tdiv(a: Long): Long = a / 1000L // Scala / truncates like Spark div
    val cases: Seq[(String, Long => Boolean)] = Seq(
      ("a div 1000 >= 2", a => tdiv(a) >= 2),
      ("a div 1000 > 1", a => tdiv(a) > 1),
      ("a div 1000 < 2", a => tdiv(a) < 2),
      ("a div 1000 <= 1", a => tdiv(a) <= 1),
      ("a div 1000 = 2", a => tdiv(a) == 2),
      // thresholds where truncation != floor: must NOT be rewritten,
      // and must still be correct
      ("a div 1000 >= 0", a => tdiv(a) >= 0),
      ("a div 1000 < 0", a => tdiv(a) < 0),
      ("a div 1000 <= 0", a => tdiv(a) <= 0),
      ("2 <= a div 1000", a => 2 <= tdiv(a)),
      ("2 > a div 1000", a => 2 > tdiv(a)))
    cases.foreach { case (sql, want) =>
      val got = df.where(expr(sql)).collect().map(_.getLong(0)).toSet
      assert(got === vals.filter(want).toSet, sql)
    }
  }
}
