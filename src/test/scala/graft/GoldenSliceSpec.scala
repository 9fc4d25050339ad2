package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.server.HttpApi

/** The SURVEY §7.2 minimum slice, end-to-end over the wire with the
  * reference's own integration fixture: the 20-point `aggr` series
  * (itest/test_select.py:41-51) inserted through /insert and queried
  * with the reference's golden expectations
  * (itest/test_select.py:166-175). */
class GoldenSliceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val client = HttpClient.newHttpClient()

  private def post(url: String, body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  test("select sum(1h)/count(1h) from 'aggr' reproduce the reference goldens") {
    val dir = Files.createTempDirectory("graft-golden").toString
    val api = new HttpApi(spark, dir)
    val port = api.start()
    val base = s"http://127.0.0.1:$port"
    try {
      val aggr = Seq(
        (1447250868, 530), (1447251168, 520), (1447249033, 531),
        (1447249337, 534), (1447249633, 535), (1447249937, 531),
        (1447250249, 532), (1447250549, 537), (1447251449, 54),
        (1447251749, 54), (1447252049, 513), (1447252349, 537),
        (1447253244, 533), (1447253549, 538), (1447253849, 534),
        (1447254149, 532), (1447252649, 528), (1447252968, 531),
        (1447254449, 533), (1447254748, 537))
      val points = aggr.map { case (t, v) => s"[$t, $v]" }.mkString(",")
      val ins = post(s"$base/insert/graft", s"""{"aggr": [$points]}""")
      assert(ins.contains("Successfully inserted 20 point(s)."))

      // itest/test_select.py:166-170
      val sum = post(s"$base/query/graft", """{"q": "select sum(1h) from 'aggr'"}""")
      assert(sum ===
        """{"aggr":[[1447250400,2663],[1447254000,5409],[1447257600,1602]]}""")

      // itest/test_select.py:172-175
      val cnt = post(s"$base/query/graft", """{"q": "select count(1h) from 'aggr'"}""")
      assert(cnt ===
        """{"aggr":[[1447250400,5],[1447254000,12],[1447257600,3]]}""")

      // the remaining aggregation goldens over the same fixture
      // (itest/test_select.py:176-250), compared numerically with the
      // itest's assertAlmostEqual tolerance for float buckets
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def golden(q: String, want: Seq[(Long, Double)]): Unit = {
        val res = mapper.readTree(post(s"$base/query/graft", s"""{"q": "$q"}"""))
        val got = res.get("aggr")
        assert(got != null && got.size() === want.size, s"$q → $res")
        want.zipWithIndex.foreach { case ((ts, v), i) =>
          assert(got.get(i).get(0).asLong() === ts, s"$q bucket $i ts")
          assert(math.abs(got.get(i).get(1).asDouble() - v) < 1e-9,
            s"$q bucket $i val: ${got.get(i).get(1).asDouble()} vs $v")
        }
      }
      golden("select mean(1h) from 'aggr'", Seq(
        1447250400L -> 532.6, 1447254000L -> 450.75, 1447257600L -> 534.0))
      golden("select median(1h) from 'aggr'", Seq(
        1447250400L -> 532.0, 1447254000L -> 530.5, 1447257600L -> 533.0))
      golden("select median_low(1h) from 'aggr'", Seq(
        1447250400L -> 532, 1447254000L -> 530, 1447257600L -> 533))
      golden("select median_high(1h) from 'aggr'", Seq(
        1447250400L -> 532, 1447254000L -> 531, 1447257600L -> 533))
      golden("select min(1h) from 'aggr'", Seq(
        1447250400L -> 531, 1447254000L -> 54, 1447257600L -> 532))
      golden("select max(1h) from 'aggr'", Seq(
        1447250400L -> 535, 1447254000L -> 538, 1447257600L -> 537))
      golden("select variance(1h) from 'aggr'", Seq(
        1447250400L -> 3.3, 1447254000L -> 34396.931818181816,
        1447257600L -> 7.0))
      golden("select pvariance(1h) from 'aggr'", Seq(
        1447250400L -> 2.6399999999999997, 1447254000L -> 31530.520833333332,
        1447257600L -> 4.666666666666667))
      golden("select difference(1h) from 'aggr'", Seq(
        1447250400L -> 1, 1447254000L -> -3, 1447257600L -> 5))
      golden("select derivative(1, 1h) from 'aggr'", Seq(
        1447250400L -> 0.0002777777777777778,
        1447254000L -> -0.0008333333333333333,
        1447257600L -> 0.001388888888888889))
      val filt = post(s"$base/query/graft", """{"q": "select filter(>534) from 'aggr'"}""")
      assert(filt ===
        """{"aggr":[[1447249633,535],[1447250549,537],[1447252349,537],[1447253549,538],[1447254748,537]]}""")

      // the between-form of the slice restricts to [A, B)
      val between = post(s"$base/query/graft",
        """{"q": "select sum(1h) from 'aggr' between 1447249033 and 1447254749"}""")
      assert(between ===
        """{"aggr":[[1447250400,2663],[1447254000,5409],[1447257600,1602]]}""")

      // the huge fixture (itest/test_select.py): int64-max values stay
      // exact through insert + select, and sum() errors instead of
      // wrapping (aggregate.c:1646-1652)
      val insHuge = post(s"$base/insert/graft",
        """{"huge": [[1471254705, 9223372036854775807], [1471254706, 9223372036854775806]]}""")
      assert(insHuge.contains("2 point(s)"))
      val huge = post(s"$base/query/graft", """{"q": "select * from 'huge'"}""")
      assert(huge ===
        """{"huge":[[1471254705,9223372036854775807],[1471254706,9223372036854775806]]}""")
      val overflow = post(s"$base/query/graft", """{"q": "select sum(1h) from 'huge'"}""")
      assert(overflow.contains("Overflow detected while using sum()"), overflow)

      // string ("log") series over the wire (itest/test_log.py shape):
      // insert text values, filter with ~, type errors for numeric fns
      val insLog = post(s"$base/insert/graft",
        """{"app log": [[100, "started"], [200, "error: disk"], [300, "stopped"]]}""")
      assert(insLog.contains("3 point(s)"))
      val logSel = post(s"$base/query/graft",
        """{"q": "select filter(~ 'error') from 'app log'"}""")
      assert(logSel === """{"app log":[[200,"error: disk"]]}""")
      val logType = post(s"$base/query/graft", """{"q": "select sum(1h) from 'app log'"}""")
      assert(logType.contains("Cannot use sum() on string type."), logType)
      val logLast = post(s"$base/query/graft", """{"q": "select last() from 'app log'"}""")
      assert(logLast === """{"app log":[[300,"stopped"]]}""")
    } finally api.stop()
  }
}
