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
