package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (tests run in one forked
  * JVM; the session is never stopped — the fork exits). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.core.Tables.sessionBuilder("local[4]", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
