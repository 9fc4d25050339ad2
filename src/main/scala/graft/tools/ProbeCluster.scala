package graft.tools

import org.apache.spark.sql.functions._
import graft.parser.Planner
import graft.queries.{ClusterFixture, QlQueries}

/** Throwaway probe: where does cluster_select_sum_between spend its
  * time vs the standalone entry? NOT part of the driver contract. */
object ProbeCluster {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = "select sum(1h) from /^i\\.click\\..*/ between 1705000000 and 1706000000"

    def act(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(col("h"))).collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm the fixture (ingest happens here, not in the reps)
    time("fixture-build")(ClusterFixture.mergedEnv(spark, sf))

    (1 to 5).foreach { i =>
      val env = time(s"rep$i mergedEnv")(ClusterFixture.mergedEnv(spark, sf))
      val df = time(s"rep$i plan")(Planner.query(q, env, now = Some(1706659200L)))
      time(s"rep$i exec")(act(df.orderBy(df.columns.map(col).toIndexedSeq: _*)))
      Planner.drainQueryCaches()
    }
    // standalone comparison through the same harness
    val qs = graft.SparkEntry.queries
    (1 to 5).foreach { i =>
      time(s"rep$i standalone")(act(qs("ql_select_sum_between")(spark, sf)))
      Planner.drainQueryCaches()
    }
    (1 to 5).foreach { i =>
      time(s"rep$i cluster-e2e")(act(qs("cluster_select_sum_between")(spark, sf)))
      Planner.drainQueryCaches()
    }
    spark.stop()
  }
}
