package graft.server

/** Standalone server entry point: starts the HTTP façade and the
  * CPROTO/qpack TCP transport over one shared Ingest store.
  * Usage: runMain graft.server.Main <storeDir> [httpPort] [tcpPort] */
object Main {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse("/tmp/graft-store")
    val port = args.lift(1).map(_.toInt).getOrElse(9080)
    val tcpPort = args.lift(2).map(_.toInt).getOrElse(9000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Tables.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val core = new ApiCore(spark, storeDir)
    val api = new HttpApi(spark, storeDir, port, Some(core))
    val tcp = new TcpApi(spark, storeDir, tcpPort, Some(core))
    val bound = api.start()
    val tcpBound = tcp.start()
    println(s"graft server listening on http://127.0.0.1:$bound " +
      s"and cproto://127.0.0.1:$tcpBound  (store: $storeDir)")
    Thread.currentThread().join()
  }
}
