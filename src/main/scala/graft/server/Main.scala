package graft.server

/** Standalone server entry point: starts the HTTP façade, the
  * CPROTO/qpack TCP transport, and the named-pipe transport over one
  * shared database registry.
  * Usage: runMain graft.server.Main <storeDir> [httpPort] [tcpPort] [pipePath] */
object Main {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse("/tmp/graft-store")
    val port = args.lift(1).map(_.toInt).getOrElse(9080)
    val tcpPort = args.lift(2).map(_.toInt).getOrElse(9000)
    val pipePath = args.lift(3).getOrElse("/tmp/graft.sock")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Tables.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reg = new ServerRegistry(spark, "graft", storeDir)
    val api = new HttpApi(spark, storeDir, port, Some(reg))
    val tcp = new TcpApi(spark, storeDir, tcpPort, Some(reg))
    val pipe = new PipeApi(spark, storeDir, pipePath, Some(reg))
    val bound = api.start()
    val tcpBound = tcp.start()
    val pipeBound = pipe.start()
    println(s"graft server listening on http://127.0.0.1:$bound, " +
      s"cproto://127.0.0.1:$tcpBound and pipe $pipeBound  (store: $storeDir)")
    Thread.currentThread().join()
  }
}
