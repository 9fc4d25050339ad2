package graft.server

/** Standalone server entry point: starts the HTTP façade over an
  * Ingest store. Usage: runMain graft.server.Main <storeDir> [port] */
object Main {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse("/tmp/graft-store")
    val port = args.lift(1).map(_.toInt).getOrElse(9080)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Tables.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val api = new HttpApi(spark, storeDir, port)
    val bound = api.start()
    println(s"graft server listening on http://127.0.0.1:$bound  (store: $storeDir)")
    Thread.currentThread().join()
  }
}
