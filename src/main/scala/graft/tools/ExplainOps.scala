package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan audit: print the formatted physical plan of named
  * SparkEntry queries (the `.explain` pass the build rules require
  * after each operator lands). Usage:
  *   runMain graft.tools.ExplainOps <sfDir> <name>[,<name>...]
  */
object ExplainOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse {
      println("usage: ExplainOps <sfDir> <name>[,<name>...]\navailable:")
      graft.SparkEntry.queries.keys.toSeq.sorted.foreach(n => println(s"  $n"))
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = graft.core.Tables
      .sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query '$n' — run with no name arg to list")
      }
      graft.parser.Planner.drainQueryCaches()
    }
    spark.stop()
  }
}
