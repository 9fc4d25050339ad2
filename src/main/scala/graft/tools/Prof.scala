package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Optimization-round diagnostics (not part of the driver contract).
  *
  * PlanDump: write `.explain("formatted")` for a comma-separated list
  * of registered queries (or every headline entry) to a directory —
  * the evidence files the optimization round commits under plans/rNN.
  *
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r17 _before ann_pq_topk,..."
  *
  * Prof: run one query with the bench's exact hash action and print
  * per-Spark-job wall times (job id, description, seconds) so the
  * expensive entries' time can be attributed to training loops /
  * checkpoints / the final action instead of guessed at.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Prof /root/testdata/sf0.1 ann_ivfpq_topk 2"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "_before"
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSeq
      else graft.Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.ClusterFixture.mergedEnv(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    names.filter(qs.contains).foreach { name =>
      try {
        val df = qs(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"PLANDUMP wrote $name")
      } catch {
        case e: Throwable => System.err.println(s"PLANDUMP FAILED $name: $e")
      } finally graft.parser.Planner.drainQueryCaches()
    }
    spark.stop()
  }
}

object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("events", "documents", "embeddings")
      .foreach(t => graft.core.Tables.load(spark, sfDir, t).count())
    graft.queries.ClusterFixture.mergedEnv(spark, sfDir)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          println(f"JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%8.3f s  $desc")
        }
      }
    })
    val qs = graft.SparkEntry.queries
    for (r <- 1 to reps) {
      println(s"=== rep $r: $name ===")
      val t0 = System.nanoTime()
      val df = qs(name)(spark, sfDir)
      val tPlan = System.nanoTime()
      val h = df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(bit_xor(col("h"))).collect()(0)
      val t1 = System.nanoTime()
      // listener events drain asynchronously; give them a beat
      Thread.sleep(300)
      println(f"TOTAL ${(t1 - t0) / 1e9}%.3f s (construct ${(tPlan - t0) / 1e9}%.3f, action ${(t1 - tPlan) / 1e9}%.3f) HASH ${h}")
      graft.parser.Planner.drainQueryCaches()
    }
    spark.stop()
  }
}
