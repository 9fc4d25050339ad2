package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-linearity dataset generator: replicates the driver's sf0.1
  * tables `copies`× into a local sf1-equivalent, preserving every
  * bench query's selectivity semantics.
  *
  * - `events` replicates along TIME: each copy shifts all timestamps
  *   by a full span (+1 h gap), so the same series carry copies× the
  *   points — the "longer history" axis a TSDB actually grows on.
  *   Series names (f.<type>.<uid%8>) are untouched, so every regex /
  *   family selection matches exactly the same fraction of data.
  * - `documents` / `embeddings` replicate along ID space: offset keys,
  *   with a per-copy marker token appended to replica text so exact /
  *   near-dup populations scale linearly instead of exploding into
  *   cross-copy duplicate clusters.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir] [outDir] [copies]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/tmp_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.core.Tables
      .sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Tables.events normalizes ts to epoch-ns LONG whatever the
    // parquet physical type is; the scaled copy is written back as
    // that long, which round-trips through Tables.events unchanged.
    val ev = graft.core.Tables.events(spark, src)
    // ts is epoch-ns LONG; shift whole spans
    val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
    val span = bounds.getLong(1) - bounds.getLong(0) + 3600L * 1000000000L
    val evScaled = (0 until copies).map { k =>
      ev.withColumn("ts", col("ts") + lit(k * span))
        .withColumn("event_id", col("event_id") + lit(k * 1000000000000L))
    }.reduce(_ unionByName _)
    evScaled.write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsScaled = (0 until copies).map { k =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
      if (k == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" zreplica$k")))
    }.reduce(_ unionByName _)
    docsScaled.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embScaled = (0 until copies).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
    }.reduce(_ unionByName _)
    embScaled.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("events", "documents", "embeddings").foreach { t =>
      println(s"$t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
