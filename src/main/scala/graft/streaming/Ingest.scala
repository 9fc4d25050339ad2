package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.SeriesStore

/** Continuous ingest with SiriDB's semantics (SURVEY §2.10): no
  * watermark — out-of-order and duplicate timestamps are accepted at
  * any time (sorted insert src/siri/db/points.c:226-245), and queries
  * always see every ingested point (read = buffer ∪ shards,
  * src/siri/db/series.c:914-996).
  *
  * Layout under `storeDir`:
  *   points/shard=<ts div shardDuration>/...parquet  — the fact table,
  *     time-bucketed like the reference's shards (src/siri/db/shard.c)
  *     so ts-range queries prune whole directories;
  *   catalog.parquet — (series, type, length, start, end, pool),
  *     upserted incrementally per micro-batch (the analog of the
  *     reference's series.dat); `list`/`count series length` and the
  *     bare count()/first()/last() skip-points fast path read ONLY
  *     this — never the fact table (aggregate.c:495-510).
  *
  * At scale each micro-batch append is a partitioned parquet write and
  * the catalog upsert aggregates only the batch (plus a catalog-sized
  * merge) — nothing re-scans history.
  */
object Ingest {

  /** Wire form of one inserted point (insert.c:93-126 validates the
    * same shape: series name, integer ts, numeric value). Integer
    * values ride in `val_int` so int64 stays exact past 2^53 — the
    * reference's integer type is true int64 (points.h:9-14) and the
    * itest `huge` fixture pins values at Long.MaxValue. */
  final case class PointIn(series: String, ts: Long, val_num: Double,
      tp: String, pid: Long, val_int: Long = 0L, val_str: String = "")

  def pointsPath(dir: String) = s"$dir/points"
  def catalogPath(dir: String) = s"$dir/catalog.parquet"

  /** Start the ingest stream: any streaming source with PointIn rows →
    * shard-partitioned append + incremental catalog upsert. `tee`
    * mirrors every inserted batch to a second location, the analog of
    * the reference's tee pipe (src/siri/db/tee.c). */
  def start(src: DataFrame, storeDir: String, checkpoint: String,
      shardDuration: Long = 86400L, tee: Option[String] = None): StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = if (tee.isDefined) batch.persist() else batch
        tee.foreach(t => b.write.mode("append").parquet(t))
        appendBatch(b, storeDir, shardDuration)
        if (tee.isDefined) b.unpersist()
        ()
      }
      .start()

  /** One micro-batch: coerce values to the series' established type,
    * append points, merge the batch's per-series stats into the
    * catalog. Runs sequentially per stream (Spark serializes
    * foreachBatch calls).
    *
    * Type rule (siridb_series_ensure_type, src/siri/db/series.c:1141):
    * the FIRST point ever inserted fixes a series' type; later points
    * of another type are coerced to it (int<->double casts, strings
    * parsed leniently), never rejected — so the catalog type can never
    * silently flip. */
  def appendBatch(batch: DataFrame, storeDir: String, shardDuration: Long): Unit = {
    val spark = batch.sparkSession
    val withExtra = Seq("val_int" -> lit(0L), "val_str" -> lit(""))
      .foldLeft(batch) { case (df, (c, d)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, d)
      }
    val raw = withExtra.select(col("series"), col("ts"),
      col("val_num").as("val"), col("val_int"), col("val_str"),
      col("tp"), col("pid"))

    val catPath = catalogPath(storeDir)
    val fs = new Path(storeDir).getFileSystem(spark.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(new Path(catPath))) spark.read.parquet(catPath)
      else spark.sql(
        """SELECT '' AS series, 0L AS `length`, 0L AS `start`, 0L AS `end`,
          |'' AS `type`, 0L AS pool, '' AS first_val, '' AS last_val""".stripMargin)
        .limit(0)

    // established type = existing catalog type, else the type of the
    // series' first point within this batch (deterministic by ts, pid)
    val batchTypes = raw.groupBy(col("series"))
      .agg(min_by(col("tp"), struct(col("ts"), col("pid"))).as("batch_tp"))
    val pts = raw
      .join(existing.select(col("series"), col("type").as("ex_tp")), Seq("series"), "left")
      .join(batchTypes, Seq("series"))
      .withColumn("etp", coalesce(col("ex_tp"), col("batch_tp")))
      .withColumn("c_int", when(col("etp") === "integer",
        when(col("tp") === "integer", col("val_int"))
          .when(col("tp") === "float", col("val").cast("long"))
          .otherwise(coalesce(expr("try_cast(val_str AS BIGINT)"), lit(0L))))
        .otherwise(lit(0L)))
      .withColumn("c_num", when(col("etp") === "float",
        when(col("tp") === "float", col("val"))
          .when(col("tp") === "integer", col("val_int").cast("double"))
          .otherwise(coalesce(expr("try_cast(val_str AS DOUBLE)"), lit(0.0))))
        .when(col("etp") === "integer", col("c_int").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("c_str", when(col("etp") === "string",
        when(col("tp") === "string", col("val_str"))
          .when(col("tp") === "integer", col("val_int").cast("string"))
          .otherwise(col("val").cast("string")))
        .otherwise(lit("")))
      .select(col("series"), col("ts"), col("c_num").as("val"),
        col("c_int").as("val_int"), col("c_str").as("val_str"),
        col("etp").as("tp"), col("pid"))

    pts.withColumn("shard", expr(s"ts div $shardDuration"))
      .write.mode("append").partitionBy("shard").parquet(pointsPath(storeDir))

    // canonical string form of the typed value — carried in the
    // catalog so bare first()/last() never read point data
    // (aggregate.c:495-510); long/double round-trip exactly
    val vstr = when(col("tp") === "integer", col("val_int").cast("string"))
      .when(col("tp") === "string", col("val_str"))
      .otherwise(col("val").cast("string"))
    val ord = struct(col("ts"), col("pid"))
    val delta = pts.withColumn("vstr", vstr)
      .groupBy(col("series"))
      .agg(count(lit(1)).as("length"), min(col("ts")).as("start"),
        max(col("ts")).as("end"), first(col("tp")).as("type"),
        min_by(col("vstr"), ord).as("first_val"),
        max_by(col("vstr"), ord).as("last_val"))

    // catalog-sized full-outer merge; the delta side is one batch
    val merged = existing.alias("e")
      .join(delta.alias("d"), Seq("series"), "full_outer")
      .select(col("series"),
        (coalesce(col("e.length"), lit(0L)) + coalesce(col("d.length"), lit(0L)))
          .cast("long").as("length"),
        least(col("e.start"), col("d.start")).as("start"),
        greatest(col("e.end"), col("d.end")).as("end"),
        coalesce(col("e.type"), col("d.type")).as("type"),
        when(col("e.start").isNull || col("d.start") < col("e.start"),
          col("d.first_val")).otherwise(col("e.first_val")).as("first_val"),
        when(col("e.end").isNull || col("d.end") >= col("e.end"),
          col("d.last_val")).otherwise(col("e.last_val")).as("last_val"))
      .withColumn("pool", SeriesStore.poolOf("series"))
    val tmp = new Path(catPath + ".tmp")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(new Path(catPath), true)
    fs.rename(tmp, new Path(catPath))
  }

  /** True when the path holds actual data (shard dirs or parquet
    * parts) — an existing dir with only _SUCCESS markers left after
    * `drop shards` counts as empty. */
  private def existsNonEmpty(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName.startsWith("shard=") ||
        st.getPath.getName.endsWith(".parquet")
    }
  }

  /** The queryable store: all ingested points (buffer ∪ shards). A
    * fresh or fully-dropped store is an empty frame, not an error.
    * `val` is the numeric view (double); `val_int` carries the exact
    * int64 for integer series. */
  def points(spark: SparkSession, storeDir: String): DataFrame =
    if (!existsNonEmpty(spark, pointsPath(storeDir)))
      spark.sql(
        "SELECT '' AS series, 0L AS ts, 0D AS val, 0L AS val_int, '' AS val_str, 0L AS pid")
        .limit(0)
    else spark.read.parquet(pointsPath(storeDir))
      .select(col("series"), col("ts"), col("val"), col("val_int"),
        col("val_str"), col("pid"))

  /** Time-range read with shard pruning: the ts predicate is pushed
    * into the parquet row groups AND translated to a predicate on the
    * `shard` partition column, so out-of-range shard directories are
    * never listed — the analog of the reference's shard index pruning
    * (src/siri/db/series.c:927-938). */
  def pointsRange(spark: SparkSession, storeDir: String,
      after: Option[Long], before: Option[Long],
      shardDuration: Long = 86400L): DataFrame = {
    if (!existsNonEmpty(spark, pointsPath(storeDir)))
      return points(spark, storeDir) // empty frame with the right schema
    val df = spark.read.parquet(pointsPath(storeDir))
    val filters = Seq(
      after.map(a => col("ts") >= a && col("shard") >= a / shardDuration),
      before.map(b => col("ts") < b && col("shard") <= b / shardDuration)).flatten
    filters.foldLeft(df)(_ where _)
      .select(col("series"), col("ts"), col("val"), col("val_int"),
        col("val_str"), col("pid"))
  }

  /** Shard compaction — the analog of the reference's background
    * optimize (src/siri/optimize.c): every micro-batch append leaves
    * one file per shard per batch; this maintenance job rewrites each
    * shard directory that has accumulated more than `maxFiles`
    * fragments into a single sorted file (series, ts, pid order — the
    * read-side ordering), so scans stay sequential as a store ages.
    * `dropped` (the tombstone name frame from `drop series`) is
    * anti-joined during the rewrite, physically purging dropped
    * series the way the reference's optimize drops their blocks.
    * Returns the number of compacted shards. */
  def compact(spark: SparkSession, storeDir: String, maxFiles: Int = 4,
      dropped: Option[DataFrame] = None): Int = {
    val dir = new Path(pointsPath(storeDir))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return 0
    val shards = fs.listStatus(dir).filter(_.getPath.getName.startsWith("shard="))
    val fragmented = shards.filter { st =>
      val n = fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet"))
      n > maxFiles || (dropped.isDefined && n > 0)
    }
    fragmented.foreach { st =>
      val tmp = new Path(st.getPath.toString + ".compact")
      val raw = spark.read.parquet(st.getPath.toString)
      val kept = dropped.fold(raw)(d =>
        raw.join(d.select(col("series")), Seq("series"), "left_anti"))
      kept.sort(col("series"), col("ts"), col("pid"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(st.getPath, true)
      fs.rename(tmp, st.getPath)
    }
    fragmented.length
  }

  /** Shard expiration (TTL) — the retention job behind
    * `alter database set expiration_num <t>`
    * (src/siri/db/db.c:865-878, itest/test_expiration.py): deletes
    * whole shard directories whose time range ended before
    * `now - expiration`, then rebuilds the catalog from the surviving
    * shards (the reference likewise re-indexes after expiry). Returns
    * the number of dropped shards. */
  def expire(spark: SparkSession, storeDir: String, expiration: Long,
      now: Long, shardDuration: Long = 86400L): Int = {
    val cutoffShard = (now - expiration) / shardDuration
    val dir = new Path(pointsPath(storeDir))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return 0
    val old = fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("shard="))
      .filter(_.getPath.getName.stripPrefix("shard=").toLong < cutoffShard)
    old.foreach(st => fs.delete(st.getPath, true))
    if (old.nonEmpty) {
      // rebuild catalog stats from what survives (one pass, off the
      // ingest hot path — expiry is a maintenance job)
      val pts = points(spark, storeDir)
      val cat = catalog(spark, storeDir).select(col("series"), col("type"))
      val typed = pts.join(cat, Seq("series"), "left")
        .withColumn("type", coalesce(col("type"), lit("float")))
      val vstr = when(col("type") === "integer", col("val_int").cast("string"))
        .when(col("type") === "string", col("val_str"))
        .otherwise(col("val").cast("string"))
      val ord = struct(col("ts"), col("pid"))
      val rebuilt = typed.withColumn("vstr", vstr)
        .groupBy(col("series"))
        .agg(count(lit(1)).as("length"), min(col("ts")).as("start"),
          max(col("ts")).as("end"), first(col("type")).as("type"),
          min_by(col("vstr"), ord).as("first_val"),
          max_by(col("vstr"), ord).as("last_val"))
        .withColumn("pool", SeriesStore.poolOf("series"))
      val catPath = new Path(catalogPath(storeDir))
      val tmp = new Path(catalogPath(storeDir) + ".tmp")
      rebuilt.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      fs.delete(catPath, true)
      fs.rename(tmp, catPath)
    }
    old.length
  }

  /** Shards metadata from file statuses alone — `list shards` /
    * `count shards [size]` never touch point data, mirroring the
    * reference which answers these from shard headers
    * (src/siri/db/shard.c siridb_shard_cexpr_cb: size = file length,
    * start/end = bucket bounds, listener.c:2553-2554). The listing is
    * O(#shards) driver work — the same cost the reference pays walking
    * its shard list — and stays trivial even at 100 TB (a shard per
    * day for 30 years is ~11k rows). */
  def shardsMeta(spark: SparkSession, storeDir: String,
      shardDuration: Long = 86400L): DataFrame = {
    import spark.implicits._
    val dir = new Path(pointsPath(storeDir))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val rows =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.startsWith("shard="))
        .map { st =>
          val sid = st.getPath.getName.stripPrefix("shard=").toLong
          val size = fs.listStatus(st.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(_.getLen).sum
          (sid, sid * shardDuration, (sid + 1) * shardDuration, size)
        }
    rows.toDF("sid", "start", "end", "size")
  }

  /** The incrementally-maintained catalog — answers metadata queries
    * without touching point data. */
  def catalog(spark: SparkSession, storeDir: String): DataFrame =
    if (!existsNonEmpty(spark, catalogPath(storeDir)))
      spark.sql(
        """SELECT '' AS series, 0L AS `length`, 0L AS `start`, 0L AS `end`,
          |'' AS `type`, 0L AS pool, '' AS first_val, '' AS last_val""".stripMargin)
        .limit(0)
    else spark.read.parquet(catalogPath(storeDir))
}
