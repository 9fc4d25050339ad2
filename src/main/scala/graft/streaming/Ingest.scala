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
  *   points/sgroup=<num|log>/shard=<ts div duration>/...parquet — the
  *     fact table, time-bucketed like the reference's shards
  *     (src/siri/db/shard.c) so ts-range queries prune whole
  *     directories. Numeric series bucket at `shardDuration`
  *     (duration_num), string ("log") series at `durationLog` — the
  *     reference keeps the two durations separately
  *     (src/siri/db/db.c:395-424);
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
  def rollupPath(dir: String) = s"$dir/rollup"

  /** Robust sampling-interval estimate over one series' sorted
    * timestamps (siridb_points_get_interval, points.c:1747-1787):
    * insertion-sort up to 63 consecutive deltas, then accept the
    * median delta only if Q1 and Q3 sit within a 10% tolerance band
    * of it (TOLERANCE_INTERVAL_DETECT). Returns 0 when the series is
    * too short (< 8 points) or too irregular to call. */
  def detectInterval(sortedTs: Seq[Long]): Long = {
    if (sortedTs.length < 8) return 0L
    val n = math.min(sortedTs.length - 1, 63)
    val arr = Array.tabulate(n)(i => sortedTs(i + 1) - sortedTs(i)).sorted
    val a = n / 4
    val b = n / 2
    val q1 = arr(a)
    val med = arr(b)
    val q3 = arr(2 * b - a)
    val x = med / 10 // b / (100 / TOLERANCE_INTERVAL_DETECT)
    if (q1 + x < med || q3 - x > med) 0L else med
  }

  /** Shard duration for a detected interval, targeting
    * OPTIMAL_POINTS_PER_SHARD = 2000 points per series per shard and
    * rounding up to whole weeks, else days, else hours
    * (siridb_shard_duration_from_interval, shard.c:136-169). An exact
    * hit on an existing duration reuses it. */
  def durationFromInterval(interval: Long, factor: Long,
      durationNum: Long, durationLog: Long): Long = {
    val n = interval * 2000L
    if (n == durationNum) return durationNum
    if (n == durationLog) return durationLog
    val week = 3600L * 24 * 7 * factor
    if (n / week > 0) return (n / week + 1) * week
    val day = 3600L * 24 * factor
    if (n / day > 0) return (n / day + 1) * day
    val hour = 3600L * factor
    (n / hour + 1) * hour
  }

  /** Start the ingest stream: any streaming source with PointIn rows →
    * shard-partitioned append + incremental catalog upsert. `tee`
    * mirrors every inserted batch to a second location, the analog of
    * the reference's tee pipe (src/siri/db/tee.c). */
  def start(src: DataFrame, storeDir: String, checkpoint: String,
      shardDuration: Long = 86400L, tee: Option[String] = None,
      durationLog: Long = 86400L): StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = if (tee.isDefined) batch.persist() else batch
        tee.foreach(t => b.write.mode("append").parquet(t))
        appendBatch(b, storeDir, shardDuration, durationLog)
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
  /** One monitor per store: the catalog merge below is a
    * read-modify-write (tmp + rename), so concurrent transport inserts
    * must serialize per store exactly like the reference's libuv loop
    * serializes inserts (clserver.c runs them on one thread). The
    * streaming path is already serialized by foreachBatch; this guards
    * the direct HTTP/TCP insert path. Point-file appends commute, so
    * the lock costs nothing that matters: the catalog merge it guards
    * is catalog-sized, not points-sized. */
  private val storeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Re-entrancy depth per store — only read/written while holding the
    * store monitor, so plain puts are race-free. Depth > 0 means this
    * process already owns the OS lock (nested withStoreLock calls and
    * the two-ApiCore-one-JVM deployment both land here). */
  private val storeLockDepth =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()

  /** Run `f` under the store's mutation lock — every writer of the
    * point/catalog files (appendBatch, compact, expire, removeSeries,
    * the planner's drop shards, the expansion sweep) must serialize
    * through here. Two layers:
    *   1. a JVM monitor serializes threads of this process, and
    *   2. a cross-process guard held for the mutation's duration — an
    *      OS file lock on `<store>/.lock` (local filesystems) or an
    *      epoch-numbered lease file (object stores, [[acquireLease]]).
    * A guard held by ANOTHER process is WAITED on for up to
    * [[lockWaitMs]] — the reference likewise queues concurrent
    * writers rather than failing them (its libuv loop serializes all
    * inserts, clserver.c; a second siridb server forwards and the
    * owner's loop queues) — so any server process can accept
    * mutations against shared storage and concurrent mutators
    * serialize. The insert path re-syncs against the on-disk
    * generation once the guard is held (ApiCore.commitInsert), so a
    * waiting mutator adopts whatever the previous one committed
    * before deciding anything. Only when the guard is still foreign
    * after the whole wait window (a wedged or runaway peer — not a
    * queue to join silently forever) does the mutation refuse
    * loudly. Readers never take this lock and are unaffected. */
  def withStoreLock[A](storeDir: String)(f: => A): A =
    storeLocks.computeIfAbsent(storeDir, _ => new Object).synchronized {
      val depth: Int = storeLockDepth.getOrDefault(storeDir, 0)
      val guard: Option[AutoCloseable] =
        if (depth == 0) acquireMutatorGuard(storeDir) else None
      storeLockDepth.put(storeDir, depth + 1)
      try f
      finally {
        if (depth == 0) storeLockDepth.remove(storeDir)
        else storeLockDepth.put(storeDir, depth)
        guard.foreach(_.close())
      }
    }

  /** Cross-process half of the store lock: POSIX byte-range lock where
    * the store is on a local filesystem, an epoch-numbered lease file
    * everywhere else (hdfs://, s3a://, ... have no POSIX locks — the
    * round-8 fallback was "deployment contract", which a 100 TB
    * deployment on exactly those stores never gets to test). */
  /** How long a mutation waits for a foreign guard before refusing.
    * 0 = refuse immediately (round-8 behavior). */
  @volatile private[graft] var lockWaitMs: Long =
    sys.env.get("SPARK_GRAFT_LOCK_WAIT_MS").map(_.toLong).getOrElse(10000L)

  private def acquireMutatorGuard(storeDir: String): Option[AutoCloseable] = {
    val deadline = System.currentTimeMillis() + lockWaitMs
    while (true) {
      try return acquireMutatorGuardOnce(storeDir)
      catch {
        case e: graft.parser.QueryError =>
          val left = deadline - System.currentTimeMillis()
          if (left <= 0) throw e
          Thread.sleep(math.min(100L, left))
      }
    }
    None // unreachable
  }

  private def acquireMutatorGuardOnce(
      storeDir: String): Option[AutoCloseable] = {
    val local =
      if (storeDir.startsWith("file:")) Some(storeDir.stripPrefix("file:"))
      else if (!storeDir.contains("://")) Some(storeDir)
      else None
    local.filter(_ => !forceLeaseForTests) match {
      case Some(dir) => acquireOsLock(dir).map { case (ch, l) =>
        () => { try l.release() finally ch.close() }
      }
      case None => Some(acquireLease(storeDir))
    }
  }

  /** Try the OS lock; None when the store is not on a local filesystem.
    * A held lock (another process mid-mutation, or a foreign channel in
    * this JVM — the in-JVM analog tryLock signals via
    * OverlappingFileLockException) is a loud refusal, not a wait: the
    * deployment regime is ONE mutating process, so contention here is a
    * misconfiguration to surface, not a queue to join. */
  private def acquireOsLock(storeDir: String)
      : Option[(java.nio.channels.FileChannel, java.nio.channels.FileLock)] = {
    val local =
      if (storeDir.startsWith("file:")) Some(storeDir.stripPrefix("file:"))
      else if (!storeDir.contains("://")) Some(storeDir)
      else None
    local.map { dir =>
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      val ch = java.nio.channels.FileChannel.open(p.resolve(".lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock =
        try ch.tryLock()
        catch {
          case _: java.nio.channels.OverlappingFileLockException => null
        }
      if (lock == null) {
        ch.close()
        throw graft.parser.QueryError(
          s"Store '$dir' is being mutated by another process " +
            "(.lock is held); this database serves one mutating process " +
            "per store")
      }
      (ch, lock)
    }
  }

  /** Test hook: route local-filesystem stores through the lease path
    * so the lease protocol is exercisable without an object store. */
  @volatile private[graft] var forceLeaseForTests: Boolean = false

  /** Lease TTL. A mutation outliving its TTL without a renewal (the
    * holder renews at TTL/3 from a daemon thread) can be superseded —
    * generous by default so only a dead process's lease ever expires. */
  @volatile private[graft] var leaseTtlMs: Long =
    sys.env.get("SPARK_GRAFT_LEASE_TTL_MS").map(_.toLong).getOrElse(600000L)

  /** This process's mutator identity (pid@host plus a JVM nonce). */
  private[graft] val mutatorId: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName + "/" +
      java.util.UUID.randomUUID().toString.take(8)

  private final case class LeaseState(epoch: Long, holder: String,
      deadlineMs: Long)

  private def leaseFs(storeDir: String) = {
    val p = new Path(storeDir, ".lease")
    // the active session's conf when one exists (object-store creds
    // ride on it); a bare Configuration resolves file:/hdfs: anyway
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    (p.getFileSystem(conf), p)
  }

  /** Highest-epoch lease on the store, its deadline extended by any
    * renewal file the holder has written since acquiring. */
  private def readLease(fs: org.apache.hadoop.fs.FileSystem,
      ld: Path): Option[LeaseState] = {
    if (!fs.exists(ld)) return None
    def parse(p: Path): Option[LeaseState] =
      try {
        val in = fs.open(p)
        val n = try new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(in) finally in.close()
        Some(LeaseState(n.get("epoch").asLong(), n.get("holder").asText(),
          n.get("deadlineMs").asLong()))
      } catch { case _: Exception => None } // torn write → treat as absent
    val names = fs.listStatus(ld).map(_.getPath.getName).toSeq
    val top = names.filter(n => n.startsWith("epoch-") && !n.endsWith(".renew"))
      .flatMap(n => scala.util.Try(n.stripPrefix("epoch-").toLong).toOption)
      .sorted.lastOption
    top.flatMap { e =>
      parse(new Path(ld, s"epoch-$e")).map { base =>
        val renewed = if (names.contains(s"epoch-$e.renew"))
          parse(new Path(ld, s"epoch-$e.renew")) else None
        renewed.filter(_.holder == base.holder)
          .fold(base)(r => base.copy(deadlineMs =
            math.max(base.deadlineMs, r.deadlineMs)))
      }
    }
  }

  private def writeLease(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      st: LeaseState, overwrite: Boolean): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.createObjectNode()
    n.put("epoch", st.epoch); n.put("holder", st.holder)
    n.put("deadlineMs", st.deadlineMs)
    val out = fs.create(p, overwrite)
    try out.write(m.writeValueAsBytes(n)) finally out.close()
  }

  /** Acquire the store's mutator lease, or refuse loudly.
    *
    * Protocol (one lease dir `<store>/.lease`, epoch files
    * `epoch-<n>`): read the top epoch; a live foreign lease (deadline
    * in the future) is the same loud refusal as a held `.lock` — the
    * deployment regime is one mutating process. A dead or absent
    * lease is superseded by CREATING `epoch-<n+1>` with
    * overwrite=false — atomic create-if-absent on HDFS-like stores,
    * so two racing claimants cannot both win an epoch; on stores
    * whose create is weaker the post-write re-read below narrows the
    * window to the object-visibility gap. The epoch number is the
    * FENCING TOKEN: it only ever grows, every mutation runs under the
    * newest epoch its process acquired, and [[LeaseHandle.close]]
    * re-checks before release that no higher epoch appeared
    * mid-mutation — a supersede (possible only after this process
    * failed to renew for a full TTL, e.g. a minutes-long GC pause)
    * turns into a loud error instead of a silent interleave. External
    * fencing consumers (a commit gate on the warehouse side) can read
    * the same token from the lease file. While held, a daemon thread
    * renews at TTL/3 by overwriting `epoch-<n>.renew`, so a live
    * mutation never expires; a crashed process stops renewing and its
    * lease dies a TTL later — the reference's equivalent is a siridb
    * server dropping off and its pool being promoted
    * (src/siri/db/server.c). */
  private def acquireLease(storeDir: String): LeaseHandle = {
    val (fs, ld) = leaseFs(storeDir)
    fs.mkdirs(ld)
    val now = System.currentTimeMillis()
    val cur = readLease(fs, ld)
    cur.filter(l => l.holder != mutatorId && l.deadlineMs > now).foreach { l =>
      throw graft.parser.QueryError(
        s"Store '$storeDir' is leased by mutator ${l.holder} " +
          s"(epoch ${l.epoch}, expires in ${l.deadlineMs - now} ms); " +
          "this database serves one mutating process per store")
    }
    val epoch = cur.map(_.epoch + 1).getOrElse(1L)
    val mine = LeaseState(epoch, mutatorId, now + leaseTtlMs)
    val p = new Path(ld, s"epoch-$epoch")
    try writeLease(fs, p, mine, overwrite = false)
    catch {
      case _: java.io.IOException => throw graft.parser.QueryError(
        s"Store '$storeDir' lease epoch $epoch was claimed by another " +
          "mutator during acquisition; this database serves one mutating " +
          "process per store")
    }
    // post-write verify: we must still be the TOP epoch (guards the
    // read→create window on stores without atomic create-if-absent)
    val check = readLease(fs, ld)
    if (!check.exists(l => l.epoch == epoch && l.holder == mutatorId)) {
      fs.delete(p, false)
      throw graft.parser.QueryError(
        s"Store '$storeDir' lease was superseded during acquisition " +
          s"(saw ${check.map(_.epoch)}); this database serves one " +
          "mutating process per store")
    }
    // older epochs are dead by construction — GC their files
    fs.listStatus(ld).map(_.getPath).filter { q =>
      val n = q.getName
      n.startsWith("epoch-") &&
        scala.util.Try(n.stripPrefix("epoch-").stripSuffix(".renew").toLong)
          .toOption.exists(_ < epoch)
    }.foreach(fs.delete(_, false))
    new LeaseHandle(storeDir, epoch)
  }

  private final class LeaseHandle(storeDir: String, epoch: Long)
      extends AutoCloseable {
    @volatile private var stopped = false
    private val renewer = new Thread(() => {
      while (!stopped) {
        try Thread.sleep(math.max(leaseTtlMs / 3, 50L))
        catch { case _: InterruptedException => () }
        if (!stopped)
          try {
            val (fs, ld) = leaseFs(storeDir)
            writeLease(fs, new Path(ld, s"epoch-$epoch.renew"),
              LeaseState(epoch, mutatorId,
                System.currentTimeMillis() + leaseTtlMs), overwrite = true)
          } catch { case _: Exception => () } // next tick retries
      }
    }, s"graft-lease-renew-$epoch")
    renewer.setDaemon(true)
    renewer.start()

    override def close(): Unit = {
      stopped = true
      renewer.interrupt()
      val (fs, ld) = leaseFs(storeDir)
      // fencing check: a higher epoch mid-mutation means this process
      // lost the lease (TTL elapsed un-renewed) and another mutator
      // may have interleaved — surface it, never swallow it
      val top = readLease(fs, ld)
      fs.delete(new Path(ld, s"epoch-$epoch.renew"), false)
      fs.delete(new Path(ld, s"epoch-$epoch"), false)
      if (top.exists(_.epoch > epoch))
        throw graft.parser.QueryError(
          s"Store '$storeDir' mutator lease (epoch $epoch) was superseded " +
            s"by epoch ${top.get.epoch} mid-mutation; the completed " +
            "mutation may have interleaved with the new mutator's — " +
            "verify the store before continuing")
    }
  }

  def appendBatch(batch: DataFrame, storeDir: String, shardDuration: Long,
      durationLog: Long = 86400L): Unit =
    withStoreLock(storeDir) {
      appendBatchLocked(batch, storeDir, shardDuration, durationLog)
    }

  private def appendBatchLocked(batch: DataFrame, storeDir: String,
      shardDuration: Long, durationLog: Long): Unit = {
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
      // siridb_series_ensure_type coerces with C stdlib semantics
      // (series.c:1141-1216): strings parse as a strtoll/strtod PREFIX
      // ("-50%" → -50, "garbage"/"" → 0) with strtoll saturating at
      // the int64 bounds; doubles truncate toward zero into integers;
      // numbers render into string series as "%PRId64" / "%f"
      .withColumn("int_prefix",
        regexp_extract(col("val_str"), "^\\s*([+-]?[0-9]+)", 1))
      .withColumn("flt_prefix", regexp_extract(col("val_str"),
        "^\\s*([+-]?(?:[0-9]+\\.?[0-9]*(?:[eE][+-]?[0-9]+)?|\\.[0-9]+(?:[eE][+-]?[0-9]+)?|[iI][nN][fF](?:inity)?|[nN][aA][nN]))", 1))
      .withColumn("c_int", when(col("etp") === "integer",
        when(col("tp") === "integer", col("val_int"))
          .when(col("tp") === "float",
            when(isnan(col("val")), lit(0L))
              .otherwise(coalesce(expr("try_cast(val AS BIGINT)"),
                when(col("val") > 0, lit(Long.MaxValue)).otherwise(lit(Long.MinValue)))))
          .otherwise(coalesce(expr("try_cast(int_prefix AS BIGINT)"),
            when(length(col("int_prefix")) === 0, lit(0L))
              .when(col("int_prefix").startsWith("-"), lit(Long.MinValue))
              .otherwise(lit(Long.MaxValue)))))
        .otherwise(lit(0L)))
      .withColumn("c_num", when(col("etp") === "float",
        when(col("tp") === "float", col("val"))
          .when(col("tp") === "integer", col("val_int").cast("double"))
          // try_cast only parses 'Infinity'/'NaN' exactly; C strtod
          // (series.c:1141-1216) accepts inf/INF/infinity/nan in any
          // case — map the captured forms explicitly before falling
          // back (the capture's numeric alternative can never contain
          // the letter sequences, so the rlike guards are exact)
          .otherwise(
            when(col("flt_prefix").rlike("(?i)inf"),
              when(col("flt_prefix").startsWith("-"),
                lit(Double.NegativeInfinity))
                .otherwise(lit(Double.PositiveInfinity)))
              .when(col("flt_prefix").rlike("(?i)nan"), lit(Double.NaN))
              .otherwise(coalesce(expr("try_cast(flt_prefix AS DOUBLE)"),
                lit(0.0)))))
        .when(col("etp") === "integer", col("c_int").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("c_str", when(col("etp") === "string",
        when(col("tp") === "string", col("val_str"))
          .when(col("tp") === "integer", col("val_int").cast("string"))
          .otherwise(format_string("%f", col("val"))))
        .otherwise(lit("")))
      .select(col("series"), col("ts"), col("c_num").as("val"),
        col("c_int").as("val_int"), col("c_str").as("val_str"),
        col("etp").as("tp"), col("pid"))

    // string ("log") series shard at their own duration
    // (src/siri/db/db.c:395-424: duration_num vs duration_log)
    pts.withColumn("sgroup",
        when(col("tp") === "string", lit("log")).otherwise(lit("num")))
      .withColumn("shard", when(col("tp") === "string",
        expr(s"ts div $durationLog")).otherwise(expr(s"ts div $shardDuration")))
      .write.mode("append").partitionBy("sgroup", "shard")
      .parquet(pointsPath(storeDir))

    // standing rollups are materialized views of the store: the batch's
    // delta rows keep them exact (see the rollup section below)
    rollupAppend(spark, storeDir, pts)

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

    // catalog merge. The delta side is ONE BATCH (small), the existing
    // side is the whole catalog — a full-outer join would shuffle the
    // catalog on every micro-batch (measured 9.6 s at 1M series,
    // IngestSpec), so split it into a broadcast LEFT join (updates,
    // no exchange of the catalog side) plus a broadcast anti-join
    // (brand-new series), which is the same merge in one narrow pass.
    val updated = existing.alias("e")
      .join(broadcast(delta.alias("d")), Seq("series"), "left")
      .select(col("series"),
        (col("e.length") + coalesce(col("d.length"), lit(0L)))
          .cast("long").as("length"),
        least(col("e.start"), col("d.start")).as("start"),
        greatest(col("e.end"), col("d.end")).as("end"),
        col("e.type").as("type"),
        when(col("d.start") < col("e.start"), col("d.first_val"))
          .otherwise(col("e.first_val")).as("first_val"),
        when(col("d.end") >= col("e.end"), col("d.last_val"))
          .otherwise(col("e.last_val")).as("last_val"))
    // delta series already present in the catalog: a narrow inner join
    // against the broadcast delta (batch-sized result) — never a
    // broadcast or shuffle of the catalog itself
    val matched = existing.select(col("series"))
      .join(broadcast(delta.select(col("series"))), Seq("series"))
    val fresh = delta
      .join(broadcast(matched), Seq("series"), "left_anti")
      .select(col("series"), col("length"), col("start"), col("end"),
        col("type"), col("first_val"), col("last_val"))
    val merged = updated.unionByName(fresh)
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
      val name = st.getPath.getName
      // an sgroup= dir counts only if it still holds a shard dir —
      // `drop shards` deletes the shard=N dirs but leaves the sgroup
      // parents, and schema inference over that empty tree throws
      (name.startsWith("sgroup=") && fs.listStatus(st.getPath)
        .exists(_.getPath.getName.startsWith("shard="))) ||
        name.startsWith("shard=") || name.endsWith(".parquet")
    }
  }

  /** All shard directories of a store as (sgroup, sid, path). */
  private[graft] def shardDirs(spark: SparkSession, storeDir: String)
      : Seq[(String, Long, Path)] = {
    val dir = new Path(pointsPath(storeDir))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.startsWith("sgroup="))
      .flatMap { g =>
        val sgroup = g.getPath.getName.stripPrefix("sgroup=")
        fs.listStatus(g.getPath)
          .filter(_.getPath.getName.startsWith("shard="))
          .map(st => (sgroup,
            st.getPath.getName.stripPrefix("shard=").toLong, st.getPath))
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
      shardDuration: Long = 86400L, durationLog: Long = 86400L): DataFrame =
    pointsRangeOver(spark, storeDir,
      rangedBase(spark, storeDir), after, before, shardDuration, durationLog)

  /** The raw parquet relation (partition columns kept) a ranged read
    * filters, or None for an empty store. Callers that serve many
    * queries should build this once per store generation and pass it
    * to [[pointsRangeOver]]: `spark.read.parquet` lists the shard
    * directories and reads footers eagerly, so re-resolving it on
    * every query turns file listing into a per-query cost
    * (ApiCore caches it exactly like the unranged frames). */
  def rangedBase(spark: SparkSession, storeDir: String): Option[DataFrame] =
    if (!existsNonEmpty(spark, pointsPath(storeDir))) None
    else Some(spark.read.parquet(pointsPath(storeDir)))

  def pointsRangeOver(spark: SparkSession, storeDir: String,
      base: Option[DataFrame], after: Option[Long], before: Option[Long],
      shardDuration: Long, durationLog: Long): DataFrame = {
    if (base.isEmpty)
      return points(spark, storeDir) // empty frame with the right schema
    val df = base.get
    // the shard bound is per group (num and log shard at different
    // durations); both disjuncts touch only partition columns, so the
    // OR still prunes directories
    def shardBound(cmp: (org.apache.spark.sql.Column, Long) => org.apache.spark.sql.Column, v: Long) =
      (col("sgroup") === "log" && cmp(col("shard"), v / durationLog)) ||
        (col("sgroup") =!= "log" && cmp(col("shard"), v / shardDuration))
    val filters = Seq(
      after.map(a => col("ts") >= a && shardBound(_ >= _, a)),
      before.map(b => col("ts") < b && shardBound(_ <= _, b))).flatten
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
      dropped: Option[DataFrame] = None): Int =
    // shard rewrite (delete + rename) must not interleave with an
    // append or expiry on the same store
    withStoreLock(storeDir) {
      compactLocked(spark, storeDir, maxFiles, dropped)
    }

  private def compactLocked(spark: SparkSession, storeDir: String,
      maxFiles: Int, dropped: Option[DataFrame]): Int = {
    val fs = new Path(pointsPath(storeDir))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val fragmented = shardDirs(spark, storeDir).filter { case (_, _, p) =>
      val n = fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
      n > maxFiles || (dropped.isDefined && n > 0)
    }
    fragmented.foreach { case (_, _, p) =>
      val tmp = new Path(p.toString + ".compact")
      val raw = spark.read.parquet(p.toString)
      val kept = dropped.fold(raw)(d =>
        raw.join(d.select(col("series")), Seq("series"), "left_anti"))
      kept.sort(col("series"), col("ts"), col("pid"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(p, true)
      fs.rename(tmp, p)
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
  /** Count of expiry passes (each is an O(#shards) directory walk) —
    * lets specs pin that the insert path's retention gate holds. */
  val expireRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  def expire(spark: SparkSession, storeDir: String, expiration: Long,
      now: Long, shardDuration: Long = 86400L, durationLog: Long = 86400L,
      /** which shard group the expiration applies to: expiration_num
        * expires numeric shards, expiration_log log shards (db.c). */
      group: String = "num"): Int = {
    expireRuns.incrementAndGet()
    // expiry deletes shard dirs and rebuilds the catalog — same
    // read-modify-write as appendBatch, same per-store serialization
    withStoreLock(storeDir) {
      expireLocked(spark, storeDir, expiration, now, shardDuration,
        durationLog, group)
    }
  }

  private def expireLocked(spark: SparkSession, storeDir: String,
      expiration: Long, now: Long, shardDuration: Long,
      durationLog: Long, group: String): Int = {
    val duration = if (group == "log") durationLog else shardDuration
    val cutoffShard = (now - expiration) / duration
    val fs = new Path(pointsPath(storeDir))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val old = shardDirs(spark, storeDir)
      .filter { case (g, sid, _) => g == group && sid < cutoffShard }
      .map(_._3)
    old.foreach(p => fs.delete(p, true))
    if (old.nonEmpty) {
      rebuildCatalog(spark, storeDir)
      // a standing rollup keeps serving what the raw store just
      // dropped unless it is pruned to the same cutoff. Only the num
      // group prunes: rollups are only ever SERVED for numeric series
      // (Planner eligibility requires selTypes ⊆ {float,integer}), and
      // numeric raw points live in num shards — a log-group expiry
      // removes only string shards, so pruning here would drop rollup
      // history for numeric series whose raw shards survive.
      if (group != "log")
        rollupExpire(spark, storeDir, cutoffShard * duration)
    }
    old.length
  }

  /** Rebuild catalog stats from the surviving points (one pass, off
    * the ingest hot path — callers are maintenance jobs: expiry,
    * re-index). Caller must hold the store lock. */
  private def rebuildCatalog(spark: SparkSession, storeDir: String): Unit = {
    val fs = new Path(pointsPath(storeDir))
      .getFileSystem(spark.sessionState.newHadoopConf())
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

  /** Physically remove a set of series from a store: every shard
    * holding any of them is rewritten without their rows (the same
    * shard-granular rewrite as compaction) and the catalog is rebuilt.
    * This is the removal half of pool re-index (reindex.c) — the
    * moved series were appended to their new pool first, so a crash
    * between the two steps leaves duplicates to re-remove, never data
    * loss. `moved` is a single-column `series` frame; it stays
    * distributed (broadcast left-anti join per shard). */
  def removeSeries(spark: SparkSession, storeDir: String,
      moved: DataFrame): Unit = withStoreLock(storeDir) {
    val fs = new Path(pointsPath(storeDir))
      .getFileSystem(spark.sessionState.newHadoopConf())
    // materialize the name list BEFORE mutating: `moved` is typically
    // a plan over THIS store's catalog (movedOf), whose parquet file
    // listing froze at DataFrame creation — re-executing it after
    // rebuildCatalog below replaces those files would FILE_NOT_EXIST
    // (bit the rollup-prune pass when a swept source carried a
    // rollup). O(#moved series) rows, catalog-sized.
    val movedKeys = moved.select(col("series")).localCheckpoint(true)
    shardDirs(spark, storeDir).foreach { case (_, _, p) =>
      val raw = spark.read.parquet(p.toString)
      val touched = !raw.join(movedKeys, Seq("series"), "left_semi").isEmpty
      if (touched) {
        val tmp = new Path(p.toString + ".reindex")
        val kept = raw.join(movedKeys, Seq("series"), "left_anti")
        if (kept.isEmpty) fs.delete(p, true)
        else {
          kept.sort(col("series"), col("ts"), col("pid"))
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          fs.delete(p, true)
          fs.rename(tmp, p)
        }
      }
    }
    rebuildCatalog(spark, storeDir)
    // the moved series' rollup rows leave with them — their new pool's
    // rollup picked them up on append (rollupAppend), so keeping them
    // here would double-count in a cluster-merged rollup view
    rollupDirs(spark, storeDir).foreach { case (_, p) =>
      rewriteRollup(spark, p, spark.read.parquet(p.toString)
        .join(movedKeys, Seq("series"), "left_anti"))
    }
  }

  // ------------------------------------------------------------------
  // Store-owned standing rollups.
  //
  // A rollup dir `<storeDir>/rollup/<R>` (R in raw ts units) is a
  // materialized view of the store: per (series, bucket) count/sum/
  // min/max at right-aligned GROUP_TS labels (Rollup.fromPoints /
  // Rollup.bucketed). The planner serves eligible coarse selects from
  // it INSTEAD of raw points, so it must agree with the raw store
  // after EVERY mutation — the maintenance hooks below keep it exact:
  //   * appendBatch appends per-batch delta rows (the read path
  //     re-aggregates per (series, bucket), so deltas with repeated
  //     keys combine correctly for count/sum/min/max);
  //   * expire prunes buckets whose window overlaps the expired range
  //     and recomputes the one straddling label from survivors;
  //   * drop shards (arbitrary cexpr) recomputes the view outright —
  //     the same full-pass cost class as its catalog rebuild;
  //   * removeSeries (pool re-index) drops the moved series' rows.
  //
  // A dir containing `_spark_metadata` belongs to a live Structured
  // Streaming sink (Rollup.startBucketed): its transaction log owns
  // the file set (a rewrite would corrupt reads through the log) and
  // its watermark DROPS late points the raw store accepts — it can
  // never answer a select exactly, so it is NOT store-owned and the
  // planner must not serve it (ApiCore.rollupView skips it).
  // ------------------------------------------------------------------

  /** Store-owned rollup dirs as (bucketWidth, path) — streaming-sink
    * dirs (with `_spark_metadata`) excluded, see above. */
  private[graft] def rollupDirs(spark: SparkSession, storeDir: String)
      : Seq[(Long, Path)] = {
    val base = new Path(rollupPath(storeDir))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption
        .map(_ -> st.getPath))
      .filter { case (_, p) => !fs.exists(new Path(p, "_spark_metadata")) }
      .sortBy(_._1)
  }

  private val RollupCols =
    Seq(col("series"), col("bucket"), col("n"), col("sum"), col("min"),
      col("max"))

  /** Atomic replace of one rollup dir (tmp + rename, like the catalog). */
  private def rewriteRollup(spark: SparkSession, dir: Path,
      rows: DataFrame): Unit = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(dir.toString + ".tmp")
    rows.select(RollupCols: _*).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    fs.rename(tmp, dir)
  }

  /** Append one insert batch's delta rows to every store-owned rollup
    * (caller holds the store lock). `pts` is the coerced batch —
    * (series, ts, val) with val the numeric double view, the same
    * columns a Rollup.fromPoints backfill aggregates. */
  private def rollupAppend(spark: SparkSession, storeDir: String,
      pts: DataFrame): Unit =
    rollupDirs(spark, storeDir).foreach { case (r, p) =>
      Rollup.fromPoints(pts.select(col("series"), col("ts"), col("val")), r)
        .write.mode("append").parquet(p.toString)
    }

  /** Create store-owned rollup dirs at the given widths from the
    * store's current points — the expansion backfill: a fresh target
    * pool must inherit the sources' standing rollups or the merged
    * cluster rollup view (PoolCluster.mergedRollup) stays disabled
    * forever after an expand. Under the store lock so no insert can
    * land between the points snapshot and the dir creation
    * (appendBatch maintains only dirs that already exist). Existing
    * widths are left untouched. */
  def rollupBackfill(spark: SparkSession, storeDir: String,
      widths: Seq[Long]): Unit = withStoreLock(storeDir) {
    val existing = rollupDirs(spark, storeDir).map(_._1).toSet
    val missing = widths.distinct.filterNot(existing)
    if (missing.nonEmpty) {
      val pts = points(spark, storeDir)
        .select(col("series"), col("ts"), col("val"))
      missing.foreach { r =>
        Rollup.fromPoints(pts, r)
          .write.mode("overwrite").parquet(s"${rollupPath(storeDir)}/$r")
      }
    }
  }

  /** Retention pruning (caller holds the store lock): after raw shards
    * wholly before `cutoffTs` were deleted, drop every rollup bucket
    * whose window (B-R, B] overlaps the expired range, then recompute
    * the straddling labels from the surviving points — exactly the
    * ts slice [cutoffTs, cutoffTs+R), one bucket width. Kept buckets
    * (B-R+1 >= cutoffTs) contain only surviving points by
    * construction, so the view stays exact. */
  private def rollupExpire(spark: SparkSession, storeDir: String,
      cutoffTs: Long): Unit = {
    val dirs = rollupDirs(spark, storeDir)
    if (dirs.isEmpty) return
    val survivors = points(spark, storeDir)
    dirs.foreach { case (r, p) =>
      val old = spark.read.parquet(p.toString)
      val keep = old.where(col("bucket") - lit(r - 1L) >= cutoffTs)
      val straddle = Rollup.fromPoints(
        survivors.where(col("ts") >= cutoffTs && col("ts") < cutoffTs + r)
          .select(col("series"), col("ts"), col("val")), r)
        .where(col("bucket") - lit(r - 1L) < cutoffTs)
      rewriteRollup(spark, p, keep.unionByName(straddle))
    }
  }

  /** Full recompute of every store-owned rollup from the surviving
    * points (caller holds the store lock) — the `drop shards` path,
    * where the deleted set is an arbitrary cexpr match, not a time
    * prefix. Same cost class as the catalog rebuild the reference
    * performs after shard drops. */
  private[graft] def rollupRecompute(spark: SparkSession,
      storeDir: String): Unit = {
    val dirs = rollupDirs(spark, storeDir)
    if (dirs.isEmpty) return
    val pts = points(spark, storeDir)
      .select(col("series"), col("ts"), col("val"))
    dirs.foreach { case (r, p) =>
      rewriteRollup(spark, p, Rollup.fromPoints(pts, r))
    }
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
      shardDuration: Long = 86400L, durationLog: Long = 86400L): DataFrame = {
    import spark.implicits._
    val fs = new Path(pointsPath(storeDir))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rows = shardDirs(spark, storeDir).map { case (g, sid, p) =>
      val duration = if (g == "log") durationLog else shardDuration
      val size = fs.listStatus(p)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
      (sid, sid * duration, (sid + 1) * duration, size,
        if (g == "log") "log" else "number")
    }
    rows.toDF("sid", "start", "end", "size", "type")
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
