package graft.server

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.meta.Lookup
import graft.parser.{EngineEnv, Frames, QueryError, QueryParser}
import graft.streaming.Ingest

/** Pool-distributed database: N pools, each its own Ingest store,
  * series assigned by the reference's 8192-slot lookup table
  * (src/siri/db/lookup.c) — re-expressed Spark-first.
  *
  * Where the reference must SCATTER (insert.c routes each series'
  * points to the pool that owns it over the network) this cluster
  * routes batches to per-pool store directories; where the reference
  * must FAN OUT AND MERGE (query.c:263-394 rebuilds the query string,
  * forwards it to one server per pool and merges the partial results,
  * listener.c:4068-4143) this cluster runs ONE Catalyst plan over the
  * union of the pools' frames — pools are storage partitioning, and
  * Spark's planner already knows how to parallelize over partitioned
  * storage, so the reference's hand-written merge protocol disappears
  * into `unionByName`. `list pools` / `where pool == k` answer from
  * the real per-pool catalogs (the pool column IS the owning store).
  *
  * Replication (replicate.c / fifo.c) is deliberately absent: pool
  * stores live on shared storage whose durability Spark delegates to
  * the filesystem — a second copy of each pool would protect against
  * nothing the storage layer doesn't already.
  *
  * [[expand]] is the reference's pool expansion + re-index
  * (reindex.c, itest/test_pool.py): the lookup table's growth
  * property guarantees only series newly assigned to the new pool
  * move, so re-index cost is ~1/(n+1) of the data, not a reshuffle.
  * An insert racing an in-flight expansion may still route by the old
  * lookup and land points in the prior owner's store — queries stay
  * correct (the merged plan reads every pool) and the next expansion
  * re-homes them; the reference has the same transition window and
  * covers it with reindex-aware forwarding (reindex.c:54-60).
  */
final class PoolCluster(spark: org.apache.spark.sql.SparkSession,
    baseDir: String, initialPools: Int = 2, val dbName: String = "graft",
    /** Pool 0 may live at an existing single-store directory: that is
      * how a standalone database upgrades in place when its first
      * `new-pool` service request arrives — the store becomes pool 0
      * and the next [[expand]] re-indexes its share out. */
    pool0Dir: Option[String] = None,
    /** Database time precision, cluster-wide (the shared metastore
      * carries it, so every pool's server resolves the same factor). */
    timePrecision: String = "s") extends DbHandler {

  private def dirOf(k: Int) =
    if (k == 0) pool0Dir.getOrElse(s"$baseDir/pool0") else s"$baseDir/pool$k"

  /** Cluster-global metastore (users/groups/tags/config are synced
    * across the reference's servers); persisted under pool0. */
  val meta: graft.meta.MetaStore = {
    val m = new graft.meta.MetaStore
    m.loadFrom(spark, dirOf(0))
    m
  }

  @volatile private var pools: Vector[ApiCore] =
    (0 until initialPools).toVector.map(k =>
      new ApiCore(spark, dirOf(k), dbName, sharedMeta = Some(meta),
        timePrecision = timePrecision))

  @volatile private var lookup: Lookup = Lookup(pools.size)

  /** Replicas per pool (reference NEW_REPLICA joins a second server to
    * an existing pool, service/request.c:830-900). On shared storage a
    * replica adds no durability — the store is already durable — so
    * joining is FLEET MEMBERSHIP: the server appears in the
    * servers/pools views with its pool, nothing re-copies. */
  @volatile private var replicas: Map[Int, Int] = Map.empty

  def addReplica(pool: Int): Unit = synchronized {
    require(pool >= 0 && pool < pools.size, s"no pool $pool")
    replicas = replicas.updated(pool, replicas.getOrElse(pool, 0) + 1)
  }

  /** One fleet entry per server: each pool's primary, then its
    * replicas. */
  private def fleet: Seq[Int] =
    pools.indices.flatMap(k => Seq.fill(1 + replicas.getOrElse(k, 0))(k))

  def nPools: Int = pools.size

  def poolOf(series: String): Int = lookup.poolOf(series)

  /** Same credential check as a standalone server (auth.c:17-60) —
    * users are cluster-global in the shared metastore. */
  def authenticate(user: String, password: String): Boolean =
    meta.users.get(user)
      .exists(u => graft.meta.MetaStore.verifyPassword(password, u.pwHash))

  /** Route an insert: split the request's series by lookup assignment
    * and hand each pool its share (insert.c's scatter). Validation
    * runs per pool share with the reference's checks (ApiCore); the
    * response is the reference's single success message with the
    * total point count. */
  def runInsert(req: JsonNode, user: String): JsonNode = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // normalize both wire forms into per-pool ARRAY-form requests —
    // the array form legally repeats a series name (insert.c accepts
    // duplicate entries), so routing through a map would silently
    // drop points; full structural validation stays with
    // ApiCore.runInsert
    val byPool = scala.collection.mutable.Map
      .empty[Int, com.fasterxml.jackson.databind.node.ArrayNode]
    var total = 0L
    def route(name: String, pts: JsonNode): Unit = {
      if (name == null) throw QueryError("Expecting a map with name and points.")
      val arr = byPool.getOrElseUpdate(lookup.poolOf(name),
        mapper.createArrayNode())
      val entry = arr.addObject()
      entry.put("name", name)
      entry.set[JsonNode]("points", pts)
      total += (if (pts != null && pts.isArray) pts.size() else 0)
    }
    if (req.isObject)
      req.properties().iterator().forEachRemaining(e =>
        route(e.getKey, e.getValue))
    else if (req.isArray)
      req.iterator().forEachRemaining { o =>
        if (!o.isObject || o.get("name") == null || !o.get("name").isTextual)
          throw QueryError("Expecting a map with name and points.")
        route(o.get("name").asText(), o.get("points"))
      }
    else throw QueryError(
      "Expecting an array or map containing series and points.")
    byPool.toSeq.sortBy(_._1).foreach { case (k, arr) =>
      pools(k).runInsert(arr, user)
    }
    mapper.createObjectNode()
      .put("success_msg", s"Successfully inserted $total point(s).")
  }

  /** One merged query over every pool: union frames + a catalog whose
    * pool column is the real owning pool, through the standard ApiCore
    * encode path. Two statements touch PHYSICAL stores and route
    * differently: `drop shards` fans out to every pool (the reference
    * forwards it to all servers, listener.c exit_drop_shards) and the
    * summed count is re-encoded; `alter database ...` runs on pool 0 —
    * the master — whose own shards back the expiration drop-threshold
    * guard (exit_set_expiration_xxx checks the master's shards), while
    * the config itself lands in the cluster-shared metastore either
    * way. */
  def factor: Long = pools(0).factor

  def runQuery(q: String, tsFactor: Double, user: String): JsonNode = {
    val stmt =
      try QueryParser.parse(q, tz = meta.config.getOrElse("timezone", "NAIVE"))
      catch { case _: Throwable => null } // real errors re-raise below
    val inner = stmt match {
      case graft.parser.TimeitStmt(s) => s
      case s => s
    }
    inner match {
      case _: graft.parser.DropShards =>
        // DDL answers ride the {columns, rows} table encoding
        val counts = pools.map { p =>
          val msg = p.runQuery(q, tsFactor, user)
            .get("rows").get(0).get(0).asText()
          "\\d+".r.findFirstIn(msg).map(_.toLong).getOrElse(0L)
        }
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val out = mapper.createObjectNode()
        out.putArray("columns").add("success_msg")
        out.putArray("rows").addArray().add(
          s"Successfully dropped ${counts.sum} shards. (this number does not include replica shards)")
        out
      case _: graft.parser.AlterDatabase =>
        pools(0).runQuery(q, tsFactor, user)
      case _ =>
        pools(0).runQueryIn(mergedEnv(user), q, tsFactor)
    }
  }

  private def mergedCat(cats: Seq[DataFrame]): DataFrame =
    cats.zipWithIndex
      .map { case (c, k) => c.withColumn("pool", lit(k.toLong)) }
      .reduce(_ unionByName _)

  private def mergedFrames(fs: Seq[Frames]): Frames =
    Frames(
      fs.map(_.f).reduce(_ unionByName _),
      fs.map(_.i).reduce(_ unionByName _),
      fs.map(_.s).reduce(_ unionByName _),
      fs.map(_.m).reduce(_ unionByName _),
      mergedCat(fs.map(_.cat)))

  private[server] def mergedEnv(user: String): EngineEnv = {
    val envs = pools.map(_.env(user))
    val e0 = envs.head
    e0.copy(
      dir = baseDir, // distinct select-memo identity from any one pool
      frames = Some(mergedFrames(envs.map(_.frames.get))),
      rangedFrames = Some((a, b) =>
        mergedFrames(envs.map(_.rangedFrames.get(a, b)))),
      shardsView = Some(() => envs.zipWithIndex
        .map { case (e, k) =>
          e.shardsView.get().withColumn("pool", lit(k.toLong)) }
        .reduce(_ unionByName _)),
      fleet = fleet,
      rollup = None)
  }

  /** Pool expansion + re-index (reindex.c; itest/test_pool.py): grow
    * the lookup table by one pool, then migrate exactly the series
    * whose slot the growth reassigned — append them to the new pool's
    * store first, then physically remove them from their old pools
    * (crash-safe order: a failure between the steps leaves movable
    * duplicates, never lost points). Runs as a distributed batch job:
    * the 8192-row lookup table broadcast-joins against each pool's
    * catalog, and only shards holding moved series rewrite. */
  def expand(): Int = synchronized {
    val newIdx = pools.size
    val newLookup = Lookup(newIdx + 1)
    val target = new ApiCore(spark, dirOf(newIdx), dbName,
      sharedMeta = Some(meta), timePrecision = timePrecision)
    import spark.implicits._
    val lookupDf = newLookup.toRows.toDF("slot", "pool")
    pools.zipWithIndex.foreach { case (src, k) =>
      val srcDir = dirOf(k)
      val cat = Ingest.catalog(spark, srcDir)
      val moved = cat.select(col("series"), col("type"))
        .withColumn("slot", expr(Lookup.slotSql("series")))
        .join(broadcast(lookupDf), Seq("slot"))
        .where(col("pool") === newIdx)
        .select(col("series"), col("type"))
      if (!moved.isEmpty) {
        val pts = Ingest.points(spark, srcDir)
          .join(moved, Seq("series"))
          .select(col("series"), col("ts"), col("val").as("val_num"),
            col("type").as("tp"), col("pid"), col("val_int"), col("val_str"))
        Ingest.appendBatch(pts, dirOf(newIdx),
          target.shardDuration, target.durationLog)
        Ingest.removeSeries(spark, srcDir, moved.select(col("series")))
      }
    }
    pools = pools :+ target
    lookup = newLookup
    meta.storeGeneration.incrementAndGet()
    newIdx
  }
}
