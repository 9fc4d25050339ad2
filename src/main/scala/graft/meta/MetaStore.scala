package graft.meta

import scala.collection.concurrent.TrieMap

/** Mutable database metadata — the Spark-side analog of the
  * reference's groups.dat / tags.dat / users.dat + database config
  * (src/siri/db/groups.c, tags.c, users.c, db.c). Thread-safe; state
  * is per-engine-instance (a production deployment would persist this
  * like the catalog — one tiny parquet/JSON per entity).
  */
final class MetaStore {

  final case class User(password: String, access: Int)

  /** group name -> saved regex (continuously re-evaluated against the
    * catalog on use — the reference re-evaluates on a 2 s loop,
    * src/siri/db/groups.c:44). */
  val groups = TrieMap[String, String]()
  /** tag name -> explicit member-series frame, single `series` column
    * (src/siri/db/tags.c). Membership never lives on the driver — a
    * tag spanning 10M series stays a distributed frame, upserted with
    * union/anti-join exactly like the drop tombstones below. Counts
    * ride along for `list tags` / `count tags`. */
  val tagFrames = TrieMap[String, org.apache.spark.sql.DataFrame]()
  val tagCounts = TrieMap[String, Long]()
  /** seeded with the reference's default database user
    * (users.c:70-85: 'iris'/'siri', full profile). */
  val users = TrieMap[String, User]("iris" -> User("siri", Access.Full))

  /** None when the user holds every requested bit, else the
    * reference's denial message (user.c:195-218). */
  def checkAccess(user: String, bit: Int): Option[String] = {
    val have = users.get(user).map(_.access).getOrElse(0)
    if ((have & bit) == bit) None
    else Some(s"Access denied. User '$user' has no '${Access.toStr(bit)}' privileges.")
  }

  /** Dropped-series tombstones (the analog of dropped-series purge,
    * src/siri/optimize.c) as a materialized name frame — anti-joined
    * against the catalog, so drops never put series names on the
    * driver. `localCheckpoint` pins the point-in-time snapshot. */
  @volatile var droppedDf: Option[org.apache.spark.sql.DataFrame] = None

  def addDropped(names: org.apache.spark.sql.DataFrame): Unit = synchronized {
    val snap = names.localCheckpoint(true)
    droppedDf = Some(droppedDf
      .map(_.unionByName(snap).distinct().localCheckpoint(true))
      .getOrElse(snap))
  }

  /** alterable database config (db.h:15-17 defaults). */
  val config = TrieMap[String, String](
    "drop_threshold" -> "1.0",
    "list_limit" -> "10000",
    "select_points_limit" -> "1000000",
    "timezone" -> "NAIVE",
    "log_level" -> "info",
    "tee" -> "false")

  /** Server point counters (the reference's received_points /
    * selected_points server stats — src/siri/db/props.c). */
  val receivedPoints = new java.util.concurrent.atomic.AtomicLong(0)
  val selectedPoints = new java.util.concurrent.atomic.AtomicLong(0)

  /** Bumped whenever the physical store changes (insert batches,
    * drop shards) so transports can cache store-derived frames —
    * parquet file listings are not free at scale — and invalidate
    * exactly when the file set moves. */
  val storeGeneration = new java.util.concurrent.atomic.AtomicLong(0)

  def dropThreshold: Double = config("drop_threshold").toDouble
  def listLimit: Int = config("list_limit").toInt
  def selectPointsLimit: Long = config("select_points_limit").toLong

  /** Constructor seeding: `members` is a tiny local relation, so no
    * checkpoint job is paid at env-construction time. */
  def seedTag(tag: String, members: org.apache.spark.sql.DataFrame, n: Long): Unit = {
    tagFrames.put(tag, members)
    tagCounts.put(tag, n)
  }

  /** Add a (distributed) selection of series names to a tag; returns
    * how many were newly tagged. One localCheckpoint job per DDL call;
    * the stored frame is always distinct and checkpointed, so the plan
    * depth stays O(1) across repeated tag/untag operations. */
  def tagSeries(tag: String, names: org.apache.spark.sql.DataFrame): Long = synchronized {
    import org.apache.spark.sql.functions.col
    val dn = names.select(col("series")).distinct()
    val added = tagFrames.get(tag).fold(dn)(cur => dn.join(cur, Seq("series"), "left_anti"))
    val merged = tagFrames.get(tag).fold(added)(_.unionByName(added)).localCheckpoint(true)
    val n = merged.count()
    val prev = tagCounts.getOrElse(tag, 0L)
    tagFrames.put(tag, merged)
    tagCounts.put(tag, n)
    n - prev
  }

  def untagSeries(tag: String, names: org.apache.spark.sql.DataFrame): Long = synchronized {
    import org.apache.spark.sql.functions.col
    tagFrames.get(tag) match {
      case None => 0L
      case Some(cur) =>
        val remaining = cur
          .join(names.select(col("series")).distinct(), Seq("series"), "left_anti")
          .localCheckpoint(true)
        val n = remaining.count()
        val prev = tagCounts.getOrElse(tag, 0L)
        tagFrames.put(tag, remaining)
        tagCounts.put(tag, n)
        prev - n
    }
  }
}
