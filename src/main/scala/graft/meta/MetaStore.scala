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
  /** tag name -> explicit member series (src/siri/db/tags.c). */
  val tags = TrieMap[String, Set[String]]()
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

  def tagSeries(tag: String, series: Seq[String]): Int = {
    val cur = tags.getOrElse(tag, Set.empty)
    val added = series.toSet -- cur
    tags.put(tag, cur ++ added)
    added.size
  }

  def untagSeries(tag: String, series: Seq[String]): Int = {
    val cur = tags.getOrElse(tag, Set.empty)
    val removed = cur intersect series.toSet
    tags.put(tag, cur -- removed)
    removed.size
  }
}
