package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The engine's data model, mirroring the reference's single
  * abstraction — a named time series of (ts, value) points
  * (include/siri/db/points.h:100-111, include/siri/db/series.h:55-73)
  * — re-expressed as one long/narrow DataFrame plus a derived series
  * catalog.
  *
  * Long-table schema:
  *   series STRING  — series name
  *   ts     LONG    — epoch in the database's precision (here: seconds
  *                    derived from the ns event timestamps; ns kept
  *                    where a query needs full precision)
  *   val    DOUBLE  — point value (numeric series)
  *   pid    LONG    — ingest id; only used as a deterministic
  *                    tie-break for equal timestamps (the reference
  *                    keeps insertion order for duplicate ts —
  *                    src/siri/db/points.c:226-245)
  *
  * The driver's `events` table maps onto this model as two series
  * families (float + integer, SiriDB's two numeric types —
  * include/siri/db/points.h:9-14):
  *   f.<event_type>.<user_id % 8>  val = value           (float)
  *   i.<event_type>.<user_id % 8>  val = round(value*100) (integer)
  *
  * At 100 TB this table is partitioned by hash(series) and
  * time-bucketed within partitions (the analog of the reference's
  * pool placement src/siri/db/lookup.c:12-72 + shard time buckets
  * src/siri/db/shard.c); all pipeline operators below group or window
  * by `series` first, so the shuffle key is stable across stages.
  */
object SeriesStore {
  val NsPerSec = 1000000000L

  /** Numeric points table at second precision. */
  def points(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    floatFamily(ev).unionAll(intFamily(ev))
  }

  /** Float-typed series family from events. */
  def floatFamily(ev: DataFrame): DataFrame =
    ev.select(
      concat(lit("f."), col("event_type"), lit("."),
        (col("user_id") % 8).cast("string")).as("series"),
      expr(s"ts div $NsPerSec").as("ts"),
      col("value").as("val"),
      col("event_id").as("pid"))

  /** Integer-typed series family (values are integral doubles so that
    * sums stay exact — see GraftQueries determinism notes). */
  def intFamily(ev: DataFrame): DataFrame =
    ev.select(
      concat(lit("i."), col("event_type"), lit("."),
        (col("user_id") % 8).cast("string")).as("series"),
      expr(s"ts div $NsPerSec").as("ts"),
      round(col("value") * 100).as("val"),
      col("event_id").as("pid"))

  /** Nanosecond-precision float points (SiriDB supports s|ms|us|ns;
    * ns must stay LONG end-to-end — itest/test_select_ns.py). */
  def pointsNs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      concat(lit("f."), col("event_type"), lit("."),
        (col("user_id") % 8).cast("string")).as("series"),
      col("ts"),
      col("value").as("val"),
      col("event_id").as("pid"))
  }

  /** Series catalog — the queryable metadata the reference keeps per
    * series (name, type, start, end, length; src/siri/db/series.c:85-112).
    * Derived by one aggregation over the points table; on a real
    * deployment this is maintained incrementally on ingest
    * (see graft.streaming.Ingest) and answers `list`/`count` queries
    * and the bare count()/first()/last() skip-points fast path
    * (src/siri/db/aggregate.c:495-510) without touching point data.
    */
  def catalog(points: DataFrame): DataFrame =
    points.groupBy(col("series"))
      .agg(
        count(lit(1)).as("length"),
        min(col("ts")).as("start"),
        max(col("ts")).as("end"))
      .withColumn("type",
        when(col("series").startsWith("f."), "float").otherwise("integer"))
      .withColumn("pool", pmod(xxhash64(col("series")), lit(4)))

  /** DuckDB-side SQL fragment reproducing `points` for the oracle. */
  val pointsSql: String =
    """SELECT 'f.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000000000 AS ts, value AS val, event_id AS pid
      |FROM events
      |UNION ALL
      |SELECT 'i.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000000000 AS ts, round(value * 100) AS val, event_id AS pid
      |FROM events""".stripMargin

  val floatFamilySql: String =
    """SELECT 'f.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000000000 AS ts, value AS val, event_id AS pid
      |FROM events""".stripMargin

  val pointsNsSql: String =
    """SELECT 'f.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) AS ts, value AS val, event_id AS pid
      |FROM events""".stripMargin
}
