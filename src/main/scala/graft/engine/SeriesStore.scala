package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The engine's data model, mirroring the reference's single
  * abstraction — a named time series of (ts, value) points
  * (include/siri/db/points.h:100-111, include/siri/db/series.h:55-73)
  * — re-expressed as typed long/narrow DataFrames plus a derived
  * series catalog.
  *
  * SiriDB has exactly three value types (include/siri/db/points.h:9-14):
  * integer (int64), float (double), string. We keep each family in a
  * type-homogeneous frame so Spark's own type rules reproduce the
  * reference's per-function output types (count->int, sum(int)->int,
  * mean->float, ...) without a union-typed value column:
  *
  *   pointsF : series STRING, ts LONG, val DOUBLE, pid LONG
  *   pointsI : series STRING, ts LONG, val LONG,   pid LONG
  *   pointsS : series STRING, ts LONG, val STRING, pid LONG
  *
  * `pid` is the ingest id, used only as a deterministic tie-break for
  * equal timestamps (the reference keeps insertion order for duplicate
  * ts — src/siri/db/points.c:226-245).
  *
  * The driver's `events` table maps onto this model as three series
  * families:
  *   f.<event_type>.<user_id % 8>  val = value                   (float)
  *   i.<event_type>.<user_id % 8>  val = round(value*100)::long  (integer)
  *   s.<event_type>.<user_id % 8>  val = props                   (string/log)
  *
  * At 100 TB this table is partitioned by hash(series) and
  * time-bucketed within partitions (the analog of the reference's
  * pool placement src/siri/db/lookup.c:12-72 + shard time buckets
  * src/siri/db/shard.c); all pipeline operators group or window by
  * `series` first, so the shuffle key is stable across stages, and
  * `ts` range predicates prune parquet row groups.
  */
object SeriesStore {
  val NsPerSec = 1000000000L

  private def family(ev: DataFrame, prefix: String) =
    ev.select(
      concat(lit(prefix), col("event_type"), lit("."),
        (col("user_id") % 8).cast("string")).as("series"),
      expr(s"ts div $NsPerSec").as("ts"),
      col("event_id").as("pid"),
      col("value"), col("props"))

  /** Float-typed series family (second precision). */
  def pointsF(spark: SparkSession, dir: String): DataFrame =
    family(Tables.events(spark, dir), "f.")
      .select(col("series"), col("ts"), col("value").as("val"), col("pid"))

  /** Integer-typed series family: val LONG, exact int64 semantics. */
  def pointsI(spark: SparkSession, dir: String): DataFrame =
    family(Tables.events(spark, dir), "i.")
      .select(col("series"), col("ts"),
        round(col("value") * 100).cast("long").as("val"), col("pid"))

  /** String ("log") series family — SiriDB's TP_STRING
    * (src/siri/db/series.c:72-76). */
  def pointsS(spark: SparkSession, dir: String): DataFrame =
    family(Tables.events(spark, dir), "s.")
      .select(col("series"), col("ts"), col("props").as("val"), col("pid"))

  /** Mixed numeric view (int promoted to double) — the reference's
    * int→double promotion when families mix (points.c:368-376). */
  def points(spark: SparkSession, dir: String): DataFrame =
    pointsF(spark, dir).unionAll(
      pointsI(spark, dir).withColumn("val", col("val").cast("double")))

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

  /** Microsecond-precision float points (us is one of SiriDB's four
    * precisions — include/siri/db/time.h:8-16). */
  def pointsUs(spark: SparkSession, dir: String): DataFrame =
    pointsNs(spark, dir).withColumn("ts", expr("ts div 1000"))

  /** Reference-flavored pool placement: byte-sum of the series name
    * (src/siri/db/lookup.c:12-35 hashes the name by byte sum mod 8192
    * into a pool lookup table); we map byte-sum mod 8192 onto 4 pools.
    * Portable integer arithmetic (same result in DuckDB SQL). */
  def poolOf(colName: String) =
    expr(s"CAST(aggregate(transform(sequence(1, length($colName)), i -> ascii(substring($colName, i, 1))), 0L, (a, x) -> a + x) % 8192 % 4 AS BIGINT)")

  def poolSql(c: String): String =
    s"CAST(list_sum(list_transform(range(1, length($c) + 1), i -> ord(substring($c, i, 1)))) % 8192 % 4 AS BIGINT)"

  /** Series catalog — the queryable metadata the reference keeps per
    * series (name, type, start, end, length — src/siri/db/series.c:85-112).
    * Derived here by one aggregation over the points table; under
    * streaming ingest it is maintained incrementally per micro-batch
    * (graft.streaming.Ingest) and answers `list`/`count` queries and
    * the bare count()/first()/last() skip-points fast path
    * (src/siri/db/aggregate.c:495-510) without touching point data.
    */
  def catalog(points: DataFrame, tp: String): DataFrame =
    points.groupBy(col("series"))
      .agg(
        count(lit(1)).as("length"),
        min(col("ts")).as("start"),
        max(col("ts")).as("end"),
        // canonical string form of the first/last value by (ts, pid) —
        // long/double round-trip through string exactly, so the bare
        // first()/last() skip path re-casts without loss
        min_by(col("val").cast("string"), struct(col("ts"), col("pid")))
          .as("first_val"),
        max_by(col("val").cast("string"), struct(col("ts"), col("pid")))
          .as("last_val"))
      .withColumn("type", lit(tp))
      .withColumn("pool", poolOf("series"))

  /** Full catalog over all three families. */
  def catalogAll(spark: SparkSession, dir: String): DataFrame =
    catalog(pointsF(spark, dir), "float")
      .unionAll(catalog(pointsI(spark, dir), "integer"))
      .unionAll(catalog(pointsS(spark, dir), "string"))

  // ---- DuckDB-side SQL fragments reproducing the same frames for the
  //      driver's oracle (same `events` parquet table). ----

  val pointsFSql: String =
    """SELECT 'f.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000000000 AS ts, value AS val, event_id AS pid
      |FROM events""".stripMargin

  val pointsISql: String =
    """SELECT 'i.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000000000 AS ts, CAST(round(value * 100) AS BIGINT) AS val, event_id AS pid
      |FROM events""".stripMargin

  val pointsSSql: String =
    """SELECT 's.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000000000 AS ts, props AS val, event_id AS pid
      |FROM events""".stripMargin

  val pointsSql: String =
    pointsFSql + "\nUNION ALL\n" + pointsISql.replace(
      "CAST(round(value * 100) AS BIGINT)", "round(value * 100)")

  /** DuckDB reads parquet TIMESTAMP(NANOS) at us precision, so the ns
    * frame has no DuckDB oracle (ns exactness is pinned by
    * SeriesStoreSpec instead); the us frame is oracle-checkable. */
  val pointsUsSql: String =
    """SELECT 'f.' || event_type || '.' || CAST(user_id % 8 AS VARCHAR) AS series,
      |       epoch_ns(ts) // 1000 AS ts, value AS val, event_id AS pid
      |FROM events""".stripMargin

  def catalogSql(frame: String, tp: String): String =
    s"""SELECT series, COUNT(*) AS length, MIN(ts) AS start, MAX(ts) AS "end",
       |       '$tp' AS type, ${poolSql("series")} AS pool
       |FROM ($frame) GROUP BY series""".stripMargin

  val catalogAllSql: String =
    Seq(catalogSql(pointsFSql, "float"), catalogSql(pointsISql, "integer"),
      catalogSql(pointsSSql, "string")).mkString("\nUNION ALL\n")
}
