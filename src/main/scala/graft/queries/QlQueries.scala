package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Pipeline, SeriesStore}
import graft.parser.{EngineEnv, Planner}

/** End-to-end query-language entries: each runs a real SiriDB query
  * string through QueryParser → Planner → Catalyst, checked against a
  * hand-written DuckDB oracle. This is the surface a reference user
  * actually types (SURVEY §3.1).
  */
/** A real 2-pool PoolCluster over the sf dir's integer family, built
  * once per (session, dir) into a temp base: the integer points are
  * slot-routed with the reference's lookup (exactly how PoolCluster
  * scatters inserts) and ingested per pool, so the cluster entry
  * measures the merged-union query plan over PHYSICAL pool stores —
  * not an in-memory approximation. */
private[graft] object ClusterFixture {
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.server.PoolCluster]

  def mergedEnv(s: SparkSession, d: String): EngineEnv =
    cluster(s, d).mergedEnv("iris")

  private def cluster(s: SparkSession, d: String): graft.server.PoolCluster =
    memo.getOrElseUpdate((s, d), {
      import graft.meta.Lookup
      val base = TmpStores.freshDirFor("bench-cluster", d)
      import s.implicits._
      val lookupDf = Lookup(2).toRows.toDF("slot", "pool")
      val pts = SeriesStore.pointsI(s, d)
        .select(col("series"), col("ts"),
          col("val").cast("double").as("val_num"),
          lit("integer").as("tp"), col("pid"),
          col("val").as("val_int"), lit("").as("val_str"))
        .withColumn("slot", expr(Lookup.slotSql("series")))
        .join(broadcast(lookupDf), Seq("slot"))
      (0 to 1).foreach { k =>
        graft.streaming.Ingest.appendBatch(
          pts.where(col("pool") === k).drop("slot", "pool"),
          s"$base/pool$k", shardDuration = 86400L)
      }
      new graft.server.PoolCluster(s, base, initialPools = 2)
    })
}

object QlQueries {

  private val PF = SeriesStore.pointsFSql
  private val PI = SeriesStore.pointsISql
  private val PS = SeriesStore.pointsSSql
  private val CAT = SeriesStore.catalogAllSql
  private val ORD = "ORDER BY ts, pid"

  private def env(s: SparkSession, d: String) = EngineEnv(s, d,
    groups = Map("clicks" -> "^f\\.click\\..*"),
    tags = Map("firstpool" -> Seq("i.view.1", "i.view.2", "f.view.1")))

  private def ql(s: SparkSession, d: String, q: String): DataFrame =
    Planner.query(q, env(s, d), now = Some(1706659200L))

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)

  private def rounded(df: DataFrame): DataFrame =
    df.select(col("series"), col("ts"), round(col("val"), 6).as("val"))

  private def bkt(gb: Long, off: Long = 0) = Pipeline.bucketSql(gb, off)

  def entries: Seq[Entry] = Seq(
    // calc statement: parse-time int64 folding with units
    // (expr.c:17-100, time.c:34-54)
    Entry("ql_calc",
      "SELECT CAST(1447249033 + 7200 - 1800 AS BIGINT) AS calc") {
      (s, d) => ql(s, d, "(1447249033 + 2h) - 30m")
    },
    // `now` is captured once per query (query.c:109,592-595); entry
    // pins it via the injected now
    Entry("ql_calc_now",
      "SELECT CAST(1706659200 - 1706659200 % 86400 AS BIGINT) AS calc") {
      (s, d) => ql(s, d, "now - now % 1d")
    },
    Entry("ql_calc_date",
      "SELECT CAST(1479081600 AS BIGINT) AS calc") {
      (s, d) => ql(s, d, "'2016-11-14'")
    },
    // `alter database set timezone` changes ISO8601 interpretation
    // (query.c:916-945, listener.c:4879-4930): midnight Amsterdam
    // (CET, +01:00 on that date) is one hour before midnight UTC
    Entry("ql_calc_tz",
      "SELECT CAST(1479081600 - 3600 AS BIGINT) AS calc") {
      (s, d) =>
        val e = EngineEnv(s, d)
        Planner.query("alter database set timezone 'Europe/Amsterdam'", e)
        Planner.query("'2016-11-14'", e)
    },
    Entry("ql_select_sum_between",
      s"""SELECT series, ${bkt(3600)} AS ts, CAST(sum(val) AS BIGINT) AS val
         |FROM ($PI) WHERE regexp_matches(series, '^i\\.click\\.')
         |  AND ts >= 1705000000 AND ts < 1706000000
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d,
        "select sum(1h) from /^i\\.click\\..*/ between 1705000000 and 1706000000"))
    },
    // the SAME ranged select through a 2-pool PoolCluster's merged env
    // (one Catalyst plan over the unioned pool frames, per-pool shard
    // pruning): benched per round against the standalone entry above,
    // so the fan-out+merge overhead is a measured number, not a claim
    Entry("cluster_select_sum_between",
      s"""SELECT series, ${bkt(3600)} AS ts, CAST(sum(val) AS BIGINT) AS val
         |FROM ($PI) WHERE regexp_matches(series, '^i\\.click\\.')
         |  AND ts >= 1705000000 AND ts < 1706000000
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Planner.query(
        "select sum(1h) from /^i\\.click\\..*/ between 1705000000 and 1706000000",
        ClusterFixture.mergedEnv(s, d), now = Some(1706659200L)))
    },
    Entry("ql_select_chain",
      s"""WITH b AS (SELECT series, ${bkt(7200)} AS ts, CAST(max(val) AS BIGINT) AS val
         |           FROM ($PI) WHERE regexp_matches(series, '^i\\.view\\.') GROUP BY 1, 2)
         |SELECT series, ts, val - prev AS val FROM (
         |  SELECT series, ts, val, lag(val) OVER (PARTITION BY series ORDER BY ts) AS prev FROM b
         |) WHERE prev IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select max(2h) => difference() from /^i\\.view\\..*/"))
    },
    Entry("ql_select_presuf",
      s"""WITH p AS (SELECT * FROM ($PI) WHERE regexp_matches(series, '^i\\.error\\.')),
         |mn AS (SELECT 'min-' || series AS series, ${bkt(21600)} AS ts, min(val) AS val FROM p GROUP BY 2, series),
         |mx AS (SELECT 'max-' || series AS series, ${bkt(21600)} AS ts, max(val) AS val FROM p GROUP BY 2, series)
         |SELECT * FROM (SELECT * FROM mn UNION ALL SELECT * FROM mx) ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d,
        "select min(6h) prefix 'min-', max(6h) prefix 'max-' from /^i\\.error\\..*/"))
    },
    Entry("ql_select_head",
      s"""SELECT series, ts, val FROM ($PI) WHERE series = 'i.click.0'
         |QUALIFY row_number() OVER (PARTITION BY series $ORD) <= 3 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select * from 'i.click.0' head 3"))
    },
    Entry("ql_select_tail",
      s"""SELECT series, ts, val FROM ($PI) WHERE series = 'i.click.0'
         |QUALIFY row_number() OVER (PARTITION BY series ORDER BY ts DESC, pid DESC) <= 4 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select * from 'i.click.0' tail 4"))
    },
    // deterministic show props are oracle-checkable as literals
    Entry("ql_show",
      """SELECT * FROM (
        |  SELECT 'dbname' AS name, 'graft' AS value
        |  UNION ALL SELECT 'time_precision', 's'
        |  UNION ALL SELECT 'version', '2.0.55') ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "show dbname, time_precision, version"))
    },
    Entry("ql_select_filter_merge",
      s"""SELECT 'big purchases' AS series, ${bkt(86400)} AS ts, CAST(sum(val) AS BIGINT) AS val
         |FROM (SELECT series AS orig, ${bkt(86400)} AS ts, val
         |      FROM ($PI) WHERE regexp_matches(series, '^i\\.purchase\\.') AND val >= 10000)
         |GROUP BY 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d,
        "select filter(>= 10000) => sum(1d) from /^i\\.purchase\\..*/ merge as 'big purchases' using sum(1d)"))
    },
    Entry("ql_select_group_union",
      s"""SELECT series, max(ts) AS ts, count(*) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.click\\.') OR series = 'f.signup.0'
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select count() from `clicks`, 'f.signup.0'"))
    },
    Entry("ql_select_where",
      s"""SELECT series, max(ts) AS ts, count(*) AS val FROM ($PI)
         |WHERE series IN (SELECT series FROM ($CAT)
         |                 WHERE "type" = 'integer' AND "length" > 250 AND contains(series, 'view'))
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d,
        "select count() from /^i\\..*/ where length > 250 and name ~ 'view'"))
    },
    // bare first()/last() answer from the catalog's first_val/last_val
    // without reading point data (aggregate.c:495-510); the oracle
    // computes them straight from the points, pinning that the
    // skip-path round-trip (typed value -> canonical string -> typed
    // value) is lossless
    Entry("ql_select_first_skip",
      s"""SELECT series, min(ts) AS ts, first(val $ORD) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.')
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select first() from /^f\\..*/"))
    },
    Entry("ql_select_last_skip",
      s"""SELECT series, max(ts) AS ts, last(val $ORD) AS val
         |FROM ($PI) WHERE regexp_matches(series, '^i\\.')
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select last() from /^i\\..*/"))
    },
    Entry("ql_select_str_first",
      s"""SELECT series, ${bkt(86400)} AS ts, first(val $ORD) AS val
         |FROM ($PS) WHERE series = 's.signup.3' GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select first(1d) from 's.signup.3'"))
    },
    Entry("ql_list_series_where",
      s"""SELECT series AS name, "length" FROM ($CAT)
         |WHERE contains(series, 'click') AND "length" > 250 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d,
        "list series name, length where name ~ 'click' and length > 250"))
    },
    Entry("ql_list_series_match",
      s"""SELECT series AS name, "type", pool FROM ($CAT)
         |WHERE regexp_matches(series, '^s\\.') ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "list series name, type, pool /^s\\..*/"))
    },
    Entry("ql_count_series",
      s"""SELECT count(*) AS series FROM ($CAT) WHERE regexp_matches(series, '^f\\.')""") {
      (s, d) => ql(s, d, "count series /^f\\..*/")
    },
    Entry("ql_count_series_length",
      s"""SELECT CAST(sum("length") AS BIGINT) AS series_length FROM ($CAT)
         |WHERE "type" = 'integer'""".stripMargin) {
      (s, d) => ql(s, d, "count series length where type == integer")
    },
    Entry("ql_select_tag_mean",
      s"""SELECT series, ${bkt(43200)} AS ts, round(avg(val), 6) AS val
         |FROM (${SeriesStore.pointsSql})
         |WHERE series IN ('i.view.1', 'i.view.2', 'f.view.1')
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      // tag mixes int+float series → values promote to double
      // (points.c:368-376)
      (s, d) => ordered(rounded(ql(s, d, "select mean(12h) from `firstpool`")))
    },
    Entry("ql_timeit_count",
      s"""SELECT count(*) AS series FROM ($CAT)""") {
      (s, d) => ql(s, d, "timeit count series")
    },
    // the servers view's default columns are deterministic constants
    // on a single-node deployment — oracle-checkable as literals
    Entry("ql_list_servers",
      """SELECT 'local' AS name, CAST(0 AS BIGINT) AS pool,
        |'2.0.55' AS version, 'true' AS online, 'running' AS status""".stripMargin) {
      (s, d) => ql(s, d, "list servers")
    },
    // users listing with the bit-compare where clause; the seeded
    // default user plus a granted one (access.c fold reprs)
    Entry("ql_list_users_access",
      """SELECT * FROM (
        |  SELECT 'iris' AS name, 'full' AS access
        |  UNION ALL SELECT 'ops', 'read and insert') ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val e = EngineEnv(s, d)
        Planner.query("create user 'ops' set password 'pw1234'", e)
        Planner.query("grant read, insert to user 'ops'", e)
        ordered(Planner.query("list users where access >= show", e))
    },
    // start/end are the shard bucket bounds (listener.c:2553-2554),
    // not the min/max point ts
    Entry("ql_list_shards",
      s"""SELECT sid, pool, size, sid * 604800 AS start,
         |       (sid + 1) * 604800 AS "end"
         |FROM (SELECT ts // 604800 AS sid, CAST(0 AS BIGINT) AS pool,
         |      count(*) * 16 AS size
         |      FROM (${SeriesStore.pointsSql}) GROUP BY 1)
         |WHERE size > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "list shards where size > 0"))
    },
    // aggregate grammar through the ql surface (engine-level oracles
    // exist per function; these pin the query-string → plan path)
    Entry("ql_select_median",
      s"""SELECT series, ${bkt(21600)} AS ts, round(quantile_cont(val, 0.5), 6) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.view\\.')
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(rounded(ql(s, d, "select median(6h) from /^f\\.view\\..*/")))
    },
    Entry("ql_select_variance",
      s"""SELECT series, ${bkt(21600)} AS ts, round(coalesce(var_samp(val), 0.0), 6) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.view\\.')
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(rounded(ql(s, d, "select variance(6h) from /^f\\.view\\..*/")))
    },
    // greedy bucket labels replayed with the same recursive walk as
    // the limit_fn_mean oracle (aggregate.c:1188-1210)
    Entry("ql_select_limit_fn",
      s"""WITH RECURSIVE p AS (SELECT * FROM ($PF) WHERE regexp_matches(series, '^f\\.click\\.')),
         |s AS (SELECT series, count(*) AS len, min(ts) AS t0, max(ts) AS t1 FROM p GROUP BY 1),
         |g AS (SELECT series, len, (t1 - t0) // 40 + 1 AS gb,
         |             (t0 - 1) % ((t1 - t0) // 40 + 1) AS off FROM s),
         |j AS (SELECT p.series, p.ts, p.val, g.len, g.gb, g.off FROM p JOIN g USING (series)),
         |small AS (SELECT series, ts, val FROM j WHERE len <= 40),
         |walk(series, gb, off, lbl) AS (
         |  SELECT series, gb, off, (min(ts) + gb - 1) // gb * gb + off
         |  FROM j WHERE len > 40 GROUP BY 1, 2, 3
         |  UNION ALL
         |  SELECT w.series, w.gb, w.off, (nxt.ts + w.gb - 1) // w.gb * w.gb + w.off
         |  FROM walk w
         |  JOIN LATERAL (SELECT min(ts) AS ts FROM j WHERE j.series = w.series AND j.ts > w.lbl) nxt
         |    ON nxt.ts IS NOT NULL),
         |big AS (SELECT j.series,
         |          (SELECT min(w.lbl) FROM walk w WHERE w.series = j.series AND w.lbl >= j.ts) AS ts,
         |          avg(val) AS val
         |        FROM j WHERE len > 40 GROUP BY 1, 2)
         |SELECT series, ts, round(val, 6) AS val
         |FROM (SELECT * FROM small UNION ALL SELECT * FROM big) ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(rounded(ql(s, d, "select limit(40, mean) from /^f\\.click\\..*/")))
    },
    Entry("ql_count_groups",
      "SELECT CAST(1 AS BIGINT) AS groups") {
      (s, d) => ql(s, d, "count groups")
    },
    Entry("ql_count_tags",
      "SELECT CAST(1 AS BIGINT) AS tags") {
      (s, d) => ql(s, d, "count tags")
    },
    Entry("ql_count_pools",
      s"SELECT CAST(count(DISTINCT pool) AS BIGINT) AS pools FROM ($CAT)") {
      (s, d) => ql(s, d, "count pools")
    },
    // count shards size sums the shard sizes without a where
    // (listener.c shards size aggregation)
    Entry("ql_count_shards_size",
      s"""SELECT CAST(count(*) * 16 AS BIGINT) AS size
         |FROM (${SeriesStore.pointsSql})""".stripMargin) {
      (s, d) => ql(s, d, "count shards size")
    },
    // default entity columns: groups (name, expression, series),
    // tags (name, series), pools (pool, servers, series)
    Entry("ql_list_groups",
      s"""SELECT * FROM (
         |  SELECT 'clicks' AS name, '^f\\.click\\..*' AS expression,
         |         (SELECT count(*) FROM ($CAT)
         |          WHERE regexp_matches(series, '^f\\.click\\.')) AS series
         |  UNION ALL
         |  SELECT 'errors', '^i\\.error\\..*',
         |         (SELECT count(*) FROM ($CAT)
         |          WHERE regexp_matches(series, '^i\\.error\\.'))
         |) ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val e = env(s, d)
        Planner.query("create group `errors` for /^i\\.error\\..*/", e)
        ordered(Planner.query("list groups", e))
    },
    Entry("ql_list_tags",
      "SELECT 'firstpool' AS name, CAST(3 AS BIGINT) AS series") {
      (s, d) => ordered(ql(s, d, "list tags"))
    },
    Entry("ql_list_pools",
      s"""SELECT pool, CAST(1 AS BIGINT) AS servers, count(*) AS series
         |FROM ($CAT) GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "list pools"))
    },
    // signed infinity / nan literals in filter() (grammar r_float,
    // filter nan/inf handling — aggregate filter, points.c)
    Entry("ql_flt_ninf",
      s"""SELECT series, ts, val FROM ($PF)
         |WHERE series = 'f.click.0' AND val > CAST('-inf' AS DOUBLE)
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select filter(> -inf) from 'f.click.0'"))
    },
    Entry("ql_flt_nan",
      s"""SELECT series, ts, val FROM ($PF)
         |WHERE series = 'f.click.0' AND val != CAST('nan' AS DOUBLE)
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "select filter(!= nan) from 'f.click.0'"))
    },
    // after + merge + using combination (merge semantics over a
    // time-bounded selection)
    Entry("ql_select_after_merge",
      s"""SELECT 'clicks' AS series, ${bkt(86400)} AS ts, round(sum(val), 6) AS val
         |FROM ($PF)
         |WHERE regexp_matches(series, '^f\\.click\\.') AND ts >= 1706000000
         |GROUP BY 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(rounded(ql(s, d,
        "select sum(1d) from /^f\\.click\\..*/ after 1706000000 merge as 'clicks' using sum(1d)")))
    },
    // the two shard durations surface through show (db.c:395-424)
    Entry("ql_show_durations",
      """SELECT * FROM (
        |  SELECT 'duration_log' AS name, '86400' AS value
        |  UNION ALL SELECT 'duration_num', '604800') ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d, "show duration_num, duration_log"))
    },
    // DDL round-trips: mutations execute eagerly on a fresh metastore,
    // the returned query reads the mutated state
    Entry("ql_ddl_group_roundtrip",
      s"""SELECT series, max(ts) AS ts, count(*) AS val FROM ($PI)
         |WHERE regexp_matches(series, '^i\\.signup\\.')
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val e = EngineEnv(s, d)
        Planner.query("create group `signups` for /^i\\.signup\\..*/", e)
        ordered(Planner.query("select count() from `signups`", e))
    },
    Entry("ql_ddl_tag_roundtrip",
      s"""SELECT series, ts, val FROM ($PI)
         |WHERE series IN ('i.view.0', 'i.view.1') AND ts >= 1706000000 ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val e = EngineEnv(s, d)
        Planner.query("alter series 'i.view.0' | 'i.view.1' tag `watch`", e)
        ordered(Planner.query("select * from `watch` after 1706000000", e))
    },
    // renames keep membership and grants (group.c set_name,
    // user.c:140-191): group rename answers via the new name, user
    // rename keeps its access bits
    Entry("ql_ddl_rename_roundtrip",
      s"""SELECT * FROM (
         |  SELECT series, max(ts) AS ts, count(*) AS val FROM ($PF)
         |  WHERE regexp_matches(series, '^f\\.view\\.')
         |  GROUP BY 1) ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val e = EngineEnv(s, d)
        Planner.query("create group `tmpg` for /^f\\.view\\..*/", e)
        Planner.query("alter group `tmpg` set name 'viewsg'", e)
        Planner.query("create user 'renameme' set password 'pw1234'", e)
        Planner.query("grant count to user 'renameme'", e)
        Planner.query("alter user 'renameme' set name 'renamed'", e)
        val acc = Planner.query("list users name, access where name == 'renamed'", e)
          .collect().map(_.toSeq).toSeq
        require(acc == Seq(Seq("renamed", "count")),
          s"renamed user lost grants: $acc")
        ordered(Planner.query("select count() from `viewsg`", e))
    },
    // parenthesized set algebra through the ql list surface
    // (test_parentheses.py: `all - (a | b | /re/)`)
    Entry("ql_list_series_setops",
      s"""SELECT series AS name FROM ($CAT)
         |WHERE NOT (regexp_matches(series, '^f\\.click\\.')
         |           OR series = 'i.error.3'
         |           OR regexp_matches(series, '^s\\.')) ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(ql(s, d,
        "list series all - (`clicks` | 'i.error.3' | /^s\\..*/)"))
    },
    Entry("ql_ddl_drop_where",
      s"""SELECT count(*) AS series FROM ($CAT) WHERE NOT "length" > 260""") {
      (s, d) =>
        val e = EngineEnv(s, d)
        Planner.query("drop series where length > 260 set ignore_threshold true", e)
        Planner.query("count series", e)
    },
    // standing-rollup read path (Rollup.fromPoints → Planner): the
    // coarse select is answered from pre-aggregated 1h buckets, and
    // must equal DuckDB's raw-point answer exactly — max/count are
    // order-independent, so nesting right-aligned buckets is lossless
    Entry("ql_rollup_max_6h",
      s"""SELECT series, ${bkt(21600)} AS ts, max(val) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.')
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val rdf = graft.streaming.Rollup.fromPoints(SeriesStore.pointsF(s, d), 3600L)
        val e = env(s, d).copy(rollup = Some((3600L, rdf)))
        ordered(Planner.query("select max(6h) from /^f\\..*/", e,
          now = Some(1706659200L)))
    },
    Entry("ql_rollup_count_1d",
      s"""SELECT series, ${bkt(86400)} AS ts, CAST(count(*) AS BIGINT) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.')
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) =>
        val rdf = graft.streaming.Rollup.fromPoints(SeriesStore.pointsF(s, d), 3600L)
        val e = env(s, d).copy(rollup = Some((3600L, rdf)))
        ordered(Planner.query("select count(1d) from /^f\\..*/", e,
          now = Some(1706659200L)))
    },
    // retention × rollup: a PHYSICAL store with a standing rollup is
    // expired (shards wholly before the cutoff deleted), then the
    // rollup read path must answer exactly what a raw scan of the
    // SURVIVING points answers — Ingest.rollupExpire prunes the
    // pre-aggregates to the same cutoff the raw shards were pruned to
    // (the reference re-indexes after expiry, db.c:865-878)
    Entry("ql_rollup_after_expire",
      s"""SELECT series, ${bkt(86400)} AS ts, CAST(count(*) AS BIGINT) AS val
         |FROM ($PF) WHERE regexp_matches(series, '^f\\.')
         |  AND ts >= 1705622400
         |GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.functions.lit
        val store = TmpStores.freshDirFor("rollup-exp", d)
        graft.streaming.Ingest.appendBatch(
          SeriesStore.pointsF(s, d).select(col("series"), col("ts"),
            col("val").as("val_num"), lit("float").as("tp"), col("pid")),
          store, shardDuration = 86400L)
        graft.streaming.Rollup.fromPoints(
          graft.streaming.Ingest.points(s, store)
            .select(col("series"), col("ts"), col("val")), 3600L)
          .write.parquet(s"$store/rollup/3600")
        // cutoff shard 19741 → survivors are ts >= 1705622400
        graft.streaming.Ingest.expire(s, store,
          expiration = 1706659200L - 1705622400L, now = 1706659200L,
          shardDuration = 86400L)
        val api = new graft.server.ApiCore(s, store)
        ordered(Planner.query("select count(1d) from /^f\\..*/",
          api.env("iris"), now = Some(1706659200L)))
    })
}
