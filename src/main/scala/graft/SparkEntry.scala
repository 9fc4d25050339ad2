package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DataOpsQueries, EngineQueries, Entry, QlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 (and the LLM-data-ops
  * set) is registered in `queries`; SQL-expressible ones also declare
  * a DuckDB oracle in `oracleSql` for the driver's differential check.
  */
object SparkEntry {

  def all: Seq[Entry] =
    EngineQueries.entries ++ DataOpsQueries.entries ++ QlQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_count_1h")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate LSH search, simhash) — those are pinned by ScalaTest
    * specs instead. */
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(sql => e.name -> sql)).toMap
}
