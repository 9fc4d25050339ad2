package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark program plus (when the operator
  * is SQL-expressible) an equivalent DuckDB oracle over the same
  * parquet tables. Column names/types must match exactly — the driver
  * sorts columns by name and hashes values.
  */
final case class Entry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Entry {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Entry =
    Entry(name, run, Some(oracle))
  def weak(name: String)(run: (SparkSession, String) => DataFrame): Entry =
    Entry(name, run, None)
}
