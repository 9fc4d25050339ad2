package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical time-series alignment operator (kdb's
  * `aj`, QuestDB/DuckDB `ASOF JOIN`): for every left-side point, the
  * right side's value at the LARGEST right timestamp <= the left
  * timestamp within the same key, or null when no right point
  * precedes it (LEFT ASOF semantics). The reference has no such
  * operator; it is the natural extension of its `merge` for aligning
  * irregularly-sampled series (SURVEY §2.6).
  *
  * Spark-first shape: both sides union into one frame ordered by
  * (ts, side) within each key — right rows sort BEFORE left rows at
  * equal ts so an exactly-simultaneous right value is visible — and
  * one `last(value, ignoreNulls)` running window carries the latest
  * right ROW forward onto every left row. The carried value is the
  * right value boxed in a single-field struct: the struct is non-null
  * for every right row even when the VALUE is null, so a genuinely
  * null right value is returned as null (the matched row's value —
  * DuckDB/kdb ASOF semantics) rather than skipped in favor of an
  * older non-null one. One shuffle on the key, per-key ordering only
  * (NO global sort), linear in both inputs — the merge-scan an
  * index-backed TSDB would do, expressed as a window. Right-side
  * duplicates at one (key, ts) must be pre-aggregated by the caller
  * (deterministically, e.g. max_by(val, pid)) — as-of is only
  * well-defined against a keyed series.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVal: String, out: String = "asof_val"): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lStructType = left.select(lStruct).schema.head.dataType
    val rvType = right.select(col(rightVal)).schema.head.dataType
    val rvBox = struct(col(rightVal).cast(rvType).as("v"))
    val rvBoxType = right.select(rvBox).schema.head.dataType
    val l = left.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(1).as("__ord"), lStruct.as("__l"),
      lit(null).cast(rvBoxType).as("__rv"))
    val r = right.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(0).as("__ord"), lit(null).cast(lStructType).as("__l"),
      rvBox.as("__rv"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__ord") === 1)
      .select(col("__l.*"), col("__asof").getField("v").as(out))
  }
}
