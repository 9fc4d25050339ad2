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

  /** `forward = false` (default): kdb/DuckDB backward as-of — largest
    * right ts ≤ left ts. `forward = true`: smallest right ts ≥ left
    * ts (the "next observation" alignment; equal ts visible in both
    * directions). The SAME one-union one-window plan serves both —
    * forward just reverses the scan order, so the "latest seen" right
    * row in the descending walk IS the smallest ts ≥ the left row.
    *
    * `tolerance` (0 = unbounded) bounds the match's staleness: a
    * matched right row further than `tolerance` seconds from the left
    * ts returns null instead. Correct without a second pass because
    * any OTHER candidate is farther still — the as-of pick is always
    * the nearest in its direction — so nulling the pick is exactly
    * "no match within tolerance" (the matched ts rides along in the
    * carried struct; one comparison at projection time). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVal: String, out: String = "asof_val",
      forward: Boolean = false, tolerance: Long = 0L): DataFrame = {
    require(tolerance >= 0L, "tolerance must be non-negative")
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lStructType = left.select(lStruct).schema.head.dataType
    val rvType = right.select(col(rightVal)).schema.head.dataType
    val rvBox = struct(col(ts).as("t"), col(rightVal).cast(rvType).as("v"))
    val rvBoxType = right.select(rvBox).schema.head.dataType
    val l = left.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(1).as("__ord"), lStruct.as("__l"),
      lit(null).cast(rvBoxType).as("__rv"))
    val r = right.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(0).as("__ord"), lit(null).cast(lStructType).as("__l"),
      rvBox.as("__rv"))
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tsOrd, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staleness =
      if (forward) col("__asof").getField("t") - col("__ts")
      else col("__ts") - col("__asof").getField("t")
    val matched =
      if (tolerance == 0L) col("__asof").getField("v")
      else when(staleness <= tolerance, col("__asof").getField("v"))
    l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__ord") === 1)
      .select(col("__l.*"), matched.as(out))
  }
}
