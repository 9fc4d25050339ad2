package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-series heavy hitters at sketch cost — "which value band
  * dominates this metric" (the latency-band / status-code panel),
  * answered with the classic two-pass certified-sketch shape:
  *
  *  1. CANDIDATES: one Misra-Gries pass per partition (k counters per
  *     (partition, series) — memory O(#series·k) per task, never
  *     value-cardinality-sized). Any item with global frequency >
  *     n_series/k must exceed that rate in at least one partition,
  *     and partition-local MG keeps every such item, so the candidate
  *     union is a guaranteed SUPERSET of the true heavy hitters.
  *  2. CERTIFY: exact recount of the candidates only (a left-semi
  *     join prunes the shuffle to candidate rows), filter
  *     cnt·k > n_series. Output is EXACTLY the true heavy-hitter set
  *     with exact counts — which is why the DuckDB oracle is a plain
  *     GROUP BY ... HAVING, with no sketch semantics to replay.
  *
  * A direct groupBy(series, item) would also be exact but shuffles
  * EVERY distinct item; the MG pre-pass bounds the shuffled
  * candidate set to ≤ k·#partitions rows — the difference between a
  * panel query and a full-cardinality aggregation at 100 TB.
  * `binWidth` coarsens raw values into bands first (heavy hitters
  * over near-continuous values are vacuous). */
object HeavyHitters {

  /** (series, bin, cnt, n_series) for every value band with frequency
    * strictly above n_series/k; bin = val DIV binWidth (floor — the
    * valueHistogram pmod form, exact for negative values too). */
  def heavyValueBins(points: DataFrame, binWidth: Long = 5000L,
      k: Int = 8): DataFrame = {
    require(k >= 2 && binWidth > 0, "need k >= 2 and binWidth > 0")
    val spark = points.sparkSession
    import spark.implicits._
    val binned = points.select(col("series"),
      expr(s"(val - (((val % $binWidth) + $binWidth) % $binWidth)) DIV $binWidth")
        .as("bin"))
    val cands = binned.as[(String, Long)].mapPartitions { it =>
      val mg = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Map[Long, Long]]
      it.foreach { case (s, v) =>
        val m = mg.getOrElseUpdate(s,
          scala.collection.mutable.Map.empty[Long, Long])
        if (m.contains(v)) m(v) += 1L
        else if (m.size < k) m(v) = 1L
        else {
          val dead = m.keys.filter { key =>
            m(key) -= 1L; m(key) == 0L
          }.toList
          dead.foreach(m.remove)
        }
      }
      mg.iterator.flatMap { case (s, m) => m.keysIterator.map(v => (s, v)) }
    }.toDF("series", "bin").distinct()
    val counts = binned.join(cands, Seq("series", "bin"), "left_semi")
      .groupBy(col("series"), col("bin")).agg(count(lit(1)).as("cnt"))
    val totals = binned.groupBy(col("series"))
      .agg(count(lit(1)).as("n_series"))
    counts.join(broadcast(totals), Seq("series"))
      .where(col("cnt") * k > col("n_series"))
  }
}
