package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data
  * team actually runs, demonstrating that the operators are
  * DataFrame-in/DataFrame-out composable stages:
  *
  *   1. quality gate  — [[TextStats.gopherGates]] conjunction
  *   2. exact dedup   — keep each content group's canonical doc
  *      ([[Dedup.exactGroups]] keeper)
  *   3. mixture       — [[TextStats.sampleMixture]] at target source
  *      weights, with rates computed from the CURATED corpus (stage-3
  *      sampling adapts to what stages 1-2 removed)
  *
  * Each stage is the already-verified operator unchanged; the
  * composition itself is one Catalyst plan (gates and keepers are
  * doc_id joins, the mixture a broadcast-count filter), so the whole
  * pipeline still pushes down, prunes, and never collects documents
  * to the driver.
  */
object Curate {

  def curate(docs: DataFrame, weights: Map[String, Double]): DataFrame = {
    val gated = TextStats.gopherGates(docs)
      .where(col("passes")).select(col("doc_id"))
    val keepers = Dedup.exactGroups(docs)
      .select(col("keep_id").as("doc_id"))
    val curated = docs.join(gated, Seq("doc_id")).join(keepers, Seq("doc_id"))
    TextStats.sampleMixture(curated, weights)
  }

  /** Per-source quality rollup — the ONE table a curation run reads
    * first, composing three already-verified per-source signals:
    *   near-dup fraction ([[Dedup.dupRateBySource]] — drop or
    *   down-weight sources that are mostly copies), Gopher gate pass
    *   rate ([[TextStats.gopherGates]] — how much survives the
    *   quality filter), and the Zipf rank-frequency slope
    *   ([[TextStats.zipfFit]] keyed on source — natural language
    *   reads ≈ −1; boilerplate/generated slices bend away).
    * Each stage is the verified operator unchanged; the rollup adds
    * only source-sized joins.
    *
    * Scale split: the gate and Zipf stages are LINEAR and run over
    * the full corpus; the dup stage's exact pair walk is
    * pair-quadratic in duplicate density (the measured 28 G-row sf10
    * blowup — maxDf can't rescue a replicated corpus), so it runs on
    * the ADAPTIVE md5-sampled slice ([[Dedup.simhashRecallAudit]]'s
    * scale path): `sampleMod` > 0 fixes the modulus (1 = full), the
    * default 0 targets ~`sampleTarget` docs whatever the corpus size
    * — constant dup-stage cost by construction. The dup columns are
    * therefore the SLICE'S internal dup statistics: a duplicate whose
    * partner fell outside the slice is not counted, so the rate is a
    * downward-biased estimate that still RANKS sources (the decision
    * the table exists for); below the target the slice is the corpus
    * and the columns are exact. Sources missing from the slice (or
    * whose pruned vocabulary can't fit a line) carry NULL dup / slope
    * columns. Output (source, n_docs, n_pass, pass_rate_q6, n_terms,
    * slope_q6, dup_docs, dup_dups, dup_rate_q6). */
  def sourceQualityReport(docs: DataFrame, n: Int = 3,
      theta: Double = 0.5, minFreq: Long = 2L,
      sampleMod: Long = 0L, sampleTarget: Long = 2500L): DataFrame = {
    val slice = Adaptive.slice(docs, "doc_id", sampleMod, sampleTarget)
    val dup = Dedup.dupRateBySource(slice, n, theta)
      .select(col("source"), col("n_docs").as("dup_docs"),
        col("n_dups").as("dup_dups"), col("dup_rate_q6"))
    val gates = TextStats.gopherGates(docs)
      .select(col("doc_id"), col("passes"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("n_pass"))
      .select(col("source"), col("n_docs"), col("n_pass"),
        floor(col("n_pass") / col("n_docs").cast("double") * 1e6)
          .cast("long").as("pass_rate_q6"))
    val zipf = TextStats.zipfFit(docs, minFreq, keyCol = "source")
    // both right sides are ≤ #sources rows; the dup stage ends in a
    // localCheckpoint (no stats), so Catalyst would sort-merge it —
    // say broadcast explicitly
    gates.join(broadcast(zipf), Seq("source"), "left")
      .join(broadcast(dup), Seq("source"), "left")
  }
}
