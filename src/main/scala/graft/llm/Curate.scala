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
    * only source-sized joins, so the whole report is one Catalyst
    * plan whose heavy lifting (the pair walk, the token aggs) is
    * exactly what the standalone entries already pay. Sources whose
    * pruned vocabulary is under 2 terms carry NULL slope columns
    * (zipfFit's den > 0 gate). Output (source, n_docs, n_dups,
    * dup_rate_q6, n_pass, pass_rate_q6, n_terms, slope_q6). */
  def sourceQualityReport(docs: DataFrame, n: Int = 3,
      theta: Double = 0.5, minFreq: Long = 2L): DataFrame = {
    val dup = Dedup.dupRateBySource(docs, n, theta)
    val gates = TextStats.gopherGates(docs)
      .select(col("doc_id"), col("passes"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(when(col("passes"), 1L).otherwise(0L)).as("n_pass"),
        count(lit(1)).as("__n"))
      .select(col("source"), col("n_pass"),
        floor(col("n_pass") / col("__n").cast("double") * 1e6)
          .cast("long").as("pass_rate_q6"))
    val zipf = TextStats.zipfFit(docs, minFreq, keyCol = "source")
    dup.join(gates, Seq("source"))
      .join(zipf, Seq("source"), "left")
  }
}
