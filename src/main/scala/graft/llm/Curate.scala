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
}
