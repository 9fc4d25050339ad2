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
    * the full corpus; the dup stage is the CAPPED MinHash-LSH pair
    * walk ([[Dedup.minhashLshPairs]] with `maxBucket`, the stage
    * `dedup_cluster_best` measured FLAT sf1→sf10 where the exact
    * inverted-index walk read 21× for 10× data) feeding
    * [[Dedup.dupClusters]], so the dup columns are FULL-CORPUS dup
    * counts at linear cost — every source gets a row, no slice bias,
    * no NULL dup columns (the r14-flagged caveat, retired). TWO
    * approximations remain, both on the recall side: (a) the cap's
    * documented trade — a band bucket holding more than `maxBucket`
    * docs is skipped, so a mega-duplicate-group's rate can read low —
    * and (b) MinHash banding itself, which admits a pair at J near
    * theta only with probability 1−(1−J^r)^b (≈13% miss at J = 0.5
    * with 32 bands of 4 rows), where the DuckDB oracle walks the
    * EXACT full-corpus Jaccard pair set. At the correctness SF the
    * banded+capped pair set happens to equal the exact one (the
    * dedup_minhash_capped argument extended to the band stage —
    * verified, not guaranteed: a corpus with a borderline-J pair the
    * bands miss would diverge from the oracle, which is the accepted
    * price of the linear-cost scale path). BOTH residuals are now
    * MEASURED at the operator's own settings, not just formula-
    * scoped: dedup_recall_eval grades the (32, 4) banded+capped path
    * per Jaccard band against the exact truth, and
    * [[Dedup.bandCurve]] (dedup_band_curve + its planted mid-J
    * fixture) measures the banding knob itself — at J ≈ 0.565 the
    * fixture reads recall 0.20 / 0.97 / 1.0 for (16,8) / (32,4) /
    * (64,2), the evidence behind this report's 32-band default.
    * Sources whose pruned vocabulary can't fit a
    * line still carry a NULL slope. Output (source, n_docs, n_pass,
    * pass_rate_q6, n_terms, slope_q6, dup_dups, dup_rate_q6); ratio
    * columns are pure int64 `·1e6 DIV` over the ONE per-source doc
    * count (the gate stage's — the dup stage aggregates only the
    * pair-incident LOSERS, ≪ corpus, so it adds no corpus pass). */
  def sourceQualityReport(docs: DataFrame, n: Int = 3,
      theta: Double = 0.5, minFreq: Long = 2L,
      maxBucket: Long = 16L): DataFrame = {
    // the three per-source rollups are INDEPENDENT corpus passes (the
    // dup stage's eager MinHash+cluster chain, the gate scan, the
    // Zipf vocabulary scan): materialize them concurrently (Par.all,
    // each checkpointed at ≤ #sources rows) so the report pays the
    // longest pass — the gate/Zipf scans back-fill the executor slots
    // the dup chain's many small sequential stages leave idle. Each
    // rollup is a deterministic aggregation, so the report's rows are
    // unchanged.
    val eager = Par.all[DataFrame](Seq(
      () => Dedup.dupClusters(Dedup.minhashLshPairs(docs, n,
          numHashes = 128, bands = 32, theta = theta, maxBucket = maxBucket))
        .where(!col("keep")).select(col("doc_id"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("dup_dups"))
        .localCheckpoint(true),
      () => TextStats.gopherGates(docs)
        .select(col("doc_id"), col("passes"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("passes"), 1L).otherwise(0L)).as("n_pass"))
        .select(col("source"), col("n_docs"), col("n_pass"),
          expr("n_pass * 1000000L DIV n_docs").as("pass_rate_q6"))
        .localCheckpoint(true),
      () => TextStats.zipfFit(docs, minFreq, keyCol = "source")
        .localCheckpoint(true)))
    val dup = eager(0)
    val gates = eager(1)
    val zipf = eager(2)
    // both right sides are ≤ #sources rows; checkpointed frames carry
    // no stats, so Catalyst would sort-merge them — say broadcast
    // explicitly
    gates.join(broadcast(zipf), Seq("source"), "left")
      .join(broadcast(dup), Seq("source"), "left")
      .withColumn("dup_dups", coalesce(col("dup_dups"), lit(0L)))
      .withColumn("dup_rate_q6", expr("dup_dups * 1000000L DIV n_docs"))
  }
}
