package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The library facade: the engine's composite operators as frame-
  * parametric functions over the CALLER's DataFrames — the surface a user
  * switching from the reference actually programs against (the
  * `SparkEntry.queries` map is the driver-contract view of the same
  * operators, bound to the test fixtures).
  *
  * Column contracts are positional-by-name and minimal:
  *   docs  — (doc_id LONG, text STRING)
  *   store — (id LONG, embedding ARRAY<FLOAT>)
  * Everything returns a DataFrame and nothing collects to the driver.
  * Laziness caveat: the MinHash pipeline ([[minhashNearDupPairs]],
  * [[dedupClusters]], [[nearDupKeepList]], and [[mmrRerank]]'s greedy)
  * materializes bounded intermediates eagerly (persist/localCheckpoint
  * of candidate/label frames — required so iterative stages don't replay
  * the full sketch per round). Long-lived sessions issuing many such
  * calls should release blocks between calls:
  * `spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))`.
  */
object Graft {

  /** Register the engine's SQL-callable kernels (cosine_sim, vector_dot,
    * l2_distance, vector_norm, quantize_i8, cosine_sim_i8, zorder_key)
    * on `spark` — after this, plain `spark.sql` can use them by name.
    * Alternative: set `spark.sql.extensions=graft.plans.GraftExtensions`
    * at session build time.
    */
  def register(spark: SparkSession): Unit = graft.functions.registerAll(spark)

  /** Exact cosine top-k of `store` (id, embedding) for every row of
    * `probes` (probe_id, probe): the probes side is broadcast (O(probes)
    * small by contract); the store streams through one scan, ranked per
    * probe. 100 TB shape: no shuffle of the store, one window over the
    * probe key after scan-side scoring.
    */
  def cosineTopK(store: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = store.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("id"),
        graft.functions.cosine_sim(col("embedding"), col("probe")).as("score"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("rank")
  }

  /** All store vectors within `minScore` cosine of each probe — the
    * range-query twin of [[cosineTopK]] (dedup thresholds, retrieval
    * floors). Same broadcast/no-store-shuffle shape.
    */
  def cosineRange(store: DataFrame, probes: DataFrame,
      minScore: Double): DataFrame =
    store.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("id"),
        graft.functions.cosine_sim(col("embedding"), col("probe")).as("score"))
      .where(col("score") >= minScore)

  /** MinHash(32) + LSH(8×4) near-duplicate pairs of `docs` (doc_id,
    * text), exact-Jaccard verified at `threshold`. Candidates come from
    * band-hash equi-buckets only — never a cross product; only candidate
    * docs pay the exact-shingle verification.
    */
  def minhashNearDupPairs(docs: DataFrame, threshold: Double): DataFrame =
    graft.operators.Dedup.minhashVerifiedPairsOf(docs, threshold)

  /** Connected components over an undirected (doc_a, doc_b) pair list:
    * (doc_id, cluster_id) with cluster_id = min reachable doc_id.
    * Join-based iterative min-label propagation, rounds = graph diameter.
    * The label frame is broadcast only while the graph has ≤20M nodes;
    * larger graphs fall back to shuffle joins (AQE-chosen), so arbitrary
    * caller pair lists cannot blow the broadcast/driver ceiling.
    */
  def dedupClusters(pairs: DataFrame): DataFrame =
    graft.operators.Dedup.collapseClusters(pairs)

  /** SimHash near-duplicate pairs of `docs` (doc_id, text): 64-bit
    * sketch, 4×16-bit bands, Hamming ≤ `maxHamming` verification within
    * hash-equal buckets; buckets over 1000 members are dropped as
    * boilerplate (the same hot-bucket cap as [[minhashNearDupPairs]]).
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame =
    graft.operators.Dedup.simhashPairsOf(docs, maxHamming)

  /** End-to-end near-dup keep/drop list: [[minhashNearDupPairs]] →
    * [[dedupClusters]] → keep = "is the cluster representative".
    * Docs in no cluster are implicitly kept (absent from the output).
    */
  def nearDupKeepList(docs: DataFrame, threshold: Double): DataFrame =
    dedupClusters(minhashNearDupPairs(docs, threshold)
        .select("doc_a", "doc_b"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"))

  /** SCD2 validity intervals [valid_from, valid_to) + is_current from
    * (o_custkey, o_orderkey, o_orderdate)-shaped snapshots — one shuffle
    * on the entity key.
    */
  def scd2Intervals(base: DataFrame): DataFrame =
    graft.operators.Corpus.scd2Intervals(base)

  /** Greedy contiguous token-budget shards per `byCol` group (running
    * sums stay partitioned — no global-order window): adds (tokens,
    * shard) to `docs`.
    */
  def packTokenShards(docs: DataFrame, budget: Int,
      byCol: String = "source"): DataFrame = {
    val w = Window.partitionBy(byCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("shard", expr(s"(cum - tokens) div $budget"))
      .drop("cum")
  }

  /** Deterministic content-hash Bernoulli filter: keep rows whose
    * md5-hex bucket of `key` falls in [0, keepBuckets) of 16 — the same
    * rows on every run, every engine (md5 is the one cross-engine hash).
    */
  def hashSample(df: DataFrame, key: Column, keepBuckets: Int): DataFrame =
    df.where(conv(substring(md5(key.cast("string")), 1, 1), 16, 10)
      .cast("int") < keepBuckets)

  /** Benchmark decontamination: per `corpus` doc (doc_id, text), the
    * fraction of its word n-grams appearing in ANY `eval` doc's grams,
    * plus a `contaminated` flag at `flagAt`. Eval grams broadcast (eval
    * sets are small by nature); the corpus never shuffles on gram.
    */
  def contaminationReport(corpus: DataFrame, eval: DataFrame,
      n: Int = 3, flagAt: Double = 0.05): DataFrame =
    graft.operators.Corpus.contaminationOf(corpus, eval, n, flagAt)

  /** Gopher-style quality-rule filter over (doc_id, text): per-rule
    * booleans + the `keep` conjunction — audit WHICH rule dropped a doc.
    * One codegen'd scan-side projection, zero shuffle.
    */
  def qualityRules(docs: DataFrame): DataFrame =
    graft.operators.Corpus.qualityRulesOf(docs)

  /** Downsample every `groupCol` group of `df` to the smallest group's
    * row count with a deterministic md5 coin on `idCol` (stable across
    * runs and engines); the group's (docs, rate) ride along. Row-local
    * keep decision — `df` itself never shuffles.
    */
  def rebalanceMix(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    graft.operators.Corpus.rebalanceBy(df, groupCol, idCol)

  /** MERGE INTO / upsert without a table format: same-schema `target`
    * and `source`; matched `key` rows take the source's values, unmatched
    * source keys insert, untouched target rows carry — plus an `action`
    * audit column. One co-partitioned full-outer shuffle join on the key.
    * NULL-key source rows never equality-match, so they are emitted
    * value-intact as `insert` (SQL MERGE WHEN-NOT-MATCHED semantics).
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame =
    graft.operators.Pipeline.mergeUpsertOf(target, source, key)

  /** Gaps-and-islands: maximal runs of consecutive `ordCol` integers per
    * `partCol` → (partCol, grp, start, end, n).
    */
  def gapsIslands(df: DataFrame, partCol: String, ordCol: String): DataFrame =
    graft.operators.Windows.gapsIslandsOf(df, partCol, ordCol)

  /** MMR diversity re-rank: greedy λ-tradeoff selection of `k` from the
    * exact cosine top-`pool` of `store` (id, embedding) for the one-row
    * `probes` frame (probe). The pool is bounded by construction, so the
    * sequential greedy runs in ONE task — no driver collect.
    */
  def mmrRerank(store: DataFrame, probes: DataFrame, k: Int,
      pool: Int = 20, lambda: Double = 0.7): DataFrame = {
    val cand = store.crossJoin(broadcast(probes))
      .select(col("id").as("vec_id"), col("embedding"),
        graft.functions.cosine_sim(col("embedding"), col("probe")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(pool)
    graft.operators.Rag.mmrSelect(cand, k, lambda)
  }
}
