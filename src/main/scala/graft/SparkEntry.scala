package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory is assembled from the per-family operator
  * modules under `graft.operators`; each [[Q]] pairs the Spark program with
  * its DuckDB oracle SQL (when SQL-expressible).
  */
object SparkEntry {

  /** All declared queries, in SURVEY.md §2.2 order. */
  def all: Seq[Q] =
    operators.Relational.defs ++
    operators.Joins.defs ++
    operators.Aggregations.defs ++
    operators.Windows.defs ++
    operators.SetSort.defs ++
    operators.Extended.defs ++
    operators.ScaleOps.defs ++
    operators.Tpch.defs ++
    operators.Stats.defs ++
    operators.Functions.defs ++
    operators.Text.defs ++
    operators.Retrieval.defs ++
    operators.Sampling.defs ++
    operators.Pipeline.defs ++
    operators.Analytics.defs ++
    operators.Corpus.defs ++
    operators.Dedup.defs ++
    operators.Ann.defs ++
    operators.Multimodal.defs ++
    operators.Streaming.defs ++
    operators.Rag.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Rag.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
