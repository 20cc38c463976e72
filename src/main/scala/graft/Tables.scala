package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked readers for the driver-generated parquet tables
  * (`/root/testdata/sf*`; see FIXTURES.md).
  *
  * All query entry points take `(SparkSession, sfDir)` per the driver
  * contract, so readers are plain functions of those two. Parquet scans are
  * columnar + vectorized; filters/projections applied downstream are pushed
  * into the scan by Catalyst (verified in PlanSpec).
  *
  * Scale note: each table is a single parquet file at test scale, but the
  * same reader works unchanged on a directory of thousands of files at
  * 100 TB — `spark.read.parquet` lists and splits by
  * `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf) and rebuild
    * a proper TIMESTAMP with integer µs division — lossless here (generator
    * emits µs-aligned values) and exact by construction (`div`, never
    * double division: ns-epoch ≈ 1.7e18 > 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
