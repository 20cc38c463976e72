package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary scratch main for diagnosing AQE skew-join behavior. Deleted
// before round end.
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive",
      org.apache.logging.log4j.Level.DEBUG)
    val d = "/root/testdata/sf0.01"
    val l = Tables.lineitem(spark, d).select(
      when(col("l_orderkey") % 4 === 0, lit(1L))
        .otherwise(col("l_orderkey")).as("k"),
      col("l_quantity")).repartition(32)
    val o = Tables.orders(spark, d).hint("merge")
    // variant 1: bare join, count
    val j = l.join(o, col("k") === col("o_orderkey"))
      .select(col("k"), col("l_quantity"), col("o_orderpriority"))
    j.collect()
    println("=== bare join ===")
    println(j.queryExecution.executedPlan.toString.linesIterator
      .filter(ln => ln.contains("SortMergeJoin") || ln.contains("AQEShuffleRead")
        || ln.contains("skew")).mkString("\n"))
    // variant 2: join + agg on different key
    val a = l.join(o, col("k") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    a.collect()
    println("=== join+agg ===")
    println(a.queryExecution.executedPlan.toString.linesIterator
      .filter(ln => ln.contains("SortMergeJoin") || ln.contains("AQEShuffleRead")
        || ln.contains("skew")).mkString("\n"))
    spark.stop()
  }
}
