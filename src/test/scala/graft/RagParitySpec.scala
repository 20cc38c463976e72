package graft

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Layer-A golden test (FIXTURES.md §2): the reference README's freshness
  * scenario — ingest a fact, ask the matching question, expect the fact
  * in the answer (`README.md:241-267`) — through the full ingest + answer
  * pipelines on memory streams.
  */
class RagParitySpec extends SparkSuite {

  test("ingest then answer returns the ingested fact (README freshness scenario)") {
    import spark.implicits._
    implicit val sq: SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_parity_").toString
    val store = s"$tmp/store"; val out = s"$tmp/answers"

    val knowledge = MemoryStream[String]
    knowledge.addData(
      "The capital of France is Paris.",
      "Spark plans queries with the Catalyst optimizer.",
      "Flink processes unbounded streams with low latency.")
    streaming.Streams.ingest(knowledge.toDF().toDF("line"), store)

    val stored = spark.read.parquet(store)
    assert(stored.count() == 3)
    assert(stored.columns.toSet == Set("vec_id", "text", "embedding"))

    val questions = MemoryStream[String]
    questions.addData("What is the capital of France?")
    streaming.Streams.answer(questions.toDF().toDF("line"), store, out, k = 2)

    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 1)
    val r = rows.head
    val answer = r.getAs[String]("answer")
    assert(answer.contains("Paris"), s"answer was: $answer")
    val prompt = r.getAs[String]("prompt")
    assert(prompt.contains("What is the capital of France?"))
    assert(!prompt.contains("{{question}}") && !prompt.contains("{{information}}"))
    // determinism: running the same question again appends an identical row
    val questions2 = MemoryStream[String]
    questions2.addData("What is the capital of France?")
    streaming.Streams.answer(questions2.toDF().toDF("line"), store, out, k = 2)
    val again = spark.read.parquet(out).collect()
    assert(again.length == 2 && again.map(_.toString).distinct.length == 1)
  }

  test("compactStore shrinks the file count without changing answers") {
    import spark.implicits._
    implicit val sq: SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_t_").toString
    val store = s"$tmp/store"

    // three ingest runs = three appended file generations
    Seq("The capital of France is Paris.",
        "Spark plans queries with the Catalyst optimizer.",
        "Flink processes unbounded streams with low latency.").foreach { fact =>
      val ms = MemoryStream[String]
      ms.addData(fact)
      streaming.Streams.ingest(ms.toDF().toDF("line"), store)
    }
    def parquetCount = new java.io.File(store).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val filesBefore = parquetCount
    assert(filesBefore >= 3, s"expected >=3 file generations, got $filesBefore")
    val rowsBefore = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq

    val n = streaming.Streams.compactStore(spark, store)
    assert(n == 1 && parquetCount == 1,
      s"expected 1 compacted file, got n=$n files=$parquetCount")
    val rowsAfter = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq
    assert(rowsAfter == rowsBefore)

    // retrieval against the compacted store is unchanged
    val questions = MemoryStream[String]
    questions.addData("What is the capital of France?")
    val outDir = s"$tmp/answers"
    streaming.Streams.answer(questions.toDF().toDF("line"), store, outDir, k = 2)
    val answer = spark.read.parquet(outDir).collect().head.getAs[String]("answer")
    assert(answer.contains("Paris"), s"answer was: $answer")
  }
}
