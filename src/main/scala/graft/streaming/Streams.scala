package graft.streaming

import graft.Tables
import graft.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming sources + the two reference-parity pipelines
  * (SURVEY.md §2.1 / §3.4), Spark-first:
  *
  *  - reference `AiJob` (Kafka questions → per-record RAG map → Kafka
  *    answers, `AiJob.java:16-57`) → [[AnswerPipeline]]: a streaming
  *    DataFrame of questions answered per micro-batch against a
  *    parquet-backed vector store — set-oriented retrieval instead of one
  *    network round-trip per record.
  *  - reference `StreamingStoreKnowledge` (Kafka knowledge_updates →
  *    per-record embed → per-record OpenSearch write,
  *    `StreamingStoreKnowledge.java:28-76`) → [[IngestPipeline]]:
  *    embed in the scan stage (codegen'd expression, no per-record client)
  *    and append whole partitions to the parquet store per batch.
  *
  * Delivery: Spark's Kafka sink and file sink under checkpointing are
  * at-least-once — the same guarantee the reference declares
  * (`DeliveryGuarantee.AT_LEAST_ONCE`, `AiJob.java:32`).
  */
object Streams {

  /** Kafka-shaped source (A1/A2): value-only string payloads, mirroring
    * `SimpleStringSchema` + `setValueOnlyDeserializer` (`AiJob.java:19-24`).
    * Never started in tests (zero-egress environment); the plan shape and
    * options are what parity requires.
    */
  def kafkaLines(s: SparkSession, servers: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS line")

  /** File-backed stand-in for a Kafka topic of value-only strings. */
  def fileLines(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("line",
          org.apache.spark.sql.types.StringType))))
      .parquet(dir)

  /** The events table as a file stream (same type-adaptive ts handling as
    * Tables.events — nanos-as-long fixtures get the µs rebuild, timestamp
    * fixtures pass through / NTZ-cast). The file source wants a directory,
    * and the fixture is a single file — a temp dir with one symlink bridges
    * that (created once per (session, sf)).
    */
  private val streamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def eventsStream(s: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val dir = streamDirs.computeIfAbsent(sfDir, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft_events_")
      java.nio.file.Files.createSymbolicLink(
        d.resolve("events.parquet"),
        // toAbsolutePath: a RELATIVE sfDir would otherwise become a
        // relative symlink TARGET, which resolves against the temp
        // watch dir (not the cwd) — a broken link the file source
        // silently reads as an EMPTY stream
        java.nio.file.Paths.get(s"$sfDir/events.parquet").toAbsolutePath)
      d.toString
    })
    val raw = s.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }

  /** The documents table as a file stream (same symlink bridge as
    * [[eventsStream]]; no timestamp rebuild needed).
    */
  def documentsStream(s: SparkSession, sfDir: String): DataFrame = {
    val schema = s.read.parquet(s"$sfDir/documents.parquet").schema
    val dir = streamDirs.computeIfAbsent(sfDir + "#documents", { _ =>
      val dd = java.nio.file.Files.createTempDirectory("graft_docs_")
      java.nio.file.Files.createSymbolicLink(
        dd.resolve("documents.parquet"),
        // toAbsolutePath: a RELATIVE sfDir would otherwise become a
        // relative symlink TARGET, which resolves against the temp
        // watch dir (not the cwd) — a broken link the file source
        // silently reads as an EMPTY stream
        java.nio.file.Paths.get(s"$sfDir/documents.parquet").toAbsolutePath)
      dd.toString
    })
    s.readStream.schema(schema).parquet(dir)
  }

  /** The orders table as a file stream (same symlink bridge as
    * [[eventsStream]]; `o_orderdate` is µs parquet, no rebuild needed).
    */
  def ordersStream(s: SparkSession, sfDir: String): DataFrame = {
    val schema = s.read.parquet(s"$sfDir/orders.parquet").schema
    val dir = streamDirs.computeIfAbsent(sfDir + "#orders", { _ =>
      val dd = java.nio.file.Files.createTempDirectory("graft_orders_")
      java.nio.file.Files.createSymbolicLink(
        dd.resolve("orders.parquet"),
        // toAbsolutePath: a RELATIVE sfDir would otherwise become a
        // relative symlink TARGET, which resolves against the temp
        // watch dir (not the cwd) — a broken link the file source
        // silently reads as an EMPTY stream
        java.nio.file.Paths.get(s"$sfDir/orders.parquet").toAbsolutePath)
      dd.toString
    })
    s.readStream.schema(schema).parquet(dir)
  }

  /** The embeddings table as a file stream (same symlink bridge as
    * [[eventsStream]]; list<float> column streams as-is).
    */
  def embeddingsStream(s: SparkSession, sfDir: String): DataFrame = {
    val schema = s.read.parquet(s"$sfDir/embeddings.parquet").schema
    val dir = streamDirs.computeIfAbsent(sfDir + "#embeddings", { _ =>
      val dd = java.nio.file.Files.createTempDirectory("graft_embs_")
      java.nio.file.Files.createSymbolicLink(
        dd.resolve("embeddings.parquet"),
        // toAbsolutePath: a RELATIVE sfDir would otherwise become a
        // relative symlink TARGET, which resolves against the temp
        // watch dir (not the cwd) — a broken link the file source
        // silently reads as an EMPTY stream
        java.nio.file.Paths.get(s"$sfDir/embeddings.parquet").toAbsolutePath)
      dd.toString
    })
    s.readStream.schema(schema).parquet(dir)
  }

  /** Run `body` with a reduced shuffle-partition count — stateful
    * streaming ops allocate one state store per shuffle partition, and at
    * test scale 32 near-empty stores cost more than the data. (At 100 TB
    * the inverse applies: size state partitions to the key space.)
    */
  def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def runToTableWith(df: DataFrame, mode: String,
      statePartitions: Int, trigger: Trigger): DataFrame =
    withStatePartitions(df.sparkSession, statePartitions) {
      val name = "st_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(trigger).start()
      q.awaitTermination()
      df.sparkSession.table(name)
    }

  /** Run a streaming DataFrame to completion into an in-memory table and
    * return the result as a batch DataFrame (AvailableNow trigger).
    */
  def runToTable(df: DataFrame, mode: String, statePartitions: Int = 8)
      : DataFrame =
    runToTableWith(df, mode, statePartitions, Trigger.AvailableNow())

  /** [[runToTable]] that ALSO returns the run's progress telemetry —
    * the `StateOperatorProgress` rows (state rows/bytes per stateful
    * operator) are the 100 TB operability signal for stream-stream
    * joins and windowed aggregations: unbounded state growth shows up
    * here long before an executor OOMs. The query handle's
    * `recentProgress` is harvested BEFORE the handle goes out of scope;
    * the memory-sink table is returned alongside.
    */
  def runToTableWithProgress(df: DataFrame, mode: String,
      statePartitions: Int = 8)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    withStatePartitions(df.sparkSession, statePartitions) {
      val name = "st_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (df.sparkSession.table(name), q.recentProgress.toSeq)
    }

  /** Single-batch variant of [[runToTable]] for stateful queries whose
    * operator reports processing-time work pending FOREVER — a
    * `transformWithState` in `TimeMode.ProcessingTime` with state TTL
    * keeps `shouldRunAnotherBatch` true, so `Trigger.AvailableNow` never
    * reaches its termination condition (measured: thousands of no-data
    * micro-batches). `Trigger.Once` runs exactly one batch — all
    * available source data — and stops unconditionally, which is the
    * correct run-to-completion harness for that operator family.
    */
  @annotation.nowarn("cat=deprecation")
  def runToTableOnce(df: DataFrame, mode: String, statePartitions: Int = 8)
      : DataFrame =
    runToTableWith(df, mode, statePartitions, Trigger.Once())

  // ---- vector-store layout: flat append dir, upgraded on first
  // compaction to generation directories + an atomic CURRENT pointer ----

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Directory holding the store's LIVE parquet data: the generation named
    * by the `CURRENT` pointer once the store has been compacted at least
    * once, else the flat root (ingest's plain append layout — a store that
    * was never compacted needs no pointer).
    */
  def storeDataDir(storeDir: String): String = {
    val root = java.nio.file.Paths.get(storeDir)
    val cur = root.resolve("CURRENT")
    if (java.nio.file.Files.exists(cur))
      root.resolve(new String(java.nio.file.Files.readAllBytes(cur), Utf8).trim)
        .toString
    else storeDir
  }

  /** Read the store's live generation (resolved at plan time — a reader
    * holds one consistent generation for its whole lifetime).
    */
  def storeRead(s: SparkSession, storeDir: String): DataFrame =
    // mergeSchema: a store generation is normally schema-uniform, but an
    // old pre-metadata store that took metadata-era appends before its
    // next compaction holds mixed footers — without merging, which columns
    // surface depends on WHICH file footer Spark samples, so `metadata`
    // could silently vanish (or the read fail) based on file order. Merged,
    // pre-metadata rows surface metadata=NULL and retrieveBatch restores
    // the TextSegment empty-map default.
    s.read.option("mergeSchema", "true").parquet(storeDataDir(storeDir))

  /** Regular files under `p` ending in `suffix`; empty for a non-dir.
    * (Files.list must be closed — it holds a directory handle.)
    */
  private def listFiles(p: java.nio.file.Path, suffix: String)
      : Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(p)) Seq.empty
    else scala.util.Using.resource(java.nio.file.Files.list(p)) { st =>
      st.iterator().asScala.filter(f =>
        java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(suffix)).toSeq
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val all = scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.iterator().asScala.toSeq)
      all.reverse.foreach(f =>
        try java.nio.file.Files.deleteIfExists(f) catch { case _: Exception => () })
    }
  }

  /** IngestPipeline (A2–A4): lines → deterministic embedding →
    * append-only parquet vector store, batched per micro-batch (replaces
    * the reference's one-HTTP-call-per-record sink,
    * `StreamingStoreKnowledge.java:68-71`). Appends land in the store's
    * live generation so a compacted store keeps ingesting correctly.
    */
  def ingest(lines: DataFrame, storeDir: String, dim: Int = 64,
      filesPerBatch: Int = 1): Unit = {
    // TextSegment parity ({text, metadata} — langchain4j's segment shape,
    // StreamingStoreKnowledge.java:93): a `metadata` MAP<STRING,STRING>
    // column on the input rides into the store verbatim; absent, rows
    // carry the empty map `TextSegment.from(value)` defaults to. A
    // generation that mixes pre-metadata and metadata-era files is read
    // with mergeSchema (storeRead), so the union schema always surfaces
    // and old rows resolve to the empty-map default in retrieveBatch.
    val withMeta =
      if (lines.columns.contains("metadata")) lines
      else lines.withColumn("metadata",
        map().cast("map<string,string>"))
    val q = withMeta
      .select(
        xxhash64(col("line")).as("vec_id"),
        col("line").as("text"),
        feature_hash_embed(col("line"), dim).as("embedding"),
        col("metadata").cast("map<string,string>").as("metadata"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      // one file-set per micro-batch still accumulates forever; coalesce
      // bounds files-per-batch (micro-batches are small relative to the
      // store by definition) and compactStore bounds the long-run total
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.coalesce(filesPerBatch).write.mode("append")
          .parquet(storeDataDir(storeDir))
      }
      .start()
    q.awaitTermination()
  }

  /** Rewrite the store into ~`targetFileBytes` files — the OPTIMIZE/
    * compaction step a per-micro-batch append store needs so scan cost
    * stays O(data), not O(batches). The reference's OpenSearch store
    * self-compacts (Lucene segment merges); a parquet store must do it
    * explicitly.
    *
    * Swap protocol (the local analogue of a table-format commit): the
    * compacted generation is written to a fresh `gen-N` directory, then
    * published by atomically renaming a `CURRENT.tmp` pointer file over
    * `CURRENT`. Readers resolve `CURRENT` once at plan time, so a reader
    * concurrent with compaction sees EITHER the old or the new generation,
    * never a partial mix; the immediately-previous generation is retained
    * (purged on the NEXT compaction) so already-planned readers never hit
    * FileNotFound. A crash before the pointer flip leaves the old
    * generation live; leftover half-written `gen-N` garbage is overwritten
    * by the next compaction. Returns the new file count (0 = empty store,
    * nothing to do).
    *
    * Known limit (by design, stated honestly): an ingest micro-batch that
    * resolved the OLD generation and lands its files after compaction has
    * already read its input is not carried into the new generation — the
    * lost-append race every file-level swap has. Serialize compaction
    * with ingest (both are owner-side maintenance here), or use a table
    * format with optimistic-commit transactions on a real deployment.
    */
  def compactStore(s: SparkSession, storeDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val root = java.nio.file.Paths.get(storeDir)
    val dataDir = java.nio.file.Paths.get(storeDataDir(storeDir))
    val parquets = listFiles(dataDir, ".parquet")
    if (parquets.isEmpty) return 0 // empty store: no schema to infer, no-op
    val totalBytes = parquets.map(java.nio.file.Files.size).sum
    val nFiles =
      math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val curGen = // flat root counts as generation 0
      if (dataDir == root) 0
      else dataDir.getFileName.toString.stripPrefix("gen-").toInt
    val nextDir = root.resolve(s"gen-${curGen + 1}")
    s.read.parquet(dataDir.toString).repartition(nFiles)
      .write.mode("overwrite").parquet(nextDir.toString)
    // publish: write-then-atomic-rename of the pointer file
    val tmp = root.resolve("CURRENT.tmp")
    java.nio.file.Files.write(tmp, s"gen-${curGen + 1}".getBytes(Utf8))
    java.nio.file.Files.move(tmp, root.resolve("CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // retention: keep the previous generation for in-flight readers; purge
    // everything older (generations < curGen, and — once the previous
    // generation is itself a gen dir — the original flat-root files)
    scala.util.Using.resource(java.nio.file.Files.list(root)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toSeq.foreach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("gen-") &&
            name.stripPrefix("gen-").forall(_.isDigit) &&
            name.stripPrefix("gen-").toInt < curGen)
          deleteTree(p)
      }
    }
    if (curGen >= 1)
      listFiles(root, ".parquet").foreach(java.nio.file.Files.deleteIfExists(_))
    nFiles
  }

  /** Incremental materialized-view upsert: replace the store's live table
    * with `next(current)` — `None` on the first call — under the same
    * gen-N + atomic-`CURRENT` protocol as [[compactStore]]: readers see
    * either the old or the new generation, never a mix, and the previous
    * generation is retained one cycle for already-planned readers. The
    * caller's `next` does rollup-sized work (old rollup ∪ micro-batch
    * partial, re-grouped), NOT raw-data-sized work — that asymmetry is
    * what makes a streaming materialized view affordable at 100 TB.
    */
  def upsertGeneration(s: SparkSession, storeDir: String)(
      next: Option[DataFrame] => DataFrame): Unit =
    upsertGeneration(s, storeDir, batchId = None)(next)

  /** Exactly-once variant: `batchId` (the foreachBatch epoch) is written
    * as a `_COMMIT_BATCHID` marker INSIDE the new generation dir before
    * the atomic pointer swap, so the marker becomes visible exactly when
    * the generation does. A replayed batch (crash AFTER the merge's
    * pointer swap but BEFORE the streaming checkpoint committed — the
    * window where a non-idempotent merge double-counts) finds its own id
    * already committed in the live generation and SKIPS — the batchId
    * fence that upgrades foreachBatch's at-least-once to exactly-once on
    * a plain file store, no transactional sink required. Spark's scans
    * ignore underscore-prefixed files, so the marker never pollutes
    * reads.
    */
  def upsertGeneration(s: SparkSession, storeDir: String,
      batchId: Option[Long])(
      next: Option[DataFrame] => DataFrame): Unit = {
    val root = java.nio.file.Paths.get(storeDir)
    java.nio.file.Files.createDirectories(root)
    val dataDir = java.nio.file.Paths.get(storeDataDir(storeDir))
    val committed: Option[Long] = {
      val marker = dataDir.resolve("_COMMIT_BATCHID")
      if (java.nio.file.Files.isRegularFile(marker))
        new String(java.nio.file.Files.readAllBytes(marker), Utf8)
          .trim.toLongOption
      else None
    }
    val replayed = (batchId, committed) match {
      case (Some(id), Some(c)) => c >= id
      case _                   => false
    }
    if (replayed)
      return // replayed epoch: the live generation already contains it
    val cur =
      if (listFiles(dataDir, ".parquet").nonEmpty)
        Some(s.read.parquet(dataDir.toString))
      else None
    val curGen =
      if (dataDir == root) 0
      else dataDir.getFileName.toString.stripPrefix("gen-").toInt
    val nextDir = root.resolve(s"gen-${curGen + 1}")
    next(cur).write.mode("overwrite").parquet(nextDir.toString)
    batchId.foreach(id => java.nio.file.Files.write(
      nextDir.resolve("_COMMIT_BATCHID"), id.toString.getBytes(Utf8)))
    val tmp = root.resolve("CURRENT.tmp")
    java.nio.file.Files.write(tmp, s"gen-${curGen + 1}".getBytes(Utf8))
    java.nio.file.Files.move(tmp, root.resolve("CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    scala.util.Using.resource(java.nio.file.Files.list(root)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toSeq.foreach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("gen-") &&
            name.stripPrefix("gen-").forall(_.isDigit) &&
            name.stripPrefix("gen-").toInt < curGen)
          deleteTree(p)
      }
    }
  }

  /** One micro-batch of RAG answering (A5–A11) as a reusable batch
    * transform: embed questions → cosine vs store → top-k per question →
    * context assembly → prompt render → extractive mock answer
    * (deterministic stand-in for the chat call, `RAG.java:87-98`).
    */
  def answerBatch(batch: DataFrame, storeDir: String,
      k: Int = 10, dim: Int = 64): DataFrame = {
    val scored = topMatches(batch, storeDir, k, dim, carry = Nil)
    scored
      .groupBy(col("question"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(negate(col("score")).as("ns"),
            col("text").as("t")))),
          x => x.getField("t")), "\n\n").as("context"),
        max(struct(col("score"), col("text"))).as("best"))
      .select(
        col("question"),
        col("context"),
        replace(
          replace(lit(graft.operators.Rag.PromptTemplate),
            lit("{{question}}"), col("question")),
          lit("{{information}}"), col("context")).as("prompt"),
        concat(lit("[extractive] "),
          substring_index(col("best.text"), ".", 1)).as("answer"))
  }

  /** Shared retrieval core (A7–A8): embed each batch question, cosine
    * against the store, keep the k best at minScore ≥ 0.0. `carry` names
    * extra store columns to ride along with (question, text, score).
    */
  private def topMatches(batch: DataFrame, storeDir: String, k: Int,
      dim: Int, carry: Seq[String]): DataFrame = {
    val s = batch.sparkSession
    val store = storeRead(s, storeDir)
    val qs = batch.select(col("line").as("question"),
      feature_hash_embed(col("line"), dim).as("qvec"))
    import org.apache.spark.sql.expressions.Window
    store.crossJoin(broadcast(qs))
      .select(col("question") +: col("text") +: carry.map(col) :+
        cosine_sim(col("embedding"), col("qvec")).as("score"): _*)
      .where(col("score") >= 0.0) // minScore(0.0), RAG.java:54
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("question"))
          .orderBy(col("score").desc, col("text"))))
      .where(col("rn") <= k)
  }

  /** The retriever surface itself (the reference's
    * `EmbeddingStoreContentRetriever` returns whole TextSegments — text
    * PLUS metadata — even though the answer chain consumes only text):
    * top-k matches per question as (question, text, metadata, score,
    * rank). A store written before the metadata column existed yields
    * empty maps, the `TextSegment.from` default.
    */
  def retrieveBatch(batch: DataFrame, storeDir: String,
      k: Int = 10, dim: Int = 64): DataFrame = {
    val hasMeta = storeRead(batch.sparkSession, storeDir)
      .columns.contains("metadata")
    val m = topMatches(batch, storeDir, k, dim,
      carry = if (hasMeta) Seq("metadata") else Nil)
    // pre-metadata rows in a mixed-generation store arrive as NULL under
    // the merged schema — restore the `TextSegment.from` empty-map default
    (if (hasMeta) m.withColumn("metadata",
       coalesce(col("metadata"), map().cast("map<string,string>")))
     else m.withColumn("metadata", map().cast("map<string,string>")))
      .select(col("question"), col("text"), col("metadata"),
        col("score"), col("rn").as("rank"))
  }

  private def runAnswer(questions: DataFrame, storeDir: String, k: Int,
      dim: Int, checkpointDir: Option[String])
      (sink: (DataFrame, Long) => Unit): Unit = {
    val writer = questions.writeStream.trigger(Trigger.AvailableNow())
    val q = checkpointDir
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(answerBatch(batch, storeDir, k, dim), batchId)
      }
      .start()
    q.awaitTermination()
  }

  /** AnswerPipeline (A5–A12), parquet sink: per micro-batch, answer every
    * question in the batch against the parquet vector store with ONE
    * set-oriented plan; results append to `outDir` as parquet.
    */
  def answer(questions: DataFrame, storeDir: String, outDir: String,
      k: Int = 10, dim: Int = 64): Unit =
    runAnswer(questions, storeDir, k, dim, None) { (answers, _) =>
      answers.write.mode("append").parquet(outDir)
    }

  /** AnswerPipeline with an EFFECTIVELY-EXACTLY-ONCE parquet answers
    * sink — the documented upgrade over the reference's AT_LEAST_ONCE
    * answer delivery (`AiJob.java:25-33`: checkpointed offsets + a
    * non-transactional producer re-SEND a crash-replayed epoch;
    * RagParitySpec pins the same append-again behavior for [[answer]]).
    * foreachBatch replays whole EPOCHS, and the epoch id is stable
    * across a replay, so an idempotent batchId-keyed overwrite (the
    * `stream_route_split` pattern) makes the replay converge instead of
    * duplicating: each epoch writes to `outDir/epoch=<batchId>` with
    * overwrite — a crash between the write and the checkpoint commit
    * re-runs the SAME epoch into the SAME directory. Readers see one
    * logical table at `outDir` (hive-style partition discovery; the
    * `epoch` column rides along as lineage).
    */
  def answerExactlyOnce(questions: DataFrame, storeDir: String,
      outDir: String, checkpointDir: String, k: Int = 10, dim: Int = 64)
      : Unit =
    runAnswer(questions, storeDir, k, dim, Some(checkpointDir)) {
      (answers, batchId) =>
        answers.write.mode("overwrite").parquet(s"$outDir/epoch=$batchId")
    }

  /** AnswerPipeline with the reference's Kafka answers sink (A12):
    * answers are produced to `topic` at-least-once — checkpointed source
    * offsets + a non-transactional producer give exactly the
    * `DeliveryGuarantee.AT_LEAST_ONCE` contract of `AiJob.java:25-33,53-55`
    * (a batch retried after a crash between produce and checkpoint
    * re-sends, never drops). Value-only string payloads mirror
    * `SimpleStringSchema`.
    */
  def answerToKafka(questions: DataFrame, storeDir: String, servers: String,
      topic: String, checkpointDir: String, k: Int = 10, dim: Int = 64)
      : Unit =
    runAnswer(questions, storeDir, k, dim, Some(checkpointDir)) {
      (answers, _) =>
      answers.select(col("answer").cast("string").as("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .save()
    }

  /** Generic streaming Kafka sink (A12 surface): any streaming DataFrame
    * with a string-castable `valueCol` → `topic`, at-least-once under
    * `checkpointDir` — the direct `writeStream.format("kafka")` counterpart
    * of [[kafkaLines]]. Never started in tests (zero-egress environment);
    * StreamingSpec proves the real kafka sink is requested by its
    * connector-lookup error.
    */
  def kafkaSink(df: DataFrame, servers: String, topic: String,
      checkpointDir: String, valueCol: String = "answer")
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.select(col(valueCol).cast("string").as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()
}
