package graft

import org.apache.spark.sql.types._

/** FIXTURES.md-as-code gate: pins the driver-generated parquet dtypes so a
  * fixture regeneration that changes a type fails HERE, loudly, with the
  * table/column/expected/found in one line — instead of surfacing as dozens
  * of opaque analysis errors downstream (the round-10 `events.ts`
  * TIMESTAMP(NANOS)→timestamp[us] regeneration killed 57 queries that way).
  */
class FixtureSchemaSpec extends SparkSuite {

  test("every fixture table passes the Tables contract at every sf") {
    // schema inference is a footer read — checking all three scale dirs
    // costs ~nothing and catches a partial regeneration (one sf updated,
    // the others stale)
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sfn =>
      val dir = s"/root/testdata/$sfn"
      Tables.names.foreach { t =>
        // table() itself asserts the contract on first read and throws a
        // one-line IllegalStateException on drift.
        val df = Tables.table(spark, dir, t)
        assert(df.schema.fields.nonEmpty, s"$sfn/$t read an empty schema")
      }
    }
  }

  test("events.ts arrives as a supported encoding and normalizes to TIMESTAMP") {
    val raw = Tables.table(spark, sf, "events").schema("ts").dataType
    assert(
      raw == TimestampType || raw == TimestampNTZType || raw == LongType,
      s"events.ts scanned as ${raw.simpleString} — reader has no branch for this")
    // Whatever the fixture era, the normalized reader must always hand
    // downstream queries a session-TZ TIMESTAMP named ts.
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
    // and the streaming twin must agree (it shares the branch logic)
    assert(graft.streaming.Streams.eventsStream(spark, sf)
      .schema("ts").dataType == TimestampType)
  }

  test("contract violation names table, column, expected and found types") {
    val bad = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", IntegerType),      // drifted: STRING -> INT
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val ex = intercept[IllegalStateException] {
      // package-private test hook — same code path table() runs on first read
      Tables.assertContractForTest("documents", bad, "<synthetic>/documents.parquet")
    }
    assert(ex.getMessage.contains("documents.parquet"))
    assert(ex.getMessage.contains("'text'"))
    assert(ex.getMessage.contains("int"))
    assert(ex.getMessage.contains("string"))
  }

  test("missing column is reported by name") {
    val bad = StructType(Seq(StructField("r_regionkey", IntegerType)))
    val ex = intercept[IllegalStateException] {
      Tables.assertContractForTest("region", bad, "<synthetic>/region.parquet")
    }
    assert(ex.getMessage.contains("'r_name'"))
    assert(ex.getMessage.contains("missing"))
  }

  test("nanos footer sweep descends into nested group types") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.Type.Repetition
    def ts(name: String, unit: LogicalTypeAnnotation.TimeUnit): PrimitiveType =
      Types.primitive(PrimitiveTypeName.INT64, Repetition.OPTIONAL)
        .as(LogicalTypeAnnotation.timestampType(true, unit))
        .named(name)
    val msg = Types.buildMessage()
      .addField(ts("top_us", LogicalTypeAnnotation.TimeUnit.MICROS))
      .addField(ts("top_ns", LogicalTypeAnnotation.TimeUnit.NANOS))
      .addField(Types.optionalGroup()
        .addField(ts("inner_us", LogicalTypeAnnotation.TimeUnit.MICROS))
        .addField(Types.optionalGroup()
          .addField(ts("deep_ns", LogicalTypeAnnotation.TimeUnit.NANOS))
          .named("lvl2"))
        .named("meta"))
      .named("root")
    import scala.jdk.CollectionConverters._
    val hits = msg.getFields.asScala.toSeq
      .flatMap(f => Tables.nanosFields(f, ""))
    // the nested hit surfaces with its full dotted path; µs fields don't
    assert(hits == Seq("top_ns", "meta.lvl2.deep_ns"), hits.toString)
  }
}
