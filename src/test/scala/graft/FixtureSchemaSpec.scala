package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Fixture-drift guard (round-9 verdict task 2).
  *
  * The driver regenerated /root/testdata between rounds 8 and 9 and
  * changed events.parquet's `ts` from parquet TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS)/NTZ; the old loader hard-assumed NANOS and 41
  * queries + 30 specs dropped off the board. This spec makes that
  * failure class a red test instead of a zeroed round: it writes the
  * SAME synthetic events in BOTH encodings, proves `Tables.events`
  * loads them to the identical schema AND identical values, and pins
  * the loaded schema of every fixture loader against the live
  * testdata so any future regeneration that shifts a dtype fails
  * here first.
  */
class FixtureSchemaSpec extends SparkTestBase {

  // one logical dataset, microsecond instants (UTC wall-clock)
  private val rows = Seq(
    (1L, 1700000000000001L, 10L, "view", 1.25, """{"k":1}"""),
    (2L, 1700000000500000L, 11L, "click", 2.50, """{"k":2}"""),
    (3L, 1700000001000000L, 10L, "view", 3.75, """{"k":3}""")
  )

  /** events dir in the CURRENT driver encoding: TIMESTAMP(MICROS),
    * isAdjustedToUTC=false (what Spark writes for TIMESTAMP_NTZ). */
  private def writeMicros(dir: String): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** events file in the OLD driver encoding: INT64 TIMESTAMP(NANOS),
    * written via parquet-java directly (Spark cannot write NANOS). */
  private def writeNanos(dir: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val f = new SimpleGroupFactory(schema)
    new java.io.File(dir).mkdirs()
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema).build()
    try rows.foreach { case (id, us, uid, et, v, p) =>
      val g = f.newGroup()
      g.add("event_id", id); g.add("ts", us * 1000L); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", p)
      writer.write(g)
    } finally writer.close()
  }

  private val expectedEventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def normalized(dir: String) =
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  test("Tables.events loads micros-NTZ fixtures (current driver encoding)") {
    val dir = tmpDir("fx-micros")
    writeMicros(dir)
    val df = normalized(dir)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      expectedEventsSchema.map(f => (f.name, f.dataType)))
    assert(df.count() == 3)
  }

  test("Tables.events loads nanos fixtures (pre-round-9 driver encoding)") {
    val dir = tmpDir("fx-nanos")
    writeNanos(dir)
    val df = normalized(dir)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      expectedEventsSchema.map(f => (f.name, f.dataType)))
    assert(df.count() == 3)
  }

  test("both encodings load to identical values, not just identical schemas") {
    val (d1, d2) = (tmpDir("fx-m2"), tmpDir("fx-n2"))
    writeMicros(d1); writeNanos(d2)
    val a = normalized(d1).orderBy("event_id").collect().toSeq
    val b = normalized(d2).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("nanosAsLong pre-set session-wide does not change a MICROS read (the loader's standing invariant)") {
    // Tables.events leaves spark.sql.legacy.parquet.nanosAsLong SET
    // for the rest of the session after it meets one NANOS footer
    // (round-9 verdict finding 3). That is safe ONLY IF the flag is a
    // no-op for every other encoding the loaders meet — this test pins
    // that invariant explicitly in BOTH orders: with the flag forced
    // on up front, a MICROS fixture must load with the identical
    // schema and values it loads with the flag off.
    val dir = tmpDir("fx-flagged")
    writeMicros(dir)
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val flagged = normalized(dir)
      assert(flagged.schema.map(f => (f.name, f.dataType)) ==
        expectedEventsSchema.map(f => (f.name, f.dataType)),
        "a MICROS fixture must ignore the legacy NANOS flag")
      val a = flagged.orderBy("event_id").collect().toSeq
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      val b = normalized(dir).orderBy("event_id").collect().toSeq
      assert(a == b, "flag on/off must load identical values from MICROS")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    }
  }

  test("live testdata: every Tables loader pins its schema (drift tripwire)") {
    // dtype map per fixture table as of the 2026-08-13 regeneration;
    // a driver regeneration that shifts any dtype fails HERE with a
    // readable diff instead of erring 41 queries at harness.
    def types(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
      df.schema.map(f => f.name -> f.dataType).toMap
    assert(types(Tables.events(spark, sf)) == expectedEventsSchema.map(f => f.name -> f.dataType).toMap)
    val li = types(Tables.lineitem(spark, sf))
    assert(li("l_quantity") == DoubleType)
    assert(li("l_extendedprice") == DoubleType)
    assert(li("l_shipdate") == TimestampNTZType)
    assert(types(Tables.documents(spark, sf)) ==
      Map("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
          "source" -> StringType, "n_chars" -> LongType))
    val emb = types(Tables.embeddings(spark, sf))
    assert(emb("vec_id") == LongType)
    assert(emb("label") == IntegerType)
    assert(emb("embedding").isInstanceOf[ArrayType] &&
      emb("embedding").asInstanceOf[ArrayType].elementType == FloatType)
  }
}
