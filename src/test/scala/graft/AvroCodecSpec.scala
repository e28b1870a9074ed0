package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.avro.AvroCodec
import graft.contract.Schemas

/** FromAvro expression: Confluent round trip incl. the 5-byte header
  * and nullable unions (SURVEY.md §5 item 2; reference wire format at
  * `src/producer.py:74-77`). */
class AvroCodecSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = Schemas.parse(Schemas.SensorEventAvro)

  private def encode(deviceId: String, name: String, ts: Long, t: Float, h: Float,
                     loc: String): Array[Byte] =
    AvroCodec.encodeConfluent(schema, 7)(Map(
      "device_id" -> deviceId, "device_name" -> name,
      "timestamp" -> java.lang.Long.valueOf(ts),
      "temperature" -> java.lang.Float.valueOf(t),
      "humidity" -> java.lang.Float.valueOf(h),
      "location" -> loc))

  test("confluent round trip preserves all fields") {
    val bytes = encode("dev-1", "Sensor-001", 1704067200123L, 21.5f, 55.25f, "Rome")
    assert(bytes(0) == 0x00.toByte)
    assert(java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt == 7)

    val df = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
      .select("data.*")
    val r = df.collect().head
    assert(r.getString(0) == "dev-1")
    assert(r.getString(1) == "Sensor-001")
    assert(r.getLong(2) == 1704067200123L)
    assert(r.getFloat(3) == 21.5f)
    assert(r.getFloat(4) == 55.25f)
    assert(r.getString(5) == "Rome")
  }

  test("nullable union fields survive as nulls") {
    val bytes = AvroCodec.encodeConfluent(schema, 7)(Map(
      "device_id" -> "dev-2", "device_name" -> null,
      "timestamp" -> java.lang.Long.valueOf(1L),
      "temperature" -> java.lang.Float.valueOf(0f),
      "humidity" -> java.lang.Float.valueOf(0f),
      "location" -> null))
    val r = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
      .select("data.*").collect().head
    assert(r.isNullAt(1) && r.isNullAt(5))
    assert(r.getString(0) == "dev-2")
  }

  test("schema-derived struct matches the contract") {
    assert(Schemas.SensorEventStruct.fieldNames.toSeq ==
      Seq("device_id", "device_name", "timestamp", "temperature", "humidity", "location"))
    assert(Schemas.SensorEventStruct("device_name").nullable)
    assert(!Schemas.SensorEventStruct("device_id").nullable)
  }

  test("large payloads are not truncated (unlike the reference's substr(6, 100000))") {
    val big = "x" * 200000
    val bytes = encode("dev-3", big, 2L, 1f, 2f, "Rome")
    val r = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
      .select("data.*").collect().head
    assert(r.getString(1).length == 200000)
  }

  test("permissive decode nulls corrupt records instead of failing the task") {
    val good = encode("dev-ok", "n", 1L, 1f, 2f, "Rome")
    val corruptBody = good.take(7) // truncated Avro body
    val badMagic = Array[Byte](9, 9, 9, 9, 9, 9)
    val df = Seq(good, corruptBody, badMagic).toDF("value")
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro,
        confluentWire = true, permissive = true).as("data"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 2)
    assert(rows.count(r => !r.isNullAt(0)) == 1)
    // FAILFAST surfaces the error
    intercept[Exception] {
      Seq(badMagic).toDF("value")
        .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
        .collect()
    }
  }

  test("generator->encode->decode pipeline is lossless") {
    val spark2 = spark
    val decoded = graft.pipeline.AvroPipeline.roundTrip(spark2, numDevices = 5, seconds = 3)
    val original = graft.ingest.Generator.sensorEvents(spark2, 5, 3)
      .orderBy("device_id", "timestamp")
    val d = decoded.select("device_id", "timestamp", "temperature", "humidity", "location").collect()
    val o = original.select("device_id", "timestamp", "temperature", "humidity", "location").collect()
    assert(d.toSeq == o.toSeq)
    assert(d.length == 15)
  }
}
