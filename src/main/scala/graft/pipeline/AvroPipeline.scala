package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.avro.AvroCodec
import graft.contract.Schemas
import graft.ingest.Generator

/** The full ingest chain of the reference (E1 -> E2 head): seeded
  * generator -> Avro encode with Confluent 5-byte header (producer
  * side, `src/producer.py:74-82`) -> FromAvro decode expression ->
  * struct flatten -> event-time derivation
  * (`src/spark_consumer.py:104-126`). The Kafka hop is elided offline —
  * the bytes column IS the `value` column a Kafka source yields, so the
  * downstream plan is identical.
  */
object AvroPipeline {

  case class SensorEventRow(
      device_id: String, device_name: String, timestamp: Long,
      temperature: Float, humidity: Float, location: String)

  val SchemaId = 1

  /** Encode generated events into Confluent-wire Avro binary — the
    * producer stand-in. Partition-wise; one parsed schema per
    * partition. */
  def encodedEvents(spark: SparkSession, numDevices: Int = 50, seconds: Int = 20): DataFrame = {
    import spark.implicits._
    val json = Schemas.SensorEventAvro
    val encoded: Dataset[Array[Byte]] =
      Generator.sensorEvents(spark, numDevices, seconds).as[SensorEventRow]
        .mapPartitions { rows =>
          val schema = Schemas.parse(json)
          val enc = AvroCodec.encodeConfluent(schema, SchemaId) _
          rows.map { r =>
            enc(Map(
              "device_id" -> r.device_id,
              "device_name" -> r.device_name,
              "timestamp" -> java.lang.Long.valueOf(r.timestamp),
              "temperature" -> java.lang.Float.valueOf(r.temperature),
              "humidity" -> java.lang.Float.valueOf(r.humidity),
              "location" -> r.location))
          }
        }
    encoded.toDF("value")
  }

  /** Decode + flatten + event-time: the consumer's first stages. */
  def decode(binary: DataFrame): DataFrame =
    binary
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
      .select(col("data.*"))
      .withColumn("event_time",
        to_timestamp(from_unixtime((col("timestamp") / 1000).cast(LongType))))

  /** Full round trip, deterministic (seeded generator). */
  def roundTrip(spark: SparkSession, numDevices: Int = 50, seconds: Int = 20): DataFrame =
    decode(encodedEvents(spark, numDevices, seconds))
      .orderBy("device_id", "timestamp")
}
