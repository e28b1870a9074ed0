package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.AvroCodec
import graft.contract.Schemas
import graft.sink.Sink

/** Production connector adapters. `format(...)` resolves by name at
  * RUNTIME, so these compile against the offline classpath and light up
  * when the spark-sql-kafka / spark-cassandra-connector jars are on the
  * cluster. The offline test implementations (file stream, MemoryStream,
  * PartitionedParquetSink) exercise the identical downstream Catalyst
  * plans — only the source/sink leaf differs (SURVEY §2.1 S1/S6).
  */
object Connectors {

  /** S1: the reference's Kafka source (`src/spark_consumer.py:89-95`) +
    * S3/S4 fused decode: subscribe, earliest offsets, tolerate data
    * loss, decode the Confluent-wire value column, flatten, derive
    * event time — returns the same decoded frame the test sources
    * yield. */
  def kafkaSensorStream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String = "sensor-events"): DataFrame =
    decodeSensorFrame(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
        .load())

  /** The consumer's projection chain (`src/spark_consumer.py:104-126`)
    * on any frame with a binary `value` column. */
  def decodeSensorFrame(raw: DataFrame): DataFrame =
    raw
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
      .select(col("data.*"))
      .withColumn("event_time", timestamp_millis(col("timestamp")))

  /** S6: Cassandra batch sink at a per-table consistency level
    * (`src/spark_consumer.py:147-153,197-203`; CL matrix
    * `docs/baseline-architecture.md:248-255`). */
  final class CassandraTableSink(
      keyspace: String,
      table: String,
      override val consistencyLevel: String)
      extends Sink {
    override def name: String = s"$keyspace.$table@$consistencyLevel"
    override def write(batch: DataFrame, batchId: Long): Unit =
      if (!batch.isEmpty) {
        batch.write
          .format("org.apache.spark.sql.cassandra")
          .mode("append")
          .option("keyspace", keyspace)
          .option("table", table)
          .option("spark.cassandra.output.consistency.level", consistencyLevel)
          .save()
      }
  }
}
