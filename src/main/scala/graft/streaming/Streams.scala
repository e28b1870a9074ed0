package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sink.Sink

/** Structured-Streaming form of the reference's two concurrent queries
  * off one source (`src/spark_consumer.py:131-211`):
  *   E2 raw append  -> sink at CL=ONE equivalent,
  *   E3 watermarked 1-hour windowed agg -> sink at CL=QUORUM equivalent.
  * Transform stages are shared with the batch pipeline — same Catalyst
  * plans either way; only the source/sink adapters differ (SURVEY §2.1 S1).
  */
object Streams {

  /** P1-P3 on the stream: the decoded sensor frame -> raw-table rows
    * (the 5-column prune of `src/spark_consumer.py:140-146`). */
  def rawProjection(decoded: DataFrame): DataFrame =
    decoded.select("device_id", "timestamp", "temperature", "humidity", "location")

  /** A1-A6 on the stream: event-time derivation, 1-minute watermark,
    * 1-hour tumbling window, avg/max/min/count, hour_bucket projection
    * (`src/spark_consumer.py:171-192`). */
  def hourlyAggregate(decoded: DataFrame, watermark: String = "1 minute"): DataFrame =
    decoded
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(col("device_id"), window(col("event_time"), "1 hour").as("hour_window"))
      .agg(
        avg(col("temperature")).as("avg_temperature"),
        max(col("temperature")).as("max_temperature"),
        min(col("temperature")).as("min_temperature"),
        count(lit(1)).as("event_count"))
      .select(
        col("device_id"),
        unix_timestamp(col("hour_window.start")).cast(LongType).as("hour_bucket"),
        col("avg_temperature").cast("float").as("avg_temperature"),
        col("max_temperature"), col("min_temperature"),
        col("event_count").cast(IntegerType).as("event_count"))

  /** E2: raw append stream, default trigger, append mode, foreachBatch
    * into the CL=ONE sink (`src/spark_consumer.py:137-160`). */
  def startRawStream(decoded: DataFrame, sink: Sink, checkpoint: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rawProjection(decoded).writeStream
      .queryName(s"raw->${sink.name}")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => sink.write(df, id))
      .start()

  /** E3: watermark-gated agg stream, 10s processing-time trigger in
    * prod / AvailableNow in tests, append mode (finalized windows
    * only), foreachBatch into the CL=QUORUM sink
    * (`src/spark_consumer.py:194-211`). */
  def startAggStream(decoded: DataFrame, sink: Sink, checkpoint: String,
                     trigger: Trigger = Trigger.AvailableNow(),
                     watermark: String = "1 minute"): StreamingQuery =
    hourlyAggregate(decoded, watermark).writeStream
      .queryName(s"agg->${sink.name}")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => sink.write(df, id))
      .start()

  /** S11: run both queries concurrently off one decoded stream and
    * block until either terminates (`spark.streams.awaitAnyTermination`,
    * `src/spark_consumer.py:232-239`). */
  def runPipeline(spark: SparkSession, decoded: DataFrame,
                  rawSink: Sink, aggSink: Sink, checkpointRoot: String): Unit = {
    val raw = startRawStream(decoded, rawSink, s"$checkpointRoot/raw")
    val agg = startAggStream(decoded, aggSink, s"$checkpointRoot/agg")
    try spark.streams.awaitAnyTermination()
    finally { raw.stop(); agg.stop() }
  }
}
