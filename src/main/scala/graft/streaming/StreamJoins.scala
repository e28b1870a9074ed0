package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation and exactly-once-style ingest dedup —
  * capabilities around the reference's dual-stream consumer that its
  * native runtime cannot express (it runs two INDEPENDENT queries off
  * one source; correlating them happens manually in Cassandra reads).
  *
  * Both operators are watermark-bounded: Spark buffers only rows whose
  * event time can still match/duplicate, so state is O(rate x horizon),
  * not O(stream).
  */
object StreamJoins {

  /** Alert event frame: device + alert time (ms) + severity level. */
  case class Alert(device_id: String, alert_ms: Long, level: String)

  /** Watermarked stream-stream INNER join: each sensor reading joined
    * to alerts for the same device within +/- 10 minutes of event time.
    * The time-range predicate is what lets Spark expire join state —
    * an unconstrained stream-stream join would buffer forever. */
  def readingsWithAlerts(readings: DataFrame, alerts: DataFrame,
                         watermark: String = "1 minute"): DataFrame = {
    val r = readings
      .select(col("device_id"), col("temperature"),
        timestamp_millis(col("timestamp")).as("r_time"))
      .withWatermark("r_time", watermark)
    val a = alerts
      .select(col("device_id").as("alert_device"), col("level"),
        timestamp_millis(col("alert_ms")).as("a_time"))
      .withWatermark("a_time", watermark)
    r.join(a,
      col("device_id") === col("alert_device") &&
      col("a_time") >= col("r_time") - expr("INTERVAL 10 MINUTES") &&
      col("a_time") <= col("r_time") + expr("INTERVAL 10 MINUTES"))
      .select(col("device_id"), col("r_time"), col("temperature"),
        col("a_time"), col("level"))
  }

  /** The stream-stream join's semantics surfaced as a deterministic
    * batch result (registered as `q_stream_join` under a literal
    * oracle): a fixed reading/alert sequence where exactly one reading
    * falls inside an alert's +/-10min window. Same single-run +
    * few-state-partitions posture as WatermarkDemo. */
  def joinDemo(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try joinDemoImpl(spark)
    finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  /** Demo body with the state-partition setting assumed already pinned
    * by the caller (see StreamingDemos, which runs this concurrently
    * with the watermark demo under one shared conf window). */
  private[streaming] def joinDemoImpl(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    locally {
      val base = 1704067200000L // 2024-01-01T00:00:00Z
      val readings = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[WatermarkDemo.Ev]
      val alerts = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Alert]
      // d1@00:05 matches the 00:10 alert; d1@01:00 is 50min away; d2
      // has no alert at all
      readings.addData(
        WatermarkDemo.Ev("d1", base + 5 * 60000L, 30f, 50f, "Rome"),
        WatermarkDemo.Ev("d1", base + 60 * 60000L, 31f, 50f, "Rome"),
        WatermarkDemo.Ev("d2", base + 6 * 60000L, 20f, 50f, "Rome"))
      alerts.addData(Alert("d1", base + 10 * 60000L, "high"))
      val name = "sj_demo_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = readingsWithAlerts(readings.toDF(), alerts.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
        .select(col("device_id"),
          col("r_time").cast("timestamp_ntz").as("r_time"),
          col("temperature"),
          col("a_time").cast("timestamp_ntz").as("a_time"),
          col("level"))
        .orderBy("device_id", "r_time")
    }
  }

  /** At-least-once -> effectively-once ingest: duplicate deliveries of
    * the same (device_id, timestamp) reading are dropped as long as
    * they arrive within the watermark horizon — the engine-side analog
    * of the reference's "duplicates overwrite the same Cassandra PK"
    * idempotence, but BEFORE the sink (no wasted writes). */
  def dedupWithinWatermark(decoded: DataFrame,
                           watermark: String = "1 minute"): DataFrame =
    decoded
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("device_id", "timestamp")
      .drop("event_time")

  /** The ingest dedup's semantics surfaced as a deterministic batch
    * result (registered as `q_stream_dedup` under a literal oracle): a
    * fixed sequence with one in-batch duplicate and one cross-batch
    * redelivery, both provably dropped — 3 unique readings survive from
    * 5 deliveries. */
  private[graft] def dedupDemoImpl(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    locally {
      val base = 1704067200000L // 2024-01-01T00:00:00Z
      val s = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[WatermarkDemo.Ev]
      val name = "sd_demo_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = dedupWithinWatermark(s.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
      try {
        // batch 1: d1@0 delivered twice (in-batch dup), d2@+1s
        s.addData(
          WatermarkDemo.Ev("d1", base, 22f, 50f, "Rome"),
          WatermarkDemo.Ev("d1", base, 22f, 50f, "Rome"),
          WatermarkDemo.Ev("d2", base + 1000L, 25f, 50f, "Rome"))
        q.processAllAvailable()
        // batch 2: d1@0 redelivered (cross-batch dup, inside the
        // 1-minute watermark horizon -> dropped), d1@+2s genuinely new
        s.addData(
          WatermarkDemo.Ev("d1", base, 22f, 50f, "Rome"),
          WatermarkDemo.Ev("d1", base + 2000L, 23f, 50f, "Rome"))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name)
        .select(col("device_id"), col("timestamp"), col("temperature"))
        .orderBy("device_id", "timestamp")
    }
  }
}
