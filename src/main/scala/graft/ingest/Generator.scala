package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13: the reference's seeded data generator (`src/producer.py:27-29,
  * 116-129,153-193`) re-expressed as a distributed, deterministic
  * column program: `spark.range(n)` + hash-derived uniforms instead of
  * a single-process Python loop — the same statistical contract
  * (temp U[15,35] 2dp, humidity U[30,90] 2dp, 7 fixed cities, epoch
  * millis, fixed device fleet) but embarrassingly parallel, so it can
  * synthesize test corpora at any scale without a driver bottleneck.
  */
object Generator {
  val Cities: Seq[String] =
    Seq("Rome", "Milan", "Naples", "Turin", "Florence", "Venice", "Bologna")

  /** Base epoch millis: 2024-01-01T00:00:00Z, the fixtures' epoch. */
  val BaseMs: Long = 1704067200000L

  /** Deterministic uniform in [0, 1) derived from (id, salt). */
  private def u01(id: Column, salt: String): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast(DoubleType) / 1000000.0)

  private def round2(c: Column): Column = round(c, 2)

  /** The device dimension (`cassandra/init.cql:63-74`): device_id,
    * device_name "Sensor-NNN", home city, timestamps. */
  def devices(spark: SparkSession, numDevices: Int = 100): DataFrame =
    spark.range(numDevices).select(
      concat(lit("device-"), lpad(col("id").cast(StringType), 4, "0")).as("device_id"),
      concat(lit("Sensor-"), lpad(col("id").cast(StringType), 3, "0")).as("device_name"),
      element_at(
        array(Cities.map(lit): _*),
        (pmod(xxhash64(col("id"), lit("city")), lit(Cities.size.toLong)) + 1).cast(IntegerType))
        .as("location"),
      lit(new java.sql.Timestamp(BaseMs)).as("created_at"),
      lit(new java.sql.Timestamp(BaseMs)).as("last_updated"))

  /** Batch sensor-event stream: numDevices devices x 1 event/sec each,
    * mirroring the producer's pacing. Deterministic given (numDevices,
    * seconds). */
  def sensorEvents(spark: SparkSession, numDevices: Int = 100, seconds: Int = 60): DataFrame = {
    val n = numDevices.toLong * seconds
    spark.range(n).select(
      concat(lit("device-"), lpad(pmod(col("id"), lit(numDevices.toLong)).cast(StringType), 4, "0"))
        .as("device_id"),
      concat(lit("Sensor-"), lpad(pmod(col("id"), lit(numDevices.toLong)).cast(StringType), 3, "0"))
        .as("device_name"),
      (lit(BaseMs) + expr(s"id div $numDevices") * 1000L).as("timestamp"),
      round2(lit(15.0) + u01(col("id"), "temp") * 20.0).cast(FloatType).as("temperature"),
      round2(lit(30.0) + u01(col("id"), "hum") * 60.0).cast(FloatType).as("humidity"),
      // location is a fixed per-DEVICE attribute (producer carries the
      // device's home city on every event) — hash the device index, not
      // the event id, so it agrees with `devices` above.
      element_at(
        array(Cities.map(lit): _*),
        (pmod(xxhash64(pmod(col("id"), lit(numDevices.toLong)), lit("city")),
          lit(Cities.size.toLong)) + 1).cast(IntegerType))
        .as("location"))
  }

  /** Streaming variant: the `rate` source (rows/sec) mapped through the
    * same deterministic column exprs — the Kafka-producer stand-in for
    * streaming tests (SURVEY §2.1 S13). */
  def sensorEventStream(spark: SparkSession, rowsPerSecond: Int = 100,
                        numDevices: Int = 100): DataFrame = {
    val base = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load() // (timestamp, value)
    base.select(
      concat(lit("device-"), lpad(pmod(col("value"), lit(numDevices.toLong)).cast(StringType), 4, "0"))
        .as("device_id"),
      lit(null).cast(StringType).as("device_name"),
      unix_millis(col("timestamp")).as("timestamp"),
      round2(lit(15.0) + u01(col("value"), "temp") * 20.0).cast(FloatType).as("temperature"),
      round2(lit(30.0) + u01(col("value"), "hum") * 60.0).cast(FloatType).as("humidity"),
      // per-device location, consistent with `devices` (see sensorEvents)
      element_at(
        array(Cities.map(lit): _*),
        (pmod(xxhash64(pmod(col("value"), lit(numDevices.toLong)), lit("city")),
          lit(Cities.size.toLong)) + 1).cast(IntegerType))
        .as("location"))
  }
}
