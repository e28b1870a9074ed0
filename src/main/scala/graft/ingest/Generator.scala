package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13: the reference's seeded data generator (`src/producer.py:27-29,
  * 116-129,153-193`) re-expressed as a distributed, deterministic
  * column program: `spark.range(n)` + hash-derived uniforms instead of
  * a single-process Python loop — the same statistical contract
  * (temp U[15,35) 2dp, humidity U[30,90) 2dp, 7 fixed cities, epoch
  * millis, fixed device fleet) but embarrassingly parallel, so it can
  * synthesize test corpora at any scale without a driver bottleneck.
  *
  * The PRF is ENGINE-PORTABLE by design: an affine seed step followed
  * by two Lehmer rounds over the Mersenne modulus 2^31-1, all in
  * positive 63-bit-safe integer arithmetic (largest intermediate is
  * (2^31)*48271 < 2^48, so Spark's ANSI mode never overflows and any
  * SQL engine with exact BIGINT math — e.g. the DuckDB oracle —
  * reproduces every row bit-for-bit. `mixSql` emits the same PRF as
  * SQL text so the correctness harness can verify the generator
  * itself, not just consumers of it. The 2-decimal-digit uniforms are
  * derived as INTEGER hundredths then divided by 100.0, so no round()
  * (whose tie behavior differs across engines) is ever involved.
  */
object Generator {
  val Cities: Seq[String] =
    Seq("Rome", "Milan", "Naples", "Turin", "Florence", "Venice", "Bologna")

  /** Base epoch millis: 2024-01-01T00:00:00Z, the fixtures' epoch. */
  val BaseMs: Long = 1704067200000L

  private val M = 2147483647L // 2^31 - 1

  /** Portable PRF: uniform-ish value in [0, 2^31-1) from (id, salt). */
  private def mix(id: Column, salt: Int): Column = {
    val h1 = (id * lit(1000003L) + lit(salt.toLong * 8191L + 12345L)) % lit(M)
    val h2 = (h1 * lit(48271L)) % lit(M)
    (h2 * lit(16807L)) % lit(M)
  }

  /** The same PRF as SQL text (for the cross-engine oracle). */
  def mixSql(id: String, salt: Int): String =
    s"((((($id) * 1000003 + ${salt.toLong * 8191L + 12345L}) % $M) * 48271) % $M) * 16807 % $M"

  private val SaltTemp = 1
  private val SaltHum = 2
  private val SaltCity = 3

  /** The device dimension (`cassandra/init.cql:63-74`): device_id,
    * device_name "Sensor-NNN", home city, timestamps (NTZ — the
    * fixtures' naive-timestamp convention). */
  def devices(spark: SparkSession, numDevices: Int = 100): DataFrame =
    spark.range(numDevices).select(
      concat(lit("device-"), lpad(col("id").cast(StringType), 4, "0")).as("device_id"),
      concat(lit("Sensor-"), lpad(col("id").cast(StringType), 3, "0")).as("device_name"),
      cityOf(col("id")).as("location"),
      lit("2024-01-01 00:00:00").cast(TimestampNTZType).as("created_at"),
      lit("2024-01-01 00:00:00").cast(TimestampNTZType).as("last_updated"))

  /** Per-device home city: hash the device INDEX (not the event id) so
    * every event of a device agrees with the `devices` dimension. */
  private def cityOf(devIdx: Column): Column =
    element_at(
      array(Cities.map(lit): _*),
      ((mix(devIdx, SaltCity) % lit(Cities.size.toLong)) + lit(1L)).cast(IntegerType))

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
      temperature(col("id")),
      humidity(col("id")),
      cityOf(pmod(col("id"), lit(numDevices.toLong))).as("location"))
  }

  /** U[15.00, 34.99] in exact hundredths — integer PRF then /100.0, so
    * both engines produce the identical float32. */
  private def temperature(id: Column): Column =
    (((mix(id, SaltTemp) % lit(2000L)) + lit(1500L)).cast(DoubleType) / lit(100.0))
      .cast(FloatType).as("temperature")

  /** U[30.00, 89.99] in exact hundredths. */
  private def humidity(id: Column): Column =
    (((mix(id, SaltHum) % lit(6000L)) + lit(3000L)).cast(DoubleType) / lit(100.0))
      .cast(FloatType).as("humidity")

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
      temperature(col("value")),
      humidity(col("value")),
      cityOf(pmod(col("value"), lit(numDevices.toLong))).as("location"))
  }
}
