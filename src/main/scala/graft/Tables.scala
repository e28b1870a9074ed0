package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Timestamp convention: the fixtures store naive (no-timezone) parquet
  * timestamps, which Spark 4 reads as TIMESTAMP_NTZ and DuckDB reads as
  * naive TIMESTAMP. The whole engine runs with session timezone UTC, so
  * NTZ <-> instant casts are value-preserving. Query OUTPUT timestamp
  * columns are always TIMESTAMP_NTZ so the driver's DuckDB compare sees
  * the same logical values on both sides.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** events is the stand-in for the reference's `sensor-events` Kafka
    * stream: user_id <-> device key, ts <-> event time, value <-> the
    * measurement (SURVEY.md FIXTURES mapping).
    *
    * The fixture's `ts` encoding has drifted across driver
    * regenerations (TIMESTAMP(NANOS) then TIMESTAMP(MICROS)/NTZ), so
    * the loader is encoding-agnostic: it branches on the dtype Spark
    * actually inferred instead of assuming one parquet footer.
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects the footer unless
    *    `nanosAsLong` is on; we set it only on that failure, read the
    *    column as a raw long, and integer-divide (`div`, not `/` —
    *    int64 nanos exceed double's 2^53 mantissa) down to
    *    microseconds, matching DuckDB's ns->us read.
    *  - TIMESTAMP(MICROS) (adjusted or not): already what we want;
    *    normalize to NTZ (no-op under the UTC session for instants).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw =
      try table(spark, sfDir, "events")
      catch {
        case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
          // Only a NANOS footer needs the legacy flag; it must stay set
          // for this DataFrame's (lazy) execution, so it is NOT
          // restored here — a deliberate SESSION INVARIANT: the flag
          // is a no-op for every non-NANOS encoding the loaders meet,
          // pinned explicitly by FixtureSchemaSpec's "nanosAsLong
          // pre-set" test in both flag orders (round-10 verdict task 7).
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(spark, sfDir, "events")
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", ntz(timestamp_micros(expr("ts div 1000"))))
      case TimestampNTZType => raw
      case TimestampType    => raw.withColumn("ts", ntz(col("ts")))
      case other =>
        throw new IllegalStateException(s"events.parquet: unexpected ts type $other")
    }
  }

  /** A column cast to instant semantics for time functions that need
    * TimestampType (window, unix_timestamp, ...). UTC session => no-op
    * on the wall-clock value. */
  def instant(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(TimestampType)

  /** Output-side cast: every timestamp column a query emits is NTZ so
    * DuckDB reads the written parquet as naive TIMESTAMP (same as the
    * oracle's). */
  def ntz(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(TimestampNTZType)

  /** Exact cross-engine aggregation of a double column: cast to
    * DECIMAL(18,4) (value-preserving for the fixtures' 2-dp doubles),
    * aggregate exactly in decimal, surface as DOUBLE. Bit-identical in
    * Spark and DuckDB regardless of accumulation order, unlike a raw
    * double SUM/AVG.
    *
    * The rescale through DECIMAL(38,4) before the double cast is
    * load-bearing twice over: (a) Spark's HALF_UP downscale matches
    * DuckDB's ROUND() (its bare decimal->decimal cast truncates!), and
    * (b) at scale 4 the unscaled int stays < 2^53, where DuckDB's
    * int128-based decimal->double cast is exact (at scale 12 it is off
    * by 1 ulp from Java's BigDecimal.doubleValue).
    * Oracle-side spelling:
    *   CAST(CAST(ROUND(SUM(...), 4) AS DECIMAL(38,4)) AS DOUBLE). */
  def decOut(aggregated: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregated.cast(DecimalType(38, 4)).cast(DoubleType)

  def decSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    decOut(sum(c.cast(DecimalType(18, 4))))

  def decAvg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    decSum(c) / count(lit(1))
}
