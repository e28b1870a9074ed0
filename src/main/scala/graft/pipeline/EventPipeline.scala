package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{decAvg, instant, ntz}

/** Batch form of the reference dataflow (SURVEY.md §2.2/§2.3): decode ->
  * derive event time -> tumbling-window aggregate -> bucket projection.
  *
  * Reference: `src/spark_consumer.py:115-192` — projection/flatten of the
  * decoded struct, `event_time` derivation from epoch millis, and the
  * 1-hour windowed avg/max/min/count keyed by device. The fixture
  * `events` table plays the decoded stream (user_id = device key,
  * value = measurement, props = the pre-Avro JSON payload variant from
  * `docs/data-contracts.md:35-44`).
  */
object EventPipeline {

  /** Schema of the JSON `props` payload (from_json path, S5). */
  val propsStruct: StructType = StructType(Seq(StructField("k", IntegerType, nullable = true)))

  /** P1: decode the JSON payload column to a struct and flatten it to
    * top-level columns — the `select(from_avro(...).alias("data"))
    * .select("data.*")` shape of `src/spark_consumer.py:115-122`. */
  def projectFlatten(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), from_json(col("props"), propsStruct).as("data"))
      .select(col("event_id"), col("data.*"))
      .orderBy("event_id")

  /** P2/P4/P6: epoch-millis -> event_time derivation, both the exact
    * millisecond form and the reference's literal second-precision chain
    * `to_timestamp(from_unixtime(ts/1000))` (`src/spark_consumer.py:123-126`). */
  def eventTime(events: DataFrame): DataFrame = {
    val tsMs = unix_millis(instant(col("ts")))
    events
      .select(
        col("event_id"),
        tsMs.as("ts_ms"),
        ntz(timestamp_millis(tsMs)).as("event_time"),
        ntz(to_timestamp(from_unixtime((tsMs / 1000).cast(LongType)))).as("event_time_sec"))
      .orderBy("event_id")
  }

  /** P3: the raw-sink column prune (`src/spark_consumer.py:140-146`). */
  def prune(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"), col("value"))
      .orderBy("event_id")

  /** P6: assorted date/time functions over event time. */
  def timeFuncs(events: DataFrame): DataFrame = {
    val ts = instant(col("ts"))
    events
      .select(
        col("event_id"),
        year(ts).as("y"),
        month(ts).as("m"),
        dayofmonth(ts).as("d"),
        hour(ts).as("h"),
        minute(ts).as("mi"),
        unix_timestamp(ts).as("epoch_s"),
        ntz(date_trunc("hour", ts)).as("hour_start"))
      .orderBy("event_id")
  }

  /** X5: JSON payload as a MapType column + map functions (the dynamic-
    * schema variant of projectFlatten). The parse is projected AFTER
    * the global sort: a projection under a range sort is evaluated
    * twice (the range-boundary sampling job re-executes the child), so
    * keeping expensive expressions above the Sort halves the JSON
    * parsing — measured 2.7 -> 0.7 s at sf0.1, and the sampling scan
    * prunes to just (event_id, props). */
  def propsMap(events: DataFrame): DataFrame = {
    val m = from_json(col("props"), MapType(StringType, StringType))
    events
      .select(col("event_id"), col("props"))
      .orderBy("event_id")
      .select(
        col("event_id"),
        m.getItem("k").as("k_str"),
        size(map_keys(m)).as("n_keys"))
  }

  /** A1-A4 batch form: 1-hour tumbling window keyed by device, the four
    * aggregate functions, and the post-agg projection of window.start to
    * an epoch-seconds `hour_bucket` clustering key
    * (`src/spark_consumer.py:174-192`). Decimal-exact avg for the
    * cross-engine oracle compare. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", instant(col("ts")))
      .groupBy(col("user_id"), window(col("event_time"), "1 hour").as("hour_window"))
      .agg(
        decAvg(col("value")).as("avg_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).cast(IntegerType).as("event_count"))
      .select(
        col("user_id"),
        unix_timestamp(col("hour_window.start")).cast(LongType).as("hour_bucket"),
        col("avg_value"), col("max_value"), col("min_value"), col("event_count"))
      .orderBy("user_id", "hour_bucket")
}
