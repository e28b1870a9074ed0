package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval (range-containment) join: match fact rows whose event time
  * falls inside [start, end) of an intervals dimension — incident
  * windows, maintenance periods, campaign ranges.
  *
  * Scale shape: a naive `ts BETWEEN start AND end` join is a nested
  * loop (no equality key). This operator expands each interval to the
  * HOUR BUCKETS it covers (one row per covered hour — bounded by
  * interval length) and joins on the bucket as an EQUALITY key, with
  * the exact range predicate left as a residual filter. The join then
  * hash-partitions on the bucket like any equi-join: broadcastable for
  * small dims, shuffle-capable for millions of intervals — never
  * O(facts x intervals).
  */
object IntervalJoin {

  private val HourUs = 3600L * 1000000L

  /** Facts (with a `ts` column) joined to intervals
    * (`window_id`, `ws`, `we` timestamps), equality on covered hour. */
  def byHourBucket(facts: DataFrame, intervals: DataFrame): DataFrame = {
    val expanded = intervals.select(
      col("window_id"), col("ws"), col("we"),
      explode(sequence(
        expr("unix_micros(cast(ws as timestamp)) div 3600000000"),
        // end is exclusive: a window ending exactly on the hour does
        // not cover that hour
        expr("(unix_micros(cast(we as timestamp)) - 1) div 3600000000")))
        .as("hour_bucket"))
    val keyed = facts.withColumn("hour_bucket",
      expr("unix_micros(cast(ts as timestamp)) div 3600000000").cast(LongType))
    keyed
      .join(expanded, Seq("hour_bucket"))
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
      .drop("hour_bucket", "ws", "we")
  }

  /** A small deterministic incident-window dim over the fixture
    * timeline: two-hour windows at 00:00 on days 1/3/5/7/9. */
  def demoWindows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(1, 3, 5, 7, 9).map { day =>
      (day.toLong, f"2024-01-$day%02d 00:00:00", f"2024-01-$day%02d 02:00:00")
    }.toDF("window_id", "ws_s", "we_s")
      .select(col("window_id"),
        col("ws_s").cast("timestamp_ntz").as("ws"),
        col("we_s").cast("timestamp_ntz").as("we"))
  }
}
