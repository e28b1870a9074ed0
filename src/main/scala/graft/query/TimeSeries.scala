package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.ntz

/** Time-series operators over the event stream: regular-grid
  * resampling with last-observation-carried-forward, and rolling
  * z-score anomaly flags.
  *
  * Scale shape: resampling reuses the as-of join composition (one hash
  * shuffle of grid+events, no range join); the z-score window sums are
  * per-key sorted frames — one shuffle, and the variance is derived
  * from DECIMAL-exact running sums so the result is bit-reproducible
  * across engines and partition layouts (a naive stddev window would
  * drift in the last ulp with accumulation order).
  */
object TimeSeries {

  /** LOCF resample: for every (user, grid point) the latest event value
    * at or before the grid instant (null before a user's first event).
    * The IoT "downsample the raw stream to a regular grid" op the
    * reference serves with newest-first LIMIT-1 point reads. */
  def resampleLocf(events: DataFrame,
                   start: String = "2024-01-01 00:00:00",
                   stop: String = "2024-01-15 00:00:00",
                   stepHours: Int = 6): DataFrame = {
    val grid = events.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(
          lit(start).cast("timestamp_ntz"),
          lit(stop).cast("timestamp_ntz"),
          expr(s"INTERVAL $stepHours HOURS"))).as("ts"))
    AsOfJoin.asOf(grid, events.select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", "value")
      .select(col("user_id"), ntz(col("ts")).as("grid_ts"),
        ntz(col("asof_ts")).as("src_ts"), col("asof_value").as("value"))
      .orderBy("user_id", "grid_ts")
  }

  /** Rolling z-score over the preceding `n` events per user. The mean
    * and variance come from decimal-exact window sums of v and v^2
    * (v has 2 dp, so v^2 is exactly a 4-dp number — ROUND before the
    * decimal cast snaps the double product onto that grid identically
    * in Spark and DuckDB); all downstream arithmetic is plain IEEE
    * double with one spelling, so zscore matches bit-for-bit. */
  def rollingZscore(events: DataFrame, n: Int = 20, minObs: Int = 5,
                    threshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-n, -1)
    val dec = DecimalType(18, 4)
    val out = DecimalType(38, 4)
    val base = events
      .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_id"), col("value"))
      .withColumn("cnt", count(col("value")).over(w))
      .withColumn("s1", sum(col("value").cast(dec)).over(w).cast(out).cast(DoubleType))
      .withColumn("s2", sum(round(col("value") * col("value"), 4).cast(dec)).over(w)
        .cast(out).cast(DoubleType))
    val variance = (col("s2") - col("s1") * col("s1") / col("cnt")) / (col("cnt") - 1)
    val z = (col("value") - col("s1") / col("cnt")) / sqrt(variance)
    base
      .withColumn("zscore", when(col("cnt") >= minObs && variance > 0, z))
      .withColumn("is_anomaly",
        when(col("cnt") >= minObs && variance > 0, abs(z) > threshold))
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("zscore"), col("is_anomaly"))
      .orderBy("event_id")
  }
}
