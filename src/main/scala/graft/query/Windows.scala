package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{decAvg, instant}

/** Windowing variants beyond the reference's single tumbling window
  * (declared absent in SURVEY §2.3 — the engine gets them from Spark;
  * these queries pin their semantics under the oracle gate).
  */
object Windows {

  /** Sliding event-time window: 1-hour windows every 30 minutes — each
    * event lands in exactly two windows (epoch-aligned, like Spark's
    * `window()`). */
  def slidingWindow(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", instant(col("ts")))
      .groupBy(
        col("user_id"),
        window(col("event_time"), "1 hour", "30 minutes").as("w"))
      .agg(
        decAvg(col("value")).as("avg_value"),
        count(lit(1)).as("event_count"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).cast(LongType).as("window_start"),
        col("avg_value"), col("event_count"))
      .orderBy("user_id", "window_start")

  /** Session window: gap-based grouping (30-minute inactivity closes
    * the session). Streaming-capable (`session_window` + watermark);
    * batch form checked rows-only + in tests. */
  def sessionWindow(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", instant(col("ts")))
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("event_count"), decAvg(col("value")).as("avg_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("sw.start")).cast(LongType).as("session_start"),
        unix_timestamp(col("sw.end")).cast(LongType).as("session_end"),
        col("event_count"), col("avg_value"))
      .orderBy("user_id", "session_start")

  /** ROLLUP grouping sets over the star schema. */
  def rollupRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderstatus"))
      .agg(graft.Tables.decSum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** Set operations: events by two predicates — union / intersect /
    * except of the matching id sets. */
  def setOps(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase").select("user_id")
    val errors = events.filter(col("event_type") === "error").select("user_id")
    val both = purchases.intersect(errors).withColumn("relation", lit("both"))
    val purchaseOnly = purchases.except(errors).withColumn("relation", lit("purchase_only"))
    val errorOnly = errors.except(purchases).withColumn("relation", lit("error_only"))
    both.unionByName(purchaseOnly).unionByName(errorOnly)
      .orderBy("relation", "user_id")
  }
}
