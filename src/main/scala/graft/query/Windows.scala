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

  /** CUBE grouping sets: all 2^k aggregate combinations in ONE scan —
    * Catalyst expands to Expand + a single partial/final hash agg, so
    * the fact table is read once however many grouping sets there are.
    * grouping_id() disambiguates (NULL key) vs (rolled-up key). */
  def cubeRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(graft.Tables.decSum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** GROUPING SETS — the general form cube/rollup specialize: here the
    * two one-dimension marginals plus the grand total, WITHOUT the
    * (segment × status) cross cells a cube would also compute. Same
    * single-scan plan as cube (one Expand + one hash agg), but the
    * Expand replicates each row 3× instead of 4× — at 100 TB, choosing
    * the exact set list over a full cube is a material shuffle-volume
    * saving. */
  def groupingSetsRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("o_orderstatus")), Seq.empty),
        col("c_mktsegment"), col("o_orderstatus"))
      .agg(graft.Tables.decSum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Analytic-function battery over per-user event series: offset
    * (lag/lead), ranking (rank over value), distribution (ntile,
    * cume_dist) — one Window spec, one sort, no extra shuffles. */
  def windowFuncs(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wVal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
    events
      .select(col("event_id"), graft.Tables.ntz(col("ts")).as("ts"),
        col("user_id"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("value_rank", rank().over(wVal).cast(IntegerType))
      .withColumn("quartile", ntile(4).over(wVal).cast(IntegerType))
      .withColumn("cdist", cume_dist().over(wVal))
      .orderBy("user_id", "ts", "event_id")
  }

  /** SCD type-2 dimension build from an event log: each per-user value
    * observation becomes a versioned row with [valid_from, valid_to)
    * and a current flag — the warehouse-side answer to Cassandra's
    * in-place upsert (q_upsert_latest keeps only the head; this keeps
    * the full history, queryable as-of any time). One shuffle on the
    * key; lead() closes each interval. */
  def scd2(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("valid_from"), col("event_id"))
    events
      .filter(col("event_type") === "signup")
      .select(col("user_id"), graft.Tables.ntz(col("ts")).as("valid_from"),
        col("event_id"), col("value"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("event_id")
      .orderBy("user_id", "valid_from")
  }

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
