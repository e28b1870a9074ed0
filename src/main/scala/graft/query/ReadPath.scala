package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.ntz

/** The read-side query classes the reference's Cassandra data model is
  * designed to serve (SURVEY.md §2.2 P8-P15) as batch DataFrame plans.
  * Partition-key routing becomes parquet predicate pushdown + partition
  * pruning; `CLUSTERING ORDER BY (timestamp DESC)` + `LIMIT` becomes
  * `TakeOrderedAndProject`.
  */
object ReadPath {
  /** Fixed probe key, the analog of `WHERE device_id = ?`
    * (`monitoring/cassandra_latency_check.py:13`). */
  val DeviceKey  = 13
  val RangeKey   = 7
  val RangeStart = "2024-01-05 00:00:00"
  val RangeEnd   = "2024-01-15 00:00:00"

  private def core(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), ntz(col("ts")).as("ts"), col("user_id"),
      col("event_type"), col("value"))

  /** P8: per-device predicate, pushed to the scan. */
  def filterDevice(events: DataFrame): DataFrame =
    core(events).filter(col("user_id") === DeviceKey).orderBy("event_id")

  /** P9/P14: point lookup + newest-first top-N — the CQL
    * `SELECT * WHERE device_id=? LIMIT 100` served by clustering order. */
  def latestPerDevice(events: DataFrame): DataFrame =
    core(events)
      .filter(col("user_id") === DeviceKey)
      .orderBy(col("ts").desc, col("event_id"))
      .limit(100)

  /** P10: per-key event-time range scan, descending — the
    * hourly_aggregates table's query class (`cassandra/init.cql:41-54`). */
  def timeRange(events: DataFrame): DataFrame =
    core(events)
      .filter(
        col("user_id") === RangeKey &&
        col("ts") >= lit(RangeStart).cast("timestamp_ntz") &&
        col("ts") < lit(RangeEnd).cast("timestamp_ntz"))
      .orderBy(col("ts").desc, col("event_id"))

  /** P11: secondary-index-style filter on a non-key column
    * (`cassandra/init.cql:81-82`, location <-> event_type). */
  def filterLocation(events: DataFrame): DataFrame =
    core(events).filter(col("event_type") === "purchase").orderBy("event_id")

  /** P12: COUNT(*) (`monitoring/monitor.sh:83-84`). */
  def countAll(lineitem: DataFrame): DataFrame =
    lineitem.agg(count(lit(1)).as("cnt"))

  /** P13/P14: global newest-first sort + limit. */
  def sortGlobal(events: DataFrame): DataFrame =
    core(events).orderBy(col("ts").desc, col("event_id")).limit(50)

  /** Top-N per key via ranking window — the general form of P9 across
    * all devices at once. */
  def topkPerKey(events: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id"))
    core(events)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy(col("user_id"), col("rn"))
  }

  /** Top-N per key again, but written as the plain window idiom and
    * keyed on a low-cardinality column — exercises the injected
    * TopKRewrite (plans/TopKPerKey.scala): the optimizer replaces the
    * Filter+Window pair with the heap-partial / streaming-final custom
    * operator, so no full pre-shuffle sort and no WindowExec runs. */
  def topkByType(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    core(events)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy(col("event_type"), col("rn"))
  }

  /** P15: dimension-enrichment join. The dim side is tiny (customer /
    * nation scale with lineitem) so it MUST broadcast — no shuffle of
    * the fact table at 100 TB. */
  def enrichJoin(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("n_name"))
      .orderBy("o_orderkey")

  /** S12: plain batch scan (full projection). */
  def scan(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), ntz(col("l_shipdate")).as("l_shipdate"))
      .orderBy("l_orderkey", "l_linenumber")

  /** P7: substring over a payload column (the Confluent-header strip
    * shape, `src/spark_consumer.py:118`). */
  def substr(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), substring(col("text"), 6, 40).as("frag"))
      .orderBy("doc_id")
}
