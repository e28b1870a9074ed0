package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{decAvg, decOut, decSum}

/** Heavier analytical queries over the star schema — the bench headliners.
  * These exercise scan + pushdown, partial/final hash aggregation,
  * broadcast vs shuffle join selection, and top-N. All aggregates over
  * doubles go through DECIMAL(18,4) (see Tables.decSum) so the DuckDB
  * oracle compare is bit-exact regardless of accumulation order —
  * essential once partial aggregation runs on 32+ partitions.
  */
object Analytics {
  private val dec = DecimalType(18, 4)
  // Unit-interval factors get a narrow decimal so products stay under
  // 38 digits of precision and remain EXACT in both Spark and DuckDB
  // (DECIMAL(18,4) * DECIMAL(7,4) * DECIMAL(7,4) = precision <= 34).
  private val unitDec = DecimalType(6, 4)

  /** TPC-H Q1-shaped pricing summary: full lineitem scan, group by two
    * low-cardinality flags. Map-side partial agg collapses 60k (or 100 TB)
    * rows to (#groups x #partitions) before the shuffle. */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val price = col("l_extendedprice").cast(dec)
    val disc  = col("l_discount").cast(unitDec)
    val tax   = col("l_tax").cast(unitDec)
    // lit(1) would coerce to decimal(10,0) and push the triple product
    // past 38 digits (precision loss); a (6,4) literal keeps it exact.
    val one = lit(1).cast(unitDec)
    lineitem
      .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decOut(sum(price * (one - disc))).as("sum_disc_price"),
        decOut(sum(price * (one - disc) * (one + tax))).as("sum_charge"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        decAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue by nation. The fact-fact join (lineitem->orders) is the
    * expensive edge, so lineitem is pre-aggregated to one decimal
    * revenue row per order BEFORE the join — pushing the aggregation
    * through the join (Catalyst doesn't do this rewrite itself) shrinks
    * the shuffled side from #lineitems to #orders. Decimal arithmetic
    * keeps the two-level sum bit-exact vs the single-level oracle.
    * customer/nation stay broadcast. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame): DataFrame = {
    val price = col("l_extendedprice").cast(dec)
    val disc  = col("l_discount").cast(unitDec)
    val one   = lit(1).cast(unitDec)
    val perOrder = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(price * (one - disc)).as("rev_dec"), count(lit(1)).as("n_lines"))
    perOrder
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        decOut(sum(col("rev_dec"))).as("revenue"),
        sum(col("n_lines")).as("n_items"))
      .orderBy("n_name")
  }

  /** Market-share headliner (TPC-H Q8 family): per order-year, the
    * revenue share of one nation's customers among its whole region.
    * Plan shape: per-order partial agg FIRST (shuffles #orders, not
    * #lineitems), then broadcast dim joins, then one final agg keyed
    * on the year — conditional numerator and denominator come out of
    * the same aggregate, so the fact data is read and shuffled once.
    * Share = exact-decimal numerator / exact-decimal denominator, both
    * surfaced as doubles, so the quotient is bit-identical across
    * engines. */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, region: DataFrame,
                  targetNation: String = "NATION_2",
                  targetRegion: String = "ASIA"): DataFrame = {
    val price = col("l_extendedprice").cast(dec)
    val disc  = col("l_discount").cast(unitDec)
    val one   = lit(1).cast(unitDec)
    val perOrder = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(price * (one - disc)).as("rev_dec"))
    perOrder
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === targetRegion)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        decOut(sum(when(col("n_name") === targetNation, col("rev_dec"))))
          .as("nation_revenue"),
        decOut(sum(col("rev_dec"))).as("region_revenue"))
      .withColumn("share", col("nation_revenue") / col("region_revenue"))
      .orderBy("o_year")
  }

  /** Top parts by shipped quantity: large groupBy on a high-cardinality
    * key, then top-N (TakeOrderedAndProject after partial agg), then a
    * broadcast enrich of only the 25 survivors. */
  def topParts(lineitem: DataFrame, part: DataFrame, k: Int = 25): DataFrame =
    lineitem
      .groupBy(col("l_partkey"))
      .agg(decSum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
      .orderBy(col("total_qty").desc, col("l_partkey"))
      .limit(k)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("p_name"), col("total_qty"), col("n_lines"))
      .orderBy(col("total_qty").desc, col("l_partkey"))

  /** Anti join (NOT EXISTS): customers who never placed a big-ticket
    * order. Spark's left_anti is a hash join on the key — the orders
    * side is filtered then projected to the key column only, so the
    * build side carries 8 bytes/row however wide the fact table is. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             minPrice: Double = 300000.0): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > minPrice).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Correlated EXISTS with a per-row predicate: orders that contain
    * at least one high-quantity line. Planned as a left-semi hash join
    * after the quantity filter is pushed below the join — the
    * decorrelated form of the subquery. */
  def ordersWithBigLines(orders: DataFrame, lineitem: DataFrame,
                         minQty: Double = 49.0): DataFrame =
    orders
      .join(
        lineitem.filter(col("l_quantity") >= minQty).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")

  /** Order-priority counts in a date range — pushdown-friendly filter +
    * semi-join shape (TPC-H Q4 flavor): orders that have at least one
    * late lineitem. */
  def latePriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val late = lineitem
      .filter(col("l_shipdate") > lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
      .select(col("l_orderkey"))
    orders
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Customer market-segment revenue (join + two-level grouping). */
  def segmentRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        decSum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment", "o_orderstatus")

  /** Exact percentiles per group (percentile_cont semantics — linear
    * interpolation, identical formula in DuckDB's quantile_cont). */
  def valuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        expr("round(percentile(value, 0.5), 4)").as("p50"),
        expr("round(percentile(value, 0.9), 4)").as("p90"),
        expr("round(percentile(value, 0.99), 4)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Sketch aggregates: HLL distinct estimate next to the exact count.
    * Engines' sketches differ, so this is a rows-only query; the
    * ScalaTest asserts the estimate lands within HLL error of exact. */
  def approxDistinct(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Mergeable-sketch rollup — THE pattern for distinct counts at
    * 100 TB: per-(type, day) Datasketches HLL sketches are built in one
    * pass, then UNIONED per type (hll_union_agg) instead of re-scanning
    * the facts. A day's sketch is a few KB however many rows it
    * covers, so a year-over-year distinct-users rollup touches 365
    * sketch rows per key, not the raw events. Estimate emitted next to
    * the exact count for the error-bound check. */
  def sketchMerge(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("daily_exact"))
    daily
      .groupBy(col("event_type"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_estimate"),
        count(lit(1)).as("n_days"))
      .orderBy("event_type")
  }

  /** Materialized-view maintenance: the merge step of incremental
    * aggregate refresh. partial(history) ⊎ partial(delta) must equal a
    * full recompute — true for any commutative-monoid aggregate, and
    * bit-exact here because the partials are exact decimals. This is
    * the same discipline the streaming sink's per-batch upserts rely
    * on; the oracle recomputes from scratch, so the merge is what is
    * being checked. */
  def incrementalAgg(events: DataFrame,
                     splitTs: String = "2024-01-08 00:00:00"): DataFrame = {
    val cutoff = lit(splitTs).cast("timestamp_ntz")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(sum(col("value").cast(dec)).as("sum_dec"), count(lit(1)).as("n"))
    partial(events.filter(col("ts") < cutoff))          // "yesterday's" MV state
      .unionByName(partial(events.filter(col("ts") >= cutoff))) // today's delta
      .groupBy(col("user_id"))
      .agg(decOut(sum(col("sum_dec"))).as("total_value"),
        sum(col("n")).as("n_events"))
      .orderBy("user_id")
  }

  /** Equi-width histogram with explicit bucket arithmetic (portable to
    * any engine, unlike width_bucket): bucket = min(floor(v/w), n-1).
    * One partial/final agg over (flag, bucket) — the shuffle carries
    * #flags x #buckets rows however large the fact table is. */
  def histogram(lineitem: DataFrame, bucketWidth: Double = 5.0,
                nBuckets: Int = 10): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"),
        least(floor(col("l_quantity") / bucketWidth), lit(nBuckets - 1))
          .cast(IntegerType).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), decSum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "bucket")

  /** Monthly order volume — date_trunc rollup over event time. */
  def ordersByMonth(orders: DataFrame): DataFrame =
    orders
      .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType).as("month"))
      .agg(decSum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n_orders"))
      .orderBy("month")
}
