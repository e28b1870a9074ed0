package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Co-located (bucketed) fact-fact join: both tables bucketed by the
  * join key at write time -> the join plans WITHOUT a shuffle on either
  * side. This is the 100 TB answer to repeated lineitem-orders joins
  * (SURVEY §4 write-path layout; docs/SCALE.md fact-fact row). */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed tables join with zero shuffle exchanges") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped at the end
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"), first("o_totalprice").as("price"))

    val plan = joined.queryExecution.executedPlan
    val shufflesBeforeAgg = plan.collect { case s: ShuffleExchangeExec => s }
    // the aggregation itself also needs no exchange: it groups on the
    // bucket key, so partitioning is already correct
    assert(shufflesBeforeAgg.isEmpty,
      s"expected a shuffle-free co-located join+agg, got:\n$plan")

    // and it computes the right thing
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      .orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bucketed = joined.orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(bucketed.toSeq == direct.toSeq)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
