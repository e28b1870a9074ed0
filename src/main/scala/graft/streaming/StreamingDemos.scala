package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared streaming "round" for the fixed-point streaming demos
  * (`q_watermark_late`, `q_stream_join`, `q_stream_dedup`). Each
  * demo's cost is dominated by streaming fixed overhead — checkpoint
  * dir, state-store init, micro-batch machinery — not by its 5-row
  * data, so running them SEQUENTIALLY pays that fixed cost once per
  * demo. First touch of any query starts all demos concurrently (the
  * multi-query lifecycle the engine already supports for the
  * dual-stream consumer, SURVEY §2 S11) and memoizes the results per
  * session: combined wall-clock is max(demo) + shared startup, not sum.
  *
  * All demos want 2 state partitions (pinned at stream start), so the
  * shuffle-partition save/set/restore happens ONCE around the shared
  * round — the per-demo wrappers in WatermarkDemo/StreamJoins keep
  * doing it themselves for direct library calls.
  */
object StreamingDemos {

  private val cache =
    new ConcurrentHashMap[SparkSession, (DataFrame, DataFrame, DataFrame)]()

  private def runAll(spark: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val ec: ExecutionContext = ExecutionContext.global
      val late = Future(WatermarkDemo.lateDropDemoImpl(spark))
      val join = Future(StreamJoins.joinDemoImpl(spark))
      val dedup = Future(StreamJoins.dedupDemoImpl(spark))
      (Await.result(late, 120.seconds), Await.result(join, 120.seconds),
        Await.result(dedup, 120.seconds))
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  def lateDrop(spark: SparkSession): DataFrame =
    cache.computeIfAbsent(spark, runAll(_))._1

  def streamJoin(spark: SparkSession): DataFrame =
    cache.computeIfAbsent(spark, runAll(_))._2

  def streamDedup(spark: SparkSession): DataFrame =
    cache.computeIfAbsent(spark, runAll(_))._3
}
