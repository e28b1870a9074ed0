package graft.streaming

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared streaming "round" for the fixed-point streaming demos
  * (`q_watermark_late`, `q_stream_join`, `q_stream_dedup`,
  * `q_checkpoint_recovery`). Each
  * demo's cost is dominated by streaming fixed overhead — checkpoint
  * dir, state-store init, micro-batch machinery — not by its 5-row
  * data, so running them SEQUENTIALLY pays that fixed cost once per
  * demo. First touch of any query starts all demos concurrently (the
  * multi-query lifecycle the engine already supports for the
  * dual-stream consumer, SURVEY §2 S11) and memoizes the results per
  * session: combined wall-clock is max(demo) + shared startup, not sum.
  *
  * Isolation: the demos run in a CHILD session (`newSession()` — same
  * SparkContext/catalog, independent SQLConf), so pinning the 2 state
  * partitions they want never leaks into unrelated queries executing
  * concurrently on the caller's session. The memo cache is weak-keyed
  * on the caller's session, so long-lived processes that cycle
  * sessions don't retain them.
  */
object StreamingDemos {

  private val cache =
    DemoMemo.register(java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, (DataFrame, DataFrame, DataFrame, DataFrame)]()))

  /** Spark's RocksDB state store provider — the cluster-scale state
    * backend (state spills to local disk instead of executor heap;
    * changelog-checkpoints to the stream's checkpoint dir). Off-heap
    * state is what lets a 100 TB ingest stream hold hours of dedup /
    * join horizon without OOM; the HDFS-backed default keeps state in
    * memory. */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Opt-in flag: -Dgraft.stateStore=rocksdb (or GRAFT_STATE_STORE=
    * rocksdb) routes every stateful demo query through RocksDB. The
    * fixed points are backend-invariant — StreamingSpec runs the same
    * demos under both providers and pins identical results. */
  private def stateStoreProvider: Option[String] =
    (sys.props.get("graft.stateStore") orElse sys.env.get("GRAFT_STATE_STORE"))
      .collect { case "rocksdb" => RocksDbProvider }

  private def runAll(spark: SparkSession): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // Child session: same SparkContext, own SQLConf — the demos' state
    // partition count is pinned here without touching the caller's conf.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    stateStoreProvider.foreach(
      s.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    implicit val ec: ExecutionContext = ExecutionContext.global
    val late = Future(WatermarkDemo.lateDropDemoImpl(s))
    val join = Future(StreamJoins.joinDemoImpl(s))
    val dedup = Future(StreamJoins.dedupDemoImpl(s))
    val recov = Future(RecoveryDemo.recoveryDemoImpl(s))
    (Await.result(late, 120.seconds), Await.result(join, 120.seconds),
      Await.result(dedup, 120.seconds), Await.result(recov, 240.seconds))
  }

  private def memo(spark: SparkSession): (DataFrame, DataFrame, DataFrame, DataFrame) =
    cache.synchronized {
      val cached = cache.get(spark)
      if (cached != null) cached
      else { val r = runAll(spark); cache.put(spark, r); r }
    }

  def lateDrop(spark: SparkSession): DataFrame = memo(spark)._1

  def streamJoin(spark: SparkSession): DataFrame = memo(spark)._2

  def streamDedup(spark: SparkSession): DataFrame = memo(spark)._3

  def checkpointRecovery(spark: SparkSession): DataFrame = memo(spark)._4
}
