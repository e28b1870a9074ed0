package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Deterministic, self-contained demonstration of watermark late-drop
  * semantics (SURVEY §2.3 A5, `src/spark_consumer.py:171-172`),
  * runnable as a declared query: a fixed event sequence is replayed
  * through the REAL watermarked streaming aggregation in two
  * micro-batch rounds — the second round injects an event 1 hour late
  * for an already-finalized window — and the emitted (finalized)
  * windows are returned as a batch DataFrame. The late event must not
  * reopen its window, so hour-0's count stays 2.
  */
object WatermarkDemo {

  case class Ev(device_id: String, timestamp: Long, temperature: Float,
                humidity: Float, location: String)

  private val BaseMs = 1704067200000L // 2024-01-01T00:00:00Z

  private def ev(dev: String, minuteOfDay: Int, temp: Float): Ev =
    Ev(dev, BaseMs + minuteOfDay * 60000L, temp, 50f, "Rome")

  def lateDropDemo(spark: SparkSession): DataFrame = {
    // A 5-event demo does not need 32 state-store partitions: each
    // stateful micro-batch commits one store per shuffle partition,
    // and that checkpoint I/O is the entire runtime here. The setting
    // is pinned at stream start, so restore it right after.
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try lateDropDemoImpl(spark)
    finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
  }

  private[streaming] def lateDropDemoImpl(spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ck = java.nio.file.Files.createTempDirectory("wm-demo-ck").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val sink = new graft.sink.Sink {
      val name = "wm-demo"; val consistencyLevel = "TEST"
      def write(b: DataFrame, id: Long): Unit = collected.synchronized {
        collected ++= b.collect()
      }
    }

    // batch 1: two hour-0 readings; an hour-2 reading pushes the
    // watermark past hour-0's window end -> hour-0 finalizes with n=2
    mem.addData(ev("d1", 0, 20f), ev("d1", 30, 24f), ev("d1", 125, 30f))
    // ONE continuously-running query (a second streaming startup used
    // to cost ~2.7 s here); micro-batch boundaries between addData
    // calls give the same watermark semantics as a restart.
    val q = Streams.startAggStream(mem.toDF(), sink, ck,
      Trigger.ProcessingTime("25 milliseconds"))
    q.processAllAvailable()

    // batch 2: a 99-degree straggler for hour 0 (far behind the
    // watermark -> dropped) plus an hour-5 reading to flush hour 2
    mem.addData(ev("d1", 5, 99f), ev("d1", 300, 10f))
    q.processAllAvailable()
    // finalized windows emit in the watermark-advance batch AFTER the
    // data batch, which processAllAvailable does not wait for — poll.
    val deadline = System.currentTimeMillis() + 60000
    while (collected.synchronized(collected.size) < 2
           && System.currentTimeMillis() < deadline) Thread.sleep(25)
    q.stop()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("device_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("hour_bucket", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("avg_temperature", org.apache.spark.sql.types.FloatType),
      org.apache.spark.sql.types.StructField("max_temperature", org.apache.spark.sql.types.FloatType),
      org.apache.spark.sql.types.StructField("min_temperature", org.apache.spark.sql.types.FloatType),
      org.apache.spark.sql.types.StructField("event_count", org.apache.spark.sql.types.IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(collected.toSeq, 1), schema)
      .orderBy("device_id", "hour_bucket")
  }
}
