package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Monitor

class MonitorSpec extends SparkTestBase {

  test("footer-based table stats equal a real COUNT(*) without scanning") {
    val stats = Monitor.tableStats(s"$sf/events.parquet", "events")
    val real = Tables.events(spark, sf).count()
    assert(stats.rows == real)
    assert(stats.files >= 1 && stats.bytes > 0)
  }

  test("table stats work against a file:/// URI (Hadoop FS listing, not java.io.File)") {
    val uri = new java.io.File(s"$sf/events.parquet").toURI.toString // file:///...
    assert(uri.startsWith("file:/"))
    val stats = Monitor.tableStats(uri, "events")
    assert(stats.rows == Tables.events(spark, sf).count())
    assert(stats.files >= 1 && stats.bytes > 0)
  }

  test("statsReport covers the warehouse with one row per table") {
    val rows = Monitor.statsReport(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("streamHealth reports batch progress and state rows for the agg stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.streaming.WatermarkDemo.Ev]
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val sink = new graft.sink.Sink {
      val name = "mon"; val consistencyLevel = "TEST"
      def write(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
        collected.synchronized { collected ++= b.collect() }
    }
    mem.addData(
      graft.streaming.WatermarkDemo.Ev("d1", 1704067200000L, 20f, 50f, "Rome"),
      graft.streaming.WatermarkDemo.Ev("d1", 1704074400000L, 30f, 50f, "Rome"))
    val q = graft.streaming.Streams.startAggStream(
      mem.toDF(), sink, tmpDir("mon-ck"), Trigger.AvailableNow())
    q.awaitTermination(120000)
    val health = Monitor.streamHealth(q)
    assert(health.isDefined, "a completed batch must yield a progress snapshot")
    assert(health.get.numInputRows == 2 || health.get.batchId >= 0)
    assert(health.get.stateRows >= 1, "open hour windows should be in state")
  }

  test("timedProbe returns the result and a plausible latency") {
    val (n, sec) = Monitor.timedProbe(Tables.events(spark, sf).count())
    assert(n > 0 && sec > 0.0 && sec < 120.0)
  }
}
