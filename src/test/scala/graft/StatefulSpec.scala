package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Stateful
import graft.streaming.Stateful.{AnomalyRun, Reading}

class StatefulSpec extends SparkTestBase {
  import spark.implicits._

  private val data = Seq(
    Reading("d1", 1000L, 31f), Reading("d1", 2000L, 33f), Reading("d1", 3000L, 25f),
    Reading("d1", 4000L, 36f), Reading("d1", 5000L, 20f),
    Reading("d2", 1000L, 20f), Reading("d2", 2000L, 35f)) // d2 run never closes

  test("batch gaps-and-islands finds exactly the closed runs") {
    val runs = Stateful.anomalyRunsBatch(spark, data.toDS()).collect().toSet
    assert(runs == Set(
      AnomalyRun("d1", 1000L, 3000L, 2, 33f),
      AnomalyRun("d1", 4000L, 5000L, 1, 36f)))
  }

  test("streaming flatMapGroupsWithState emits closed runs and holds open state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(data: _*)
    val outName = "anomaly_runs_out"
    val q = Stateful.anomalyRuns(spark, mem.toDS())
      .writeStream.format("memory").queryName(outName)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table(outName).as[AnomalyRun].collect().toSet
    assert(got == Set(
      AnomalyRun("d1", 1000L, 3000L, 2, 33f),
      AnomalyRun("d1", 4000L, 5000L, 1, 36f))) // d2's run stays in state
  }

  test("streaming equals batch on generated sensor data") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.ingest.Generator.sensorEvents(spark, 20, 30)
      .selectExpr("device_id", "timestamp", "temperature").as[Reading]
      .collect().toSeq
    val mem = MemoryStream[Reading]
    mem.addData(events: _*)
    val q = Stateful.anomalyRuns(spark, mem.toDS())
      .writeStream.format("memory").queryName("gen_runs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("gen_runs").as[AnomalyRun].collect().toSet
    val batch = Stateful.anomalyRunsBatch(spark, events.toDS()).collect().toSet
    assert(streamed == batch)
  }
}
