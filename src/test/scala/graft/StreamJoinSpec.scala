package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoins
import graft.streaming.WatermarkDemo.Ev

class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val Base = 1704067200000L // 2024-01-01T00:00:00Z

  private def ev(dev: String, minute: Int, temp: Float): Ev =
    Ev(dev, Base + minute * 60000L, temp, 50f, "Rome")

  test("stream-stream join matches readings to alerts within the time range") {
    implicit val sqlCtx = spark.sqlContext
    val readings = MemoryStream[Ev]
    val alerts = MemoryStream[StreamJoins.Alert]

    // d1@00:05 matches the 00:10 alert (5 min apart); d1@01:00 does not
    // (50 min from the alert); d2's reading has no alert at all.
    readings.addData(ev("d1", 5, 30f), ev("d1", 60, 31f), ev("d2", 6, 20f))
    alerts.addData(StreamJoins.Alert("d1", Base + 10 * 60000L, "high"))

    val q = StreamJoins.readingsWithAlerts(readings.toDF(), alerts.toDF())
      .writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sj_out")
        .select("device_id", "temperature", "level").collect()
        .map(r => (r.getString(0), r.getFloat(1), r.getString(2))).toSeq
      assert(rows == Seq(("d1", 30f, "high")))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops redelivered readings across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamJoins.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: a reading delivered twice in the same batch
      mem.addData(ev("d1", 0, 20f), ev("d1", 0, 20f), ev("d2", 0, 25f))
      q.processAllAvailable()
      // batch 2: the same d1 reading redelivered (still inside the
      // watermark horizon) + one genuinely new reading
      mem.addData(ev("d1", 0, 20f), ev("d1", 1, 21f))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select("device_id", "timestamp").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq(
        ("d1", Base), ("d1", Base + 60000L), ("d2", Base)).sorted)
    } finally q.stop()
  }
}
