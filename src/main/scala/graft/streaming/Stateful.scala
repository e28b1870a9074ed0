package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** Custom arbitrary-state streaming operator (the
  * `flatMapGroupsWithState` class the built-in windowed aggs can't
  * express): per-device detection of RUNS of consecutive
  * over-threshold readings. State per device is (run length, run start,
  * running max); a run is emitted when a reading drops back under the
  * threshold or the group times out. Works identically over a bounded
  * stream (Trigger.AvailableNow) and MemoryStream.
  */
object Stateful {

  case class Reading(device_id: String, timestamp: Long, temperature: Float)
  case class RunState(count: Int, startTs: Long, maxTemp: Float)
  case class AnomalyRun(device_id: String, start_ts: Long, end_ts: Long,
                        n_readings: Int, max_temp: Float)

  val DefaultThreshold = 30.0f

  def detectRuns(readings: Iterator[Reading], state: Option[RunState],
                 threshold: Float): (Option[RunState], List[AnomalyRun]) = {
    var cur = state
    var lastTs = 0L
    val out = List.newBuilder[AnomalyRun]
    readings.toSeq.sortBy(_.timestamp).foreach { r =>
      lastTs = r.timestamp
      if (r.temperature > threshold) {
        cur = Some(cur match {
          case Some(s) => RunState(s.count + 1, s.startTs, math.max(s.maxTemp, r.temperature))
          case None    => RunState(1, r.timestamp, r.temperature)
        })
      } else {
        cur.foreach(s => out += AnomalyRun("", s.startTs, r.timestamp, s.count, s.maxTemp))
        cur = None
      }
    }
    (cur, out.result())
  }

  /** Streaming form: one state entry per device, closed runs emitted
    * per micro-batch, open runs carried in the state store. */
  def anomalyRuns(spark: SparkSession, readings: Dataset[Reading],
                  threshold: Float = DefaultThreshold): Dataset[AnomalyRun] = {
    import spark.implicits._
    readings
      .groupByKey(_.device_id)
      .flatMapGroupsWithState[RunState, AnomalyRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (device: String, rows: Iterator[Reading], state: GroupState[RunState]) =>
          val (next, closed) = detectRuns(rows, state.getOption, threshold)
          next match {
            case Some(s) => state.update(s)
            case None    => if (state.exists) state.remove()
          }
          closed.map(r => r.copy(device_id = device)).iterator
      }
  }

  /** Batch analog for the oracle/inspection path: runs found via the
    * gaps-and-islands window pattern (same semantics, one pass). */
  def anomalyRunsBatch(spark: SparkSession, readings: Dataset[Reading],
                       threshold: Float = DefaultThreshold): Dataset[AnomalyRun] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val w = Window.partitionBy("device_id").orderBy("timestamp")
    val flagged = readings.toDF()
      .withColumn("hot", (col("temperature") > threshold).cast("int"))
      .withColumn("grp",
        sum(lit(1) - col("hot")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // a run must be CLOSED by a subsequent cool reading (streaming
    // parity: open runs stay in state). A hot run carries grp = g (the
    // cool-count before it); its first closing cool reading carries
    // grp = g + 1, so the closer keys back with grp - 1.
    val closing = flagged.filter(col("hot") === 0)
      .select(col("device_id"), (col("grp") - 1).as("grp"), col("timestamp").as("end_ts"))
    flagged
      .filter(col("hot") === 1)
      .groupBy(col("device_id"), col("grp"))
      .agg(
        min("timestamp").as("start_ts"),
        count(lit(1)).cast("int").as("n_readings"),
        max("temperature").as("max_temp"))
      .join(closing, Seq("device_id", "grp"))
      .select(col("device_id"), col("start_ts"), col("end_ts"), col("n_readings"), col("max_temp"))
      .as[AnomalyRun]
  }
}
