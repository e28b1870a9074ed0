package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Gap-based sessionization on the MODERN arbitrary-state API
  * (`transformWithState`, Spark 4.x — the successor to
  * mapGroupsWithState with typed state variables): per device, a
  * ValueState holds the open session; a reading further than `gapMs`
  * past the previous one closes the session and emits its summary.
  * Complements the built-in `session_window` (Windows.sessionWindow)
  * with custom per-session aggregation logic the built-in can't
  * express (e.g., first/last measurement carried verbatim).
  */
object Sessionize {

  case class Reading(device_id: String, timestamp: Long, temperature: Float)
  case class OpenSession(start: Long, last: Long, n: Int,
                         firstTemp: Float, lastTemp: Float)
  case class SessionOut(device_id: String, start_ts: Long, end_ts: Long,
                        n_readings: Int, first_temp: Float, last_temp: Float)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, Reading, SessionOut] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open_session", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Reading],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val out = List.newBuilder[SessionOut]
      var cur: Option[OpenSession] = if (open.exists()) Some(open.get()) else None
      rows.toSeq.sortBy(_.timestamp).foreach { r =>
        cur match {
          case Some(s) if r.timestamp - s.last > gapMs =>
            out += SessionOut(key, s.start, s.last, s.n, s.firstTemp, s.lastTemp)
            cur = Some(OpenSession(r.timestamp, r.timestamp, 1, r.temperature, r.temperature))
          case Some(s) =>
            // an out-of-order reading from a later micro-batch must not
            // shrink the session end (or steal lastTemp from the newest
            // in-order reading)
            val inOrder = r.timestamp >= s.last
            cur = Some(s.copy(
              last = math.max(s.last, r.timestamp),
              n = s.n + 1,
              lastTemp = if (inOrder) r.temperature else s.lastTemp))
          case None =>
            cur = Some(OpenSession(r.timestamp, r.timestamp, 1, r.temperature, r.temperature))
        }
      }
      cur match {
        case Some(s) => open.update(s)
        case None    => open.clear()
      }
      out.result().iterator
    }
  }

  def sessions(spark: SparkSession, readings: Dataset[Reading],
               gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import spark.implicits._
    readings
      .groupByKey(_.device_id)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.None(), OutputMode.Append())
  }
}
