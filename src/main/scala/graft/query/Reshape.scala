package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pivot / unpivot reshaping over the event stream. Pivot values are
  * EXPLICIT (no extra distinct-scan job, deterministic column order —
  * the two-arg `pivot` would first run a job to discover values and
  * emit columns in data order). */
object Reshape {

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** user x event_type count matrix. */
  def pivotCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("user_id")

  /** Inverse: the wide matrix back to (user_id, event_type, cnt) —
    * `unpivot` is a projection+explode, no shuffle. Zero cells are
    * dropped to mirror the groupBy form. */
  def unpivotCounts(wide: DataFrame): DataFrame =
    wide
      .unpivot(Array(col("user_id")), EventTypes.map(col).toArray,
        "event_type", "cnt")
      .filter(col("cnt") > 0)
      .orderBy("user_id", "event_type")
}
