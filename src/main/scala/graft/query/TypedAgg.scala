package graft.query

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** The typed-Dataset face of the engine (SURVEY §1.1/§2.5): a custom
  * `Aggregator[IN, BUF, OUT]` — Spark's UDAF surface — computing
  * per-group stats with the SAME cross-engine decimal discipline as
  * the untyped `Tables.decSum` path: each value is rounded HALF_UP to
  * scale 4 before summing (matching Spark's double->DECIMAL(18,4)
  * cast), partial buffers merge commutatively, and the finished sum is
  * the exact decimal's double — bit-identical to DuckDB's
  * `ROUND(SUM(CAST(v AS DECIMAL(18,4))), 4)::DECIMAL(38,4)::DOUBLE`.
  *
  * Scale shape: identical to a built-in hash aggregate — partial
  * buffers per partition, one shuffle of (key, buffer), final merge.
  * The typed API costs an encoder round trip per row versus the
  * codegen'd untyped path; it buys compile-time row types. The engine
  * uses it where type safety matters and built-ins elsewhere.
  */
object TypedAgg {

  case class EvRow(event_type: String, value: Double)
  case class StatsBuf(n: Long, sum: JBigDecimal, vmin: Double, vmax: Double)
  case class Stats(n: Long, total: Double, vmin: Double, vmax: Double)

  object StatsAgg extends Aggregator[EvRow, StatsBuf, Stats] {
    // Double.toString's shortest-representation decimal, NOT the exact
    // binary expansion: Spark's double->DECIMAL(18,4) cast (and DuckDB's)
    // round the printed value, so for tie-adjacent doubles (binary value
    // just below a printed .5) the exact expansion would round the other
    // way and diverge from the untyped decSum path this mirrors.
    private def dec4(v: Double): JBigDecimal =
      new JBigDecimal(java.lang.Double.toString(v)).setScale(4, RoundingMode.HALF_UP)

    override def zero: StatsBuf =
      StatsBuf(0L, JBigDecimal.ZERO.setScale(4), Double.MaxValue, Double.MinValue)

    override def reduce(b: StatsBuf, a: EvRow): StatsBuf =
      StatsBuf(b.n + 1, b.sum.add(dec4(a.value)),
        math.min(b.vmin, a.value), math.max(b.vmax, a.value))

    override def merge(x: StatsBuf, y: StatsBuf): StatsBuf =
      StatsBuf(x.n + y.n, x.sum.add(y.sum),
        math.min(x.vmin, y.vmin), math.max(x.vmax, y.vmax))

    override def finish(b: StatsBuf): Stats =
      Stats(b.n, b.sum.doubleValue(), b.vmin, b.vmax)

    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Per-event-type stats through the typed Aggregator. */
  def typedStats(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("event_type"), col("value")).as[EvRow]
      .groupByKey(_.event_type)
      .agg(StatsAgg.toColumn.name("stats"))
      .select(col("key").as("event_type"),
        col("stats.n").as("n"), col("stats.total").as("total"),
        col("stats.vmin").as("vmin"), col("stats.vmax").as("vmax"))
      .orderBy("event_type")
  }
}
