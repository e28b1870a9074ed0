package graft

import org.apache.spark.sql.functions._

import graft.query.TimeSeries

class TimeSeriesSpec extends SparkTestBase {

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  test("LOCF resample carries the latest at-or-before value per grid point") {
    val res = TimeSeries.resampleLocf(events)
    val uid = events.select("user_id").first().getLong(0)
    val gridTs = java.sql.Timestamp.valueOf("2024-01-08 00:00:00").toLocalDateTime
    val got = res.filter(col("user_id") === uid &&
        col("grid_ts") === lit("2024-01-08 00:00:00").cast("timestamp_ntz"))
      .select("value").collect()
    val expected = events
      .filter(col("user_id") === uid &&
        col("ts") <= lit("2024-01-08 00:00:00").cast("timestamp_ntz"))
      .orderBy(col("ts").desc).select("value").limit(1).collect()
    assert(got.length == 1)
    assert(got.head.getDouble(0) == expected.head.getDouble(0), s"grid $gridTs")
    // grid size = users x 57 points
    val users = events.select("user_id").distinct().count()
    assert(res.count() == users * 57)
  }

  test("rolling z-score matches a direct computation on one user's series") {
    val uid = events.select("user_id").first().getLong(0)
    val series = events.filter(col("user_id") === uid)
      .orderBy(col("ts"), col("event_id"))
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val got = TimeSeries.rollingZscore(events)
      .filter(col("user_id") === uid)
      .select("event_id", "zscore").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    series.zipWithIndex.foreach { case ((eid, v), i) =>
      val prev = series.slice(math.max(0, i - 20), i).map(_._2)
      if (prev.length >= 5) {
        val s1 = prev.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        val s2 = prev.map(x => BigDecimal(x * x).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        val n = prev.length
        val variance = (s2 - s1 * s1 / n) / (n - 1)
        if (variance > 0) {
          val z = (v - s1 / n) / math.sqrt(variance)
          assert(math.abs(got(eid).get - z) < 1e-9, s"event $eid")
        }
      } else assert(got(eid).isEmpty, s"event $eid should have no z-score yet")
    }
  }

  test("tfidf equals the direct formula for a sampled (doc, token)") {
    val docs = Tables.documents(spark, sf)
    val out = graft.llm.TextOps.tfidf(docs)
    val row = out.filter(col("df") > 1).first()
    val n = docs.count()
    val expected = (row.getLong(2).toDouble / row.getLong(3)) *
      math.log((1.0 + n) / (1.0 + row.getLong(4)))
    assert(math.abs(row.getDouble(5) - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }
}
