package graft

import org.apache.spark.sql.functions._

import graft.sink.ZOrderLayout

/** The Z-ordered layout prunes on BOTH dimensions: row-group stats for
  * user_id AND ts each overlap only a small fraction of row groups,
  * while a single-column (user_id) sort leaves the time dimension
  * unprunable (~every row group overlaps any hour).
  */
class ZOrderSpec extends SparkTestBase {

  private def coreEvents = Tables.events(spark, sf).select(
    col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

  test("z-ordered layout round-trips and clusters both dimensions") {
    val zdir = tmpDir("zorder-layout")
    ZOrderLayout.writeZOrdered(coreEvents, zdir, files = 16)

    // correctness: same rows as a direct filter
    val direct = coreEvents.filter(col("user_id") === 13).orderBy("event_id").collect()
    val viaZ = ZOrderLayout.readFiltered(spark, zdir, 13).collect()
    assert(viaZ.toSeq == direct.toSeq)

    // single-column-sorted comparison layout
    val sdir = tmpDir("usersort-layout")
    coreEvents.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sdir)

    // dimension 1: a single device key
    val zUser = ZOrderLayout.overlapFraction(zdir, "user_id", 13, 13)
    val sUser = ZOrderLayout.overlapFraction(sdir, "user_id", 13, 13)
    assert(zUser <= 0.5, s"z-order should prune most row groups on user_id, overlap=$zUser")
    assert(sUser <= 0.5, s"user-sort should prune on user_id, overlap=$sUser")

    // dimension 2: one day of event time (ts stored as micros)
    val dayLo = java.time.LocalDate.parse("2024-01-03")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val dayHi = dayLo + 24L * 3600 * 1000000
    val zTs = ZOrderLayout.overlapFraction(zdir, "ts", dayLo, dayHi)
    val sTs = ZOrderLayout.overlapFraction(sdir, "ts", dayLo, dayHi)
    assert(zTs < sTs,
      s"z-order must beat single-column sort on the second dimension: z=$zTs sort=$sTs")
    assert(zTs <= 0.7, s"z-order should prune a day-range scan, overlap=$zTs")
    assert(sTs >= 0.9, s"user-sorted layout cannot prune on ts, overlap=$sTs")
  }
}
