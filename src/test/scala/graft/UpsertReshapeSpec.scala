package graft

import org.apache.spark.sql.functions._

import graft.query.{IntervalJoin, Reshape, Upsert}

class UpsertReshapeSpec extends SparkTestBase {
  import spark.implicits._

  test("lwwMerge: update wins per key, untouched keys keep base state") {
    val base = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ver", "v")
    val updates = Seq((1L, 20L, "a2"), (3L, 5L, "c")).toDF("k", "ver", "v")
    val merged = Upsert.lwwMerge(base, updates, Seq("k"), col("ver").desc)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(merged == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("lwwMerge: equal versions resolve by the full declared ordering") {
    val base = Seq((1L, 10L, 100L, "old")).toDF("k", "ver", "seq", "v")
    val updates = Seq((1L, 10L, 200L, "new")).toDF("k", "ver", "seq", "v")
    val merged = Upsert.lwwMerge(base, updates, Seq("k"),
      col("ver").desc, col("seq").desc).collect()
    assert(merged.length == 1 && merged.head.getString(3) == "new")
  }

  test("bucketed interval join equals the naive range join") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val w = IntervalJoin.demoWindows(spark)
    val bucketed = IntervalJoin.byHourBucket(e, w)
      .select("window_id", "event_id").orderBy("window_id", "event_id").collect()
    val naive = e.join(w, col("ts") >= col("ws") && col("ts") < col("we"))
      .select("window_id", "event_id").orderBy("window_id", "event_id").collect()
    assert(bucketed.toSeq == naive.toSeq)
    assert(naive.nonEmpty, "fixture should have events inside the demo windows")
  }

  test("pivot row sums equal per-user counts; unpivot inverts pivot") {
    val e = Tables.events(spark, sf)
    val wide = Reshape.pivotCounts(e)
    val rowSums = wide.select(col("user_id"),
      Reshape.EventTypes.map(col).reduce(_ + _).as("total")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = e.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowSums == direct)

    val narrow = Reshape.unpivotCounts(wide)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val groundTruth = e.groupBy("user_id", "event_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(narrow == groundTruth)
  }
}
