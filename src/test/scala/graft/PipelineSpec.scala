package graft

import org.apache.spark.sql.functions._

import graft.ingest.Generator
import graft.llm.{Multimodal, TextOps}
import graft.pipeline.EventPipeline

class PipelineSpec extends SparkTestBase {

  private lazy val events = Tables.events(spark, sf)
  private lazy val docs = Tables.documents(spark, sf)

  test("hourly agg equals the brute-force date_trunc groupBy") {
    val windowed = EventPipeline.hourlyAgg(events)
      .select("user_id", "hour_bucket", "event_count")
    val brute = events
      .groupBy(col("user_id"), unix_timestamp(date_trunc("hour", col("ts").cast("timestamp")))
        .cast("long").as("hour_bucket"))
      .agg(count(lit(1)).cast("int").as("event_count"))
      .select("user_id", "hour_bucket", "event_count")
    assert(windowed.collect().toSet == brute.collect().toSet)
  }

  test("generator is deterministic and in-contract") {
    val a = Generator.sensorEvents(spark, 10, 5).collect()
    val b = Generator.sensorEvents(spark, 10, 5).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 50)
    a.foreach { r =>
      val t = r.getFloat(3); val h = r.getFloat(4)
      assert(t >= 15f && t <= 35f, s"temp $t out of U[15,35]")
      assert(h >= 30f && h <= 90f, s"humidity $h out of U[30,90]")
      assert(Generator.Cities.contains(r.getString(5)))
    }
  }

  test("devices dim has one row per device with stable ids") {
    val d = Generator.devices(spark, 100).collect()
    assert(d.length == 100)
    assert(d.map(_.getString(0)).distinct.length == 100)
  }

  test("media feature extraction is deterministic with the declared shape") {
    val f1 = Multimodal.mediaFeaturesQuery(spark, docs).collect()
    val f2 = Multimodal.mediaFeaturesQuery(spark, docs).collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "n_pixels", "pixel_sum", "pixel_max") ++
        (0 until 8).map(b => s"f$b"))
    f1.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) <= 32)           // width
      (6 until 14).foreach { i =>
        val f = r.getDouble(i)
        assert(f >= 0.0 && f <= 255.0, s"band mean $f out of gray range")
      }
    }
  }

  test("as-of join picks the latest prior right row, inclusive at equal ts") {
    import spark.implicits._
    val ts = (m: Int) => new java.sql.Timestamp(1704067200000L + m * 60000L)
    val left = Seq(
      (1L, ts(0), 5L), (2L, ts(10), 5L), (3L, ts(30), 5L), (4L, ts(5), 9L)
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (5L, ts(10), 100.0), (5L, ts(20), 200.0)
    ).toDF("user_id", "ts", "value")
    val got = graft.query.AsOfJoin.asOf(left, right, "user_id", "ts", "value")
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) == None)            // before any update
    assert(got(2L) == Some(100.0))     // equal ts -> inclusive
    assert(got(3L) == Some(200.0))     // latest prior
    assert(got(4L) == None)            // other key
  }

  test("session windows merge events within the gap and split across it") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "x", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "x", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "x", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = graft.query.Windows.sessionWindow(df).collect()
    assert(sessions.length == 2)
    assert(sessions.head.getLong(3) == 2) // first session holds the two close events
    assert(sessions(1).getLong(3) == 1)
  }

  test("grouping sets yields exactly the two marginals plus the grand total") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val out = graft.query.Windows.groupingSetsRevenue(orders, customer).collect()
    // gid 1 = by-segment, 2 = by-status, 3 = grand total — NO gid 0
    // (segment × status) cross cells, which is what separates this from cube
    val byGid = out.groupBy(_.getLong(4))
    assert(byGid.keySet == Set(1L, 2L, 3L))
    val nSeg = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment").distinct().count()
    val nStat = orders.select("o_orderstatus").distinct().count()
    assert(byGid(1L).length == nSeg && byGid(2L).length == nStat)
    assert(byGid(3L).length == 1)
    // every marginal sums to the grand total (decimal-exact agg, double out)
    val total = byGid(3L).head.getDouble(2)
    Seq(1L, 2L).foreach { g =>
      val s = byGid(g).map(_.getDouble(2)).sum
      assert(math.abs(s - total) / total < 1e-9, s"gid $g: $s != $total")
    }
  }

  test("HLL approx distinct lands within its error bound of exact") {
    val rows = graft.query.Analytics.approxDistinct(Tables.lineitem(spark, sf)).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("resize emits real 8x8 PNGs and frame-sample strides the decoded raster") {
    val resized = graft.llm.Multimodal.resize(spark, docs, 8, 8).collect()
    assert(resized.length == docs.count())
    resized.foreach { r =>
      assert(r.width == 8 && r.height == 8 && r.mime == "image/png")
      // the payload is an actual PNG: magic bytes + re-decodable at 8x8
      assert((r.media(0) & 0xff) == 0x89 && r.media(1) == 'P')
      val img = Multimodal.decodeImage(r.media).getOrElse(fail(s"doc ${r.doc_id} thumb undecodable"))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
    val frames = graft.llm.Multimodal.frameSample(spark, docs).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.frame_idx % 4 == 0)
      assert(f.n_px >= 16 && f.n_px <= 32)
      assert(f.row_sum >= 0 && f.row_sum <= 255L * f.n_px)
    }
    // deterministic
    val frames2 = graft.llm.Multimodal.frameSample(spark, docs).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx)).toSeq ==
      frames2.sortBy(f => (f.doc_id, f.frame_idx)).toSeq)
  }

  test("token ops agree with a direct computation") {
    val row = TextOps.tokenCount(docs).collect().head
    val text = docs.orderBy("doc_id").select("text").collect().head.getString(0)
    assert(row.getInt(1) == text.split(" ").length)
    assert(row.getLong(2) == text.length.toLong)
  }
}
