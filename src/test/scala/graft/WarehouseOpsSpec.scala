package graft

import org.apache.spark.sql.functions._

import graft.query.Analytics

/** The warehouse-maintenance trio: mergeable-sketch rollup, incremental
  * aggregate refresh, and the portable equi-width histogram. */
class WarehouseOpsSpec extends SparkTestBase {

  test("sketch merge estimate lands within HLL error of the exact distinct count") {
    val events = Tables.events(spark, sf)
    val merged = Analytics.sketchMerge(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (t, est) =>
      val x = exact(t).toDouble
      assert(math.abs(est - x) / x <= 0.05, s"$t: est=$est exact=$x")
    }
  }

  test("incremental merge equals full recompute for ANY split point") {
    val events = Tables.events(spark, sf)
    val full = Analytics.incrementalAgg(events, "1900-01-01 00:00:00") // all rows in "delta"
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    Seq("2024-01-03 12:00:00", "2024-01-08 00:00:00", "2100-01-01 00:00:00").foreach { split =>
      val merged = Analytics.incrementalAgg(events, split)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(merged == full, s"split $split diverged from the full recompute")
    }
  }

  test("pagerank conserves probability mass, differentiates nodes, and is partition-insensitive") {
    import graft.query.PageRank
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = PageRank.rank(docs).collect()
    val n = docs.count()
    assert(out.length == n)
    // mass conservation: no dangling nodes by construction, so the
    // rank vector stays a probability distribution up to the per-node
    // 1e-10 rounding (bounded by n * 1e-10 per round)
    val mass = out.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < n * 5e-10 * 4, s"mass $mass")
    assert(out.forall(_.getDouble(1) > 0))
    // the (7id+3) rule gives some nodes in-degree 1 and others 3 —
    // iteration must differentiate them from the uniform start
    assert(out.map(_.getDouble(1)).distinct.length > 1)
    // bit-identical under a different input partitioning
    val re = PageRank.rank(docs.repartition(7)).collect()
    assert(re.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      out.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("general pagerank: dangling mass redistributes uniformly (hand-replayed) and links demo conserves mass") {
    import graft.query.PageRank
    import spark.implicits._
    // hand-built chain 0 -> 1 -> 2 with node 2 DANGLING: replay the
    // integer fixed-point arithmetic (div splits, dsum div n share,
    // 85/100 damping) by hand and demand bit-identity
    val nodes = Seq(0L, 1L, 2L).toDF("doc_id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val tiny = PageRank.rankGraph(nodes, edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val S = PageRank.Scale; val nn = 3L
    val tel = S * 15 / 100 / nn
    var r = Map(0L -> S / nn, 1L -> S / nn, 2L -> S / nn)
    for (_ <- 1 to 2) {
      val dsh = r(2L) / nn // node 2 is the only dangling node
      val in = Map(0L -> 0L, 1L -> r(0L), 2L -> r(1L)) // outdegs are 1
      r = (0L to 2L).map(i => i -> (tel + (85L * (in(i) + dsh)) / 100L)).toMap
    }
    assert(tiny == r.map { case (k, v) => k -> v.toDouble / S })

    // the registered cross-reference demo: ~9.5% dangling nodes, rank
    // stays a probability distribution up to the bounded flooring and
    // iteration still differentiates nodes
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = PageRank.rankLinks(docs).collect()
    val n = docs.count()
    assert(out.length == n)
    assert(out.forall(_.getDouble(1) > 0))
    val mass = out.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < n * 5e-10 * 4, s"mass $mass")
    assert(out.map(_.getDouble(1)).distinct.length > 1)
    // bit-identical under a different input partitioning
    val re = PageRank.rankLinks(docs.repartition(7)).collect()
    assert(re.map(x => (x.getLong(0), x.getDouble(1))).toSeq ==
      out.map(x => (x.getLong(0), x.getDouble(1))).toSeq)
  }

  test("histogram buckets partition the rows and sums are decimal-exact") {
    val li = Tables.lineitem(spark, sf)
    val h = Analytics.histogram(li).collect()
    assert(h.map(_.getLong(2)).sum == li.count())
    h.foreach { r =>
      val b = r.getInt(1)
      assert(b >= 0 && b <= 9, s"bucket out of range: $r")
    }
    // Spot-check one bucket against a direct filter count.
    val flag = h.head.getString(0); val b0 = h.head.getInt(1)
    val direct = li.filter(col("l_returnflag") === flag &&
      least(floor(col("l_quantity") / 5.0), lit(9)).cast("int") === b0).count()
    assert(h.head.getLong(2) == direct)
  }
}
