package graft

import org.apache.spark.sql.functions._

import graft.query.Graph

/** Triangle counting: known-graph exactness, normalization, the
  * orientation's hub guarantee, and partition insensitivity. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("triangle counts on a hand-checked graph; normalization handles dups/loops/direction") {
    val nodes = (0L to 5L).toDF("doc_id")
    // triangle 0-1-2, pendant 2-3, path 3-4, isolated 5; edges arrive
    // dirty: duplicated, reversed, and with a self-loop
    val edges = Seq(
      (0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 2L),
      (2L, 3L), (3L, 4L), (4L, 4L)).toDF("src", "dst")
    val out = Graph.triangleCounts(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 2L, 1L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 2L, 0L), (4L, 1L, 0L), (5L, 0L, 0L)))
  }

  test("two adjacent triangles sharing an edge count both sides") {
    val nodes = (0L to 3L).toDF("doc_id")
    // K4 minus edge 0-3: triangles 0-1-2 and 1-2-3 share edge 1-2
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val out = Graph.triangleCounts(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("degree orientation neutralizes the hub: its oriented out-degree stays O(1)") {
    val docs = Tables.documents(spark, sf)
    val edges = Graph.citationEdges(docs)
    // replay the orientation the operator uses and measure node 0's
    // out-degree: the hub has the strictly highest degree, so every
    // incident edge orients INTO it — out-degree 0. This is the whole
    // scale argument (wedges at a node grow with outdeg^2).
    val canon = edges.select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
    val deg = canon.select($"a".as("id")).unionAll(canon.select($"b".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))
    val ranked = canon
      .join(deg.select($"id".as("a"), $"deg".as("da")), Seq("a"))
      .join(deg.select($"id".as("b"), $"deg".as("db")), Seq("b"))
    val hubOut = ranked.select(
        when(struct($"da", $"a") < struct($"db", $"b"), $"a").otherwise($"b").as("u"))
      .filter($"u" === 0L).count()
    val hubDeg = deg.filter($"id" === 0L).head().getLong(1)
    assert(hubDeg >= 20L, s"fixture hub should be high-degree, got $hubDeg")
    assert(hubOut == 0L, s"hub must emit no wedges, out-degree $hubOut")
  }

  test("fixture graph: totals consistent and repartition-insensitive") {
    val docs = Tables.documents(spark, sf)
    val base = Graph.triangleDemo(docs).collect()
    // per-node participation sums to 3x the number of distinct triangles
    assert(base.map(_.getLong(2)).sum % 3 == 0)
    assert(base.map(_.getLong(2)).max >= 3, "fixture graph has varied counts")
    val shuffled = Graph.triangleCounts(
      docs, Graph.citationEdges(docs).repartition(7)).collect()
    assert(base.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      shuffled.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("k-core peels a tail off a triangle; an insufficient round budget self-reports") {
    val nodes = (0L to 4L).toDF("doc_id")
    // triangle 0-1-2 with tail 2-3-4: k=2 core = the triangle
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.kCore(nodes, edges, k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(out == Seq((0L, true, true), (1L, true, true), (2L, true, true),
      (3L, false, true), (4L, false, true)))
    // the tail needs TWO cascade rounds (4 drops, then 3): rounds=1
    // leaves node 3 alive with degree 1 — converged must be false
    val short = Graph.kCore(nodes, edges, k = 2, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(short.map(_._2) == Seq(true, true, true, true, false))
    assert(short.forall(!_._3), "unconverged peel must self-report")
  }

  test("fixture 4-core is exactly the planted cliques; peel converges within budget") {
    val docs = Tables.documents(spark, sf)
    val out = Graph.kCoreDemo(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.forall(_._3), "fixture must converge in 5 rounds")
    val core = out.filter(_._2).map(_._1).toSet
    val expected = out.map(_._1).filter(id => id % 100 < 6).toSet
    assert(core == expected, s"core should be the planted cliques: ${core.size} vs ${expected.size}")
    assert(core.nonEmpty)
  }
}
