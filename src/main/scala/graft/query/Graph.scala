package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the graph-structure quality signal
  * that complements PageRank in a crawl curation pipeline (local
  * clustering separates genuine community pages from link farms, which
  * have high in-degree but near-zero triangle density; the reference
  * has no graph op — this extends the north-star graph family begun by
  * `PageRank`/`Dedup.connectedComponentsStar`).
  *
  * Algorithm: DEGREE-ORDERED edge orientation (the standard
  * node-iterator++ / Latapy discipline). Every undirected edge is
  * directed from its lower-(degree, id) endpoint to its higher one;
  * each triangle then has exactly ONE vertex with out-edges to the
  * other two, so it is found exactly once — no /3 correction, no
  * double counting, and (the scale point) the out-degree of ANY node
  * is O(sqrt(|E|)): a hub with a million neighbors receives almost
  * all of its edges INBOUND (its neighbors have lower degree, so the
  * orientation points at the hub) and generates NO wedge explosion.
  * Without orientation, wedge generation at a degree-d hub is d², the
  * classic triangle-count killer on power-law graphs; with it, the
  * wedge count is bounded by sum(outdeg²) <= |E|^1.5 regardless of
  * skew. The fixture graph pins exactly this case: node 0 is a
  * deliberate hub (degree |V|/25 + 4) and ends up with out-degree <= 2.
  *
  * Dataflow: three shuffles total, all equality-keyed —
  *   1. canonical-edge distinct + degree agg (one exchange on the
  *      edge key, one on id);
  *   2. wedge generation: oriented x oriented self-equi-join on the
  *      source vertex (the rank inequality rides the join as a
  *      post-filter, so each unordered out-pair is emitted once);
  *   3. triangle close: wedges equi-joined against the oriented edge
  *      set on BOTH endpoints.
  * Per-node counts are one explode + hash agg of (id, 1) rows. Nothing
  * is ever collected to the driver; every join key is a bare long (or
  * a pair of longs), never a payload.
  *
  * Cross-engine determinism: counts are exact integers and the
  * (degree, id) total order is engine-independent — struct comparison
  * in Spark is the same lexicographic row comparison DuckDB spells
  * `(deg, id) < (deg, id)`. No floats exist anywhere.
  */
object Graph {

  /** Per-node (degree, triangle-participation) counts over an
    * arbitrary edge table. `nodes` must expose `doc_id`; `edges` must
    * expose (`src`, `dst`) and is treated as UNDIRECTED — direction,
    * duplicates, and self-loops are normalized away. Isolated nodes
    * report (0, 0). */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // canonical undirected edge set: a < b, no loops, no duplicates
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient by the (deg, id) total order: u -> v with rank(u) < rank(v)
    val ranked = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oriented = ranked.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    // wedges (u; v, w) with rank(v) < rank(w): each out-pair once
    val o2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = oriented.join(o2, Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("u"), col("v"), col("w"))
    // close the wedge: the v—w edge is oriented v -> w by transitivity
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val triangles = wedges.join(closing, Seq("v", "w"))
    val perNode = triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    nodes.select(col("doc_id"))
      .join(deg.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(perNode.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .orderBy("doc_id")
  }

  /** The fixture cross-reference graph (deterministic in the corpus
    * ids, which are contiguous 0..N-1): chain edges i—(i+1) mod N,
    * chord edges i—(i+2) mod N for i % 3 != 0 and i—(i+3) mod N for
    * i % 4 == 0, plus a deliberate HUB — node 0 links every 25th doc.
    * Yields per-node triangle counts in {2,3,4} and a degree-|V|/25
    * hub that the orientation must (and does) neutralize: the hub has
    * the highest degree, so all its edges orient INTO it and its
    * wedge contribution is ~zero. */
  def citationEdges(documents: DataFrame): DataFrame = {
    val n = documents.count()
    val ids = documents.select(col("doc_id"))
    ids.select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst"))
      .unionByName(ids.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("src"), ((col("doc_id") + 2) % n).as("dst")))
      .unionByName(ids.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("src"), ((col("doc_id") + 3) % n).as("dst")))
      .unionByName(ids.filter(col("doc_id") % 25 === 0 && col("doc_id") =!= 0)
        .select(lit(0L).as("src"), col("doc_id").as("dst")))
  }

  /** The registered row: triangle counts over the citation graph. */
  def triangleDemo(documents: DataFrame): DataFrame =
    triangleCounts(documents, citationEdges(documents))
}
