package graft

import org.apache.spark.sql.functions._

import graft.llm.{Clustering, Similarity}

class ClusteringSpec extends SparkTestBase {

  test("kmeans: total cover, >1 cluster, partition-insensitive assignments") {
    val e = Tables.embeddings(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeansAssign(df, k = 8).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
    val a = run(e)
    assert(a.size == e.count(), "every vector is assigned exactly once")
    assert(a.values.toSet.size > 1, "more than one non-empty cluster")
    assert(run(e.repartition(7)) == a,
      "assignments are a pure function of the data, not its partitioning")
  }

  test("semDedup flags exactly the vectors with a lower-id same-cluster neighbor above tau") {
    val e = Tables.embeddings(spark, sf)
    val tau = 0.30 // enough mass at sf0.001 to flag real duplicates
    val got = Clustering.semDedup(e, k = 8, tau = tau)
    val flagged = got.filter(col("is_dup")).collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "tau=0.30 must flag something at sf0.001")
    // independent recompute: brute-force within-cluster pairs through a
    // different plan shape (crossJoin + filter instead of the blocked join)
    val asg = Clustering.kmeansAssign(e, k = 8)
    val un = e.select(col("vec_id"), Similarity.unitVector(col("embedding")).as("u"))
      .join(asg, Seq("vec_id"))
    val expect = un.as("x").crossJoin(un.as("y"))
      .filter(col("x.cluster") === col("y.cluster") && col("x.vec_id") < col("y.vec_id"))
      .filter(graft.functions.VectorFns.dot(col("x.u"), col("y.u")) >= tau)
      .select(col("y.vec_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(flagged == expect)
    // keep-first: the lowest id of any flagged group is never itself
    // flagged by a HIGHER id only (ids only drop to earlier neighbors)
    val keptMin = got.filter(!col("is_dup")).agg(min("vec_id")).head().getLong(0)
    assert(keptMin == got.agg(min("vec_id")).head().getLong(0),
      "the globally lowest id can never be a duplicate")
  }
}
