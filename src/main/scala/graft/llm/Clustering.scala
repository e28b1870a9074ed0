package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.VectorFns

/** Deterministic k-means (Lloyd) and SemDeDup — the cluster-then-dedup
  * curation pass of the published training-data pipelines (SemDeDup:
  * k-means the embedding space, then search for near-duplicates only
  * WITHIN each cluster, bounding the quadratic pair work by
  * (n/k)^2 * k instead of n^2).
  *
  * Everything is deterministic and cross-engine exact, so the whole
  * iterative algorithm sits under a DuckDB oracle:
  *   - seeds = the k lowest vec_ids (no RNG);
  *   - assignment = argmin_c (c.c - 2 e.c) with ties to the lowest
  *     cid — the e.e term is constant within a row and dropped on
  *     both engines; dot products are the sequential-fold
  *     [[VectorFns.dot]] kernel, bit-matching DuckDB's
  *     list_dot_product (the q_dedup_embedding parity);
  *   - recentering goes through DECIMAL(28,10) element sums (the
  *     labelCentroids discipline) so centroid doubles are identical
  *     regardless of partial-aggregation order.
  *
  * Scale shape: centroids are driver-side bounded metadata (k * 64
  * doubles — the IVF centroid-broadcast discipline), so one Lloyd
  * assignment is a ZERO-join, ZERO-shuffle codegen'd projection
  * (`least` over k (score, cid) structs); one recenter is a single
  * groupBy(cluster) of decimal sums. Per iteration: one scan + one
  * k-row-bounded shuffle. For k beyond broadcast reach, the ANN
  * ladder (IVF) is the assignment tier instead. */
object Clustering {

  val Dim = 64

  /** Sequential fold — must match [[VectorFns.dot]]'s loop (and
    * DuckDB's list_dot_product) so driver-side c.c equals what either
    * engine computes over the same doubles. */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** One Lloyd assignment as a pure projection (see object doc). */
  private def assign(embeddings: DataFrame,
                     centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val e = transform(col("embedding"), x => x.cast(DoubleType))
    val scored: Seq[Column] = centroids.map { case (cid, c) =>
      struct(
        (lit(dotSeq(c, c)) - lit(2.0) * VectorFns.dot(e, typedlit(c.toSeq)))
          .as("score"),
        lit(cid).as("cid"))
    }
    val best = if (scored.size == 1) scored.head else least(scored: _*)
    embeddings.select(col("vec_id"), best.getField("cid").as("cluster"))
  }

  /** Exact-decimal per-cluster element means, collected (bounded:
    * k * Dim doubles). Empty clusters simply vanish — later
    * assignments choose among the survivors, same as the oracle's
    * GROUP BY. */
  private def recenter(embeddings: DataFrame, asg: DataFrame): Seq[(Int, Array[Double])] = {
    val sums = (0 until Dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast(DoubleType)
        .cast(DecimalType(28, 10))).cast(DoubleType).as(s"s$i"))
    embeddings.join(asg, Seq("vec_id"))
      .groupBy(col("cluster"))
      .agg(sums.head, sums.tail :+ count(lit(1)).as("n"): _*)
      .collect()
      .map { r =>
        val n = r.getLong(Dim + 1)
        (r.getInt(0), Array.tabulate(Dim)(i => r.getDouble(i + 1) / n))
      }.sortBy(_._1).toSeq
  }

  /** (vec_id, cluster) after `iters` Lloyd iterations from the
    * deterministic seed set (the k lowest vec_ids). */
  def kmeansAssign(embeddings: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    require(k >= 2 && iters >= 1)
    val seeds = embeddings.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble).toArray)
      }.toSeq
    var cent = seeds
    var asg = assign(embeddings, cent)
    for (_ <- 2 to iters) {
      cent = recenter(embeddings, asg)
      asg = assign(embeddings, cent)
    }
    asg
  }

  /** SemDeDup: k-means the space, then flag every vector that has a
    * LOWER-id near-duplicate (unit-cosine >= tau) in its OWN cluster —
    * the keep-first discipline of the exact-dedup family, bounded by
    * the clustering (a cross-cluster near-dup pair survives; that is
    * SemDeDup's published recall tradeoff, and the oracle replicates
    * the same cluster-bounded search, so green = the algorithm, not an
    * approximation of brute force). Returns (vec_id, cluster, is_dup).
    *
    * Pair work is (n/k)^2 per cluster; the join carries unit vectors
    * only after the cluster-equality blocking — never an all-pairs
    * product. */
  def semDedup(embeddings: DataFrame, k: Int = 32, tau: Double = 0.45,
               iters: Int = 2): DataFrame = {
    val asg = kmeansAssign(embeddings, k, iters)
    val un = embeddings
      .select(col("vec_id"), Similarity.unitVector(col("embedding")).as("u"))
      .join(asg, Seq("vec_id"))
    val a = un.select(col("cluster"), col("vec_id").as("id_a"), col("u").as("ua"))
    val b = un.select(col("cluster"), col("vec_id").as("id_b"), col("u").as("ub"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFns.dot(col("ua"), col("ub")) >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    asg.join(dropped.withColumn("is_dup", lit(true)), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
      .orderBy("vec_id")
  }
}
