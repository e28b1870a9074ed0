package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("cosine expression matches a hand computation") {
    val df = Seq(
      (1L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (2L, Seq(1f, 1f, 0f), Seq(1f, 0f, 0f))
    ).toDF("id", "a", "b")
      .select(col("id"), Similarity.cosine(col("a"), col("b")).as("cos"))
    val m = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 0.0)
    assert(math.abs(m(2L) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("brute-force top-k is ordered by cosine and excludes the query id") {
    val top = Similarity.bruteForceTopK(emb, 0L, 10).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.toSeq == sims.sorted.reverse.toSeq)
  }

  test("ANN multiprobe recall vs brute force is substantial on the fixture") {
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val ann = Similarity.annLshTopK(emb, 0L, 10, numPlanes = 4).collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low; ann=$ann exact=$exact")
  }

  test("IVF ANN probes its cells and recalls a substantial top-k fraction") {
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val ivf = Similarity.annIvfTopK(emb, 0L, 10, nCells = 16, nProbe = 4).collect()
    assert(ivf.length == 10)
    val recall = (exact & ivf.map(_.getLong(0)).toSet).size.toDouble / exact.size
    assert(recall >= 0.2, s"ivf recall $recall; got ${ivf.map(_.getLong(0)).toSeq}")
    val sims = ivf.map(_.getDouble(1))
    assert(sims.toSeq == sims.sorted.reverse.toSeq)
  }

  // 200 vectors in 4 well-separated clusters, SORTED by cluster id —
  // the adversarial layout where a first-nCells pick put every centroid
  // in cluster 0 (ids {0..15} = first quartile only) and probe recall
  // cratered.
  private lazy val clusteredCorpus = {
    val rows = (0 until 200).map { i =>
      val cluster = i / 50
      val v = Array.tabulate(64) { d =>
        val base = if (d >= cluster * 16 && d < cluster * 16 + 16) 1.0f else 0.0f
        base + 0.01f * (((i * 31 + d * 7) % 11) - 5)  // deterministic jitter
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF centroid hash-sample spreads over an id-clustered corpus") {
    val clustered = clusteredCorpus
    val centIds = Similarity.ivfCentroids(clustered, 16).map(_._1)
    assert(centIds.length == 16)
    assert(centIds.toSet != (0L until 16L).toSet, "degenerate first-n pick")
    val quartiles = centIds.map(_ / 50).toSet
    assert(quartiles.size >= 3, s"centroids cover only clusters $quartiles")

    // end-to-end: a query in the LAST cluster recalls its true top-10
    val exact = Similarity.bruteForceTopK(clustered, 199L, 10).collect().map(_.getLong(0)).toSet
    val ivf = Similarity.annIvfTopK(clustered, 199L, 10, nCells = 16, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered-corpus recall $recall; ivf=$ivf exact=$exact")
  }

  test("one Lloyd pass tightens IVF cells: clustered recall margin at a low nProbe") {
    val clustered = clusteredCorpus
    val exact = Similarity.bruteForceTopK(clustered, 199L, 10).collect().map(_.getLong(0)).toSet
    def recallAt(iters: Int): Double = {
      val ivf = Similarity.annIvfTopK(clustered, 199L, 10,
        nCells = 16, nProbe = 2, lloydIters = iters)
        .collect().map(_.getLong(0)).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val raw = recallAt(0)
    val refined = recallAt(1)
    // Refined centroids sit at cell centers instead of on arbitrary
    // sample points, so the 2 probed cells cover more of the query's
    // cluster: the margin must not regress and must clear the gate on
    // its own.
    assert(refined >= raw, s"Lloyd pass regressed recall: $raw -> $refined")
    assert(refined >= 0.9, s"refined nProbe=2 recall $refined below gate")

    // The refinement is deterministic: two independent trainings agree
    // element-for-element (decimal sums + fixed argmax tie-break).
    val c1 = Similarity.ivfCentroidsRefined(clustered, 16, 1)
    val c2 = Similarity.ivfCentroidsRefined(clustered, 16, 1)
    assert(c1.length == 16 && c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("batch ANN: one bucket join serves every query, gated vs exact batch top-k") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val nQueries = queries.count()
    val gated = Similarity.annBatchRecallGate(emb, queries).collect()
    // exact k=5 rows per query, all carrying a TRUE recall gate
    assert(gated.length == nQueries * 5, s"expected ${nQueries * 5} rows, got ${gated.length}")
    assert(gated.map(_.getBoolean(4)).toSet == Set(true), "batch recall gate must hold")
    // ranks are 1..5 per query
    gated.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5), s"query $q ranks")
    }
    // the exact batch side agrees with the single-query brute force
    val single = Similarity.bruteForceTopK(emb, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batchQ0 = gated.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(batchQ0 == single, s"batch vs single brute force: $batchQ0 vs $single")
  }

  test("annRecallGate emits the exact top-10 plus a recall boolean") {
    val gated = Similarity.annRecallGate(emb, Similarity.annLshTopK(emb)).collect()
    assert(gated.length == 10)
    val brute = Similarity.bruteForceTopK(emb).collect()
    assert(gated.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      brute.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // all rows carry the same verdict
    assert(gated.map(_.getBoolean(2)).toSet.size == 1)
  }

  test("embedding near-dup pairs are symmetric-free, thresholded, verified") {
    val pairs = Similarity.embeddingNearDupPairs(emb, 0.45, 2).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.45)
    }
  }

  test("embedding dedup apply: one survivor per component, group sizes partition the corpus") {
    val out = Similarity.embeddingDedupApply(emb).collect()
    assert(out.map(_.getLong(2)).sum == emb.count(), "group sizes must partition")
    val pairs = Similarity.embeddingNearDupPairs(emb, numTables = 6)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comps = graft.llm.Dedup.connectedComponents(
      emb.select(col("vec_id").as("doc_id")), pairs)
      .select("component").distinct().count()
    assert(out.length.toLong == comps, "exactly one survivor per component")
    // survivors are their own component minimum (canonical = min id)
    assert(out.forall(r => r.getLong(2) >= 1L))
  }

  test("hard negatives: different-label top-k, exact vs brute force, rank contiguity") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.hardNegatives(emb, col("vec_id") % 50 === 2, k = 5).collect()
    assert(out.nonEmpty)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every negative's label differs from its anchor's
    out.foreach { r =>
      assert(labels(r.getLong(0)) != r.getInt(3),
        s"anchor ${r.getLong(0)} got a same-label negative")
      assert(r.getInt(3) == labels(r.getLong(2)), "neg_label must be the neighbor's label")
    }
    // ranks are 1..n contiguous per anchor
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"anchor $q ranks")
    }
    // exactness: drop same-label rows from the unfiltered exact batch
    // top-N and the hard-negative list must be its k-prefix
    val wide = Similarity.batchTopKExact(emb, emb.filter(col("vec_id") % 50 === 2), 200)
      .collect()
      .filter(r => labels(r.getLong(2)) != labels(r.getLong(0)))
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).take(5).map(_.getLong(2)).toSeq }
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val got = rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      assert(got == wide(q).take(got.size), s"anchor $q differs from brute force")
    }
  }

  test("label centroids have unit count-weighted means") {
    val cents = Similarity.labelCentroids(emb).collect()
    assert(cents.length == 10) // labels 0..9
    val total = cents.map(_.getLong(1)).sum
    assert(total == emb.count())
    cents.foreach(r => assert(r.getSeq[Double](2).length == 64))
  }
}
