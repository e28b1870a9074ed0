package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over `embeddings.embedding: array<float>`.
  *
  * Baseline: brute-force cosine top-k — one scan, per-partition top-k
  * folded by TakeOrderedAndProject, no shuffle of the vectors.
  * Scale path: sign-random-projection LSH buckets; the query probes only
  * its own bucket(s), so a 100 TB corpus is reduced to a bucket-sized
  * candidate set. Both paths use double-precision higher-order-function
  * arithmetic (zip_with + aggregate) — codegen'd, no UDF, and the
  * sequential fold makes results bit-reproducible cross-engine.
  */
object Similarity {

  /** Sequential-order double dot product of two float/double vectors —
    * the fused DotProductExpr kernel (bit-identical to the HOF spelling
    * `aggregate(zip_with(a,b,(x,y)->x*y),0d,(acc,v)->acc+v)` but one
    * primitive loop, no per-pair intermediate arrays). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFns.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** X3 baseline: exact cosine top-k of every vector vs the query
    * vector (here: the corpus vector with id = queryId, broadcast as a
    * 1-row dim). */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("q_emb"))
    val cos = cosine(col("embedding"), col("q_emb"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cos.as("raw_cos"))
      .orderBy(col("raw_cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw_cos"), 4).as("cos_sim"))
  }

  /** Recall-gate arithmetic in ONE job: total exact rows and how many
    * have a match in `found` on `keys` (the gates used to run a count()
    * for each — two full jobs per gate, and the gates run in every ANN
    * row of the bench). `found` is deduped on the keys first so the
    * left join cannot multiply exact rows. */
  private[graft] def totalAndHits(exact: DataFrame, found: DataFrame,
                                  keys: Seq[String]): (Long, Long) = {
    val f = found.select(keys.map(col): _*).dropDuplicates(keys)
      .withColumn("__hit", lit(1))
    val r = exact.select(keys.map(col): _*)
      .join(f, keys, "left")
      .agg(count(lit(1)), count(col("__hit"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Seeded random hyperplanes for sign-LSH: numPlanes x dim doubles. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id = packed sign bits of the vector against each plane. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(emb, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The LSH signature plan: numTables sign-LSH bucket ids per vector
    * (hyperplane family t seeded 42+t). This IS the index schema —
    * AnnIndex.buildLsh persists exactly this projection, and both the
    * single-query and the batch probes consume it, so the corpus is
    * hashed once per build, not once per query. */
  def lshSignatureTable(embeddings: DataFrame, numPlanes: Int, numTables: Int): DataFrame =
    embeddings.select(
      col("vec_id"), col("embedding"),
      array((0 until numTables).map(t =>
        lshBucket(col("embedding"), hyperplanes(numPlanes, 64, seed = 42L + t))): _*)
        .as("buckets"))

  /** X3 scale path: ANN via L-tables sign-LSH with Hamming-<=1
    * multiprobe — `numTables` INDEPENDENT hyperplane families each
    * contribute the query's bucket plus every bucket one sign flip
    * away; exact cosine re-ranks only the candidate union. Missing a
    * true neighbor requires >= 2 plane disagreements in EVERY table, so
    * recall compounds as 1-(1-r)^L while probe cost stays
    * L*(numPlanes+1) buckets of a bucketed table — never the corpus.
    * Recall/cost tunes with (numPlanes, numTables) without touching
    * correctness (the re-rank is exact). Ad-hoc spelling: hashes the
    * corpus inline; production probes go through the persisted
    * signature table (AnnIndex.lshSignatures + FromSignatures). */
  def annLshTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
                 numPlanes: Int = 4, numTables: Int = 3): DataFrame =
    annLshTopKFromSignatures(
      lshSignatureTable(embeddings, numPlanes, numTables), queryId, k, numTables)

  /** Single-query ANN probe over a (vec_id, embedding, buckets)
    * signature table (persisted or inline). */
  def annLshTopKFromSignatures(sig: DataFrame, queryId: Long = 0L, k: Int = 10,
                               numTables: Int = 3): DataFrame = {
    val q = sig.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("buckets").as("q_buckets"))
    val anyTableHit = (0 until numTables)
      .map(t => bit_count(element_at(col("buckets"), t + 1)
        .bitwiseXOR(element_at(col("q_buckets"), t + 1))) <= 1)
      .reduce(_ || _)
    sig
      .join(broadcast(q), col("vec_id") =!= queryId && anyTableHit)
      .select(col("vec_id"), cosine(col("embedding"), col("q_emb")).as("raw_cos"))
      .orderBy(col("raw_cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw_cos"), 4).as("cos_sim"))
  }

  /** Probe keys covering Hamming distance <= 1 from the bucket code. */
  private def probeKeys(bucket: Column, numPlanes: Int): Column =
    array((bucket +: (0 until numPlanes).map(i =>
      bucket.bitwiseXOR(lit(1L << i)))): _*)

  /** L2-normalized copy of the vector (double precision) — pair work
    * then costs ONE dot product instead of three. */
  def unitVector(emb: Column): Column = {
    val n = norm(emb)
    transform(emb, x => x.cast(DoubleType) / n)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-blocked self-join
    * (equality join on (table, bucket) keys, never O(n^2)), verified by
    * exact cosine >= threshold.
    *
    * Recall comes from the classic L-tables construction: numTables
    * INDEPENDENT sign-LSH families (seeded hyperplane sets) each
    * contribute candidates, and the left side additionally probes all
    * buckets within Hamming 1 of its own. A pair at cosine theta
    * disagrees on one plane with p = arccos(theta)/pi (~0.35 at the
    * 0.45 threshold); missing it requires >= 2 disagreements in EVERY
    * table — P[miss] ~ (p^2)^L ~ 1e-3 at threshold with L=3, and far
    * lower for real near-dups. Tuning L trades work for recall without
    * touching correctness (exact verification gates every candidate).
    *
    * Cost shape: vectors are L2-normalized ONCE per row (so a pair is a
    * single dot product), and candidate ID pairs are de-duplicated
    * BEFORE the vectors are re-attached — the probe-multiplicity
    * duplicates never reach the arithmetic, and the wide vector columns
    * never ride through the dedup shuffle. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.45,
                            numPlanes: Int = 0, numTables: Int = 3): DataFrame = {
    // numPlanes <= 0 -> auto-size to ~500 vectors per bucket: with k
    // planes there are 2^k buckets, and the in-bucket self-join does
    // O(n^2 / 2^k) candidate work — a FIXED k degenerates toward
    // all-pairs as the corpus grows. k = log2(n/500) keeps per-bucket
    // occupancy (and so the join) flat at any scale; one count() job.
    val planes0 =
      if (numPlanes > 0) numPlanes
      else math.max(2,
        math.ceil(math.log(math.max(embeddings.count(), 1L) / 500.0) / math.log(2)).toInt)
    // Four consumers below (both self-join sides + both verification
    // re-attaches) would each re-run the numTables x numPlanes
    // plane-projection arithmetic per row; the bucketed table is the
    // LSH index itself — materialize it once.
    val base = embeddings.select(
      col("vec_id"),
      unitVector(col("embedding")).as("unit"),
      array((0 until numTables).map(t =>
        lshBucket(col("embedding"), hyperplanes(planes0, 64, seed = 42L + t))): _*)
        .as("buckets"))
      .localCheckpoint()

    // (table, bucket) keys only — the unit vectors stay behind on
    // `base` and are re-attached per deduped pair, not per probe row.
    val b = base.select(col("vec_id"),
      posexplode(col("buckets")).as(Seq("table", "bucket")))

    val l = b.select(col("vec_id").as("id_a"), col("table"),
      explode(probeKeys(col("bucket"), planes0)).as("probe"))
    val r = b.select(col("vec_id").as("id_b"), col("table"), col("bucket").as("probe"))

    val candidates = l.join(r, Seq("table", "probe"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(base.select(col("vec_id").as("id_a"), col("unit").as("unit_a")), Seq("id_a"))
      .join(base.select(col("vec_id").as("id_b"), col("unit").as("unit_b")), Seq("id_b"))
      .withColumn("raw_cos", dot(col("unit_a"), col("unit_b")))
      .filter(col("raw_cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("raw_cos"), 4).as("cos_sim"))
      .orderBy("id_a", "id_b")
  }

  /** Batch ANN: top-k corpus neighbors for EVERY query in a query SET,
    * as one bucket join — the many-queries shape of training-data work
    * (label every training doc with its nearest eval neighbors,
    * retrieve per-prompt context). Per-query probing (annLshTopK) runs
    * one job per query — fine for ad-hoc lookups, unusable for 10^6
    * queries; here both sides are bucketed by the same L hyperplane
    * families, the query side probes its bucket plus every Hamming-1
    * neighbor, candidates are deduped as bare (query, corpus) ID pairs
    * BEFORE the unit vectors re-attach, exact cosine re-ranks, and
    * row_number()<=k per query plans through the TopKPerKey heap
    * operator (no full sort before the key exchange).
    *
    * Scale shape: the join carries (table, bucket, id) tuples only —
    * never vectors; candidate volume per query is L*(numPlanes+1)
    * buckets of corpus-side occupancy, so total work is
    * O(|Q| * bucketSize * L), not O(|Q| * |corpus|). */
  def annBatchTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
                   numPlanes: Int = 4, numTables: Int = 6): DataFrame = {
    // numTables default = 6, NOT 3: 6 is the configuration the batch
    // recall gate certifies at >= 0.9 (3 tables measured ~0.5 batch
    // recall at sf0.01) — the default config and the certified config
    // must be the same thing, or the certificate is theater.
    // numPlanes <= 0 -> auto-size to ~500 corpus vectors per bucket,
    // the same degeneracy guard as embeddingNearDupPairs: a FIXED
    // plane count drifts toward scanning the whole corpus per query as
    // it grows; k = log2(n/500) keeps per-bucket occupancy (and so
    // per-query candidate work) flat at any scale. One count() job.
    val planes0 =
      if (numPlanes > 0) numPlanes
      else math.max(2,
        math.ceil(math.log(math.max(embeddings.count(), 1L) / 500.0) / math.log(2)).toInt)
    // ad-hoc spelling: signature tables materialized once per call —
    // each feeds a key explode AND a vector re-attach. Production runs
    // read the PERSISTED corpus signatures (AnnIndex.lshSignatures) and
    // only the query side is hashed fresh.
    annBatchTopKFromSignatures(
      lshSignatureTable(embeddings, planes0, numTables).localCheckpoint(),
      lshSignatureTable(queries, planes0, numTables).localCheckpoint(),
      k, planes0)
  }

  /** Batch ANN over (vec_id, embedding, buckets) signature tables: the
    * bucket join carries (table, bucket, id) only, candidate ID pairs
    * dedup BEFORE unit vectors re-attach, exact cosine re-ranks,
    * row_number()<=k plans through the TopKPerKey heap operator. */
  def annBatchTopKFromSignatures(corpusSig: DataFrame, querySig: DataFrame,
                                 k: Int = 5, numPlanes: Int = 4): DataFrame = {
    val corpusKeys = corpusSig.select(col("vec_id"),
      posexplode(col("buckets")).as(Seq("table", "bucket")))
    val queryKeys = querySig.select(col("vec_id").as("query_id"),
      posexplode(col("buckets")).as(Seq("table", "qbucket")))
      .select(col("query_id"), col("table"),
        explode(probeKeys(col("qbucket"), numPlanes)).as("bucket"))

    val candidates = queryKeys.join(corpusKeys, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id")

    val scored = candidates
      .join(querySig.select(col("vec_id").as("query_id"),
        unitVector(col("embedding")).as("q_unit")), Seq("query_id"))
      .join(corpusSig.select(col("vec_id"),
        unitVector(col("embedding")).as("c_unit")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), dot(col("q_unit"), col("c_unit")).as("raw_cos"))

    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("raw_cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("raw_cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Exact batch top-k (brute force): every query scored against the
    * whole corpus, top-k per query — the oracle-recomputable truth the
    * batch ANN gate compares against. The query side broadcasts (a
    * probe set is small next to the corpus), so the corpus scan never
    * shuffles; top-k per query again plans through TopKPerKey. */
  def batchTopKExact(embeddings: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      unitVector(col("embedding")).as("q_unit")))
    val scored = embeddings
      .select(col("vec_id"), unitVector(col("embedding")).as("c_unit"))
      .join(q, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), dot(col("q_unit"), col("c_unit")).as("raw_cos"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("raw_cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("raw_cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Oracle gate for batch ANN (the annRecallGate pattern, batched):
    * output = the exact brute-force batch top-k (fully SQL-
    * recomputable), with `batch_recall_ok` TRUE iff the ANN bucket
    * join found >= `bound` of all exact (query, neighbor) pairs.
    * numPlanes/numTables are forwarded to the gated annBatchTopK run
    * (defaults = annBatchTopK's defaults), so the certificate covers
    * EXACTLY the configuration the caller names — not a silently
    * stronger one. */
  def annBatchRecallGate(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
                         bound: Double = 0.9,
                         numPlanes: Int = 4, numTables: Int = 6): DataFrame = {
    val exact = batchTopKExact(embeddings, queries, k).localCheckpoint()
    val (total, hits) = totalAndHits(exact,
      annBatchTopK(embeddings, queries, k, numPlanes, numTables),
      Seq("query_id", "vec_id"))
    exact.withColumn("batch_recall_ok",
      lit(total == 0L || hits.toDouble / total >= bound))
  }

  /** Batch recall gate over a PERSISTED corpus signature table: the
    * query set is `corpusSig` filtered by `queryPredicate` (the
    * retrieval-from-own-corpus shape), so the batch probe touches only
    * the index artifact — the corpus is not re-hashed. Output rows are
    * still the exact brute-force batch top-k (SQL-recomputable) from
    * `embeddings`. */
  def annBatchRecallGateFromSignatures(embeddings: DataFrame, corpusSig: DataFrame,
                                       queryPredicate: Column, k: Int = 5,
                                       bound: Double = 0.9, numPlanes: Int = 4): DataFrame = {
    val exact = batchTopKExact(embeddings, embeddings.filter(queryPredicate), k)
      .localCheckpoint()
    val ann = annBatchTopKFromSignatures(
      corpusSig, corpusSig.filter(queryPredicate), k, numPlanes)
    val (total, hits) = totalAndHits(exact, ann, Seq("query_id", "vec_id"))
    exact.withColumn("batch_recall_ok",
      lit(total == 0L || hits.toDouble / total >= bound))
  }

  /** Deterministic seeded-sample centroid pick for IVF "training": the
    * nCells corpus vectors with the smallest murmur3(vec_id) — a
    * hash-sample, so the picks are spread uniformly over the corpus
    * REGARDLESS of how it is ordered or clustered by id. (The previous
    * first-nCells pick collapses on an id-sorted/clustered corpus: all
    * centroids land in one cluster and probe recall craters.) One
    * TakeOrderedAndProject job over (hash, id) — k rows to the driver,
    * which is inherent to centroid training. */
  private[graft] def ivfCentroids(embeddings: DataFrame, nCells: Int): Array[(Long, Array[Double])] =
    embeddings
      .select(col("vec_id"), unitVector(col("embedding")).as("u"))
      .orderBy(hash(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Hash-sampled seeds + `lloydIters` distributed Lloyd refinement
    * passes (assign via broadcast-join argmax -> per-cell DECIMAL-exact
    * mean -> re-normalize; fully distributed — see
    * AnnIndex.trainCentroids). Returned in cell order (cell i =
    * index i-1). Refined centroids sit at their cells' centers instead
    * of on arbitrary sample points, so cell radii shrink and a given
    * nProbe covers more of the query's true neighborhood
    * (SimilaritySpec pins the recall improvement on the clustered
    * corpus). */
  private[graft] def ivfCentroidsRefined(embeddings: DataFrame, nCells: Int,
                                         lloydIters: Int = 1): Array[Array[Double]] = {
    val units = embeddings
      .select(col("vec_id"), unitVector(col("embedding")).as("u"))
      .localCheckpoint()
    AnnIndex.trainCentroids(units, AnnIndex.seedCentroids(embeddings, nCells), lloydIters)
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
  }

  /** X3 alternative scale path: IVF (inverted-file) ANN. "Training" =
    * a deterministic hash-sample of nCells corpus vectors refined by
    * `lloydIters` distributed Lloyd passes. Ad-hoc spelling: builds a
    * throwaway index (centroid table + cell-partitioned corpus) in a
    * temp dir and probes it — ONE plan shape for demo and production
    * (AnnIndex.ivfDir memoizes the build for reuse across queries);
    * centroids are broadcast rows, never nCells x dim plan literals,
    * and the probe reads only the nProbe nearest cell partitions. */
  def annIvfTopK(embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
                 nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 1): DataFrame = {
    val spark = embeddings.sparkSession
    // Memoized per (session, input plan, params) via the shared
    // artifact cache — repeated ad-hoc calls on a long-lived driver pay
    // the build once, and the temp tree is reclaimed by the cache's
    // shutdown hook (deleteOnExit silently skips non-empty dirs).
    val key = s"ivf-adhoc:${embeddings.queryExecution.analyzed.semanticHash()}:$nCells:$lloydIters"
    val dir = AnnIndex.artifact(spark, key)(
      AnnIndex.buildIvf(spark, embeddings, _, nCells, lloydIters))
    AnnIndex.probeIvf(spark, dir, embeddings, queryId, k, nProbe)
  }

  /** Oracle gate for the ANN paths (the q_approx_distinct pattern for
    * non-portable internals): the OUTPUT rows are the exact brute-force
    * top-k — fully recomputable by the SQL oracle — and the ANN result
    * enters as a boolean `recall_at_10_ok` column, TRUE iff the ANN
    * candidate set covers >= `bound` of the true top-k. A recall
    * regression in the LSH/IVF index flips the column and breaks the
    * hash match. The recall join is k rows — driver-side by nature. */
  def annRecallGate(embeddings: DataFrame, ann: DataFrame, queryId: Long = 0L,
                    k: Int = 10, bound: Double = 0.9): DataFrame = {
    val brute = bruteForceTopK(embeddings, queryId, k).localCheckpoint()
    // Denominator = the ACHIEVABLE top-k (corpora with < k non-query
    // vectors cap the brute-force result below k; dividing by the
    // constant would then read recall < 1 even for a perfect index).
    val (denom, hits) = totalAndHits(brute, ann, Seq("vec_id"))
    brute.withColumn("recall_at_10_ok",
      lit(denom == 0L || hits.toDouble / denom >= bound))
  }

  /** Embedding dedup APPLIED — the vector-side sibling of
    * Dedup.applyDedup: LSH-blocked near-dup pairs -> connected
    * components -> one canonical survivor (the component's min vec_id)
    * per near-dup group, with its label and group size. This is what a
    * pipeline materializes before indexing/training on embeddings;
    * pairs and clusters are the intermediate evidence. Reuses the
    * text-side CC machinery verbatim (same join+min dataflow). */
  def embeddingDedupApply(embeddings: DataFrame, threshold: Double = 0.45,
                          numTables: Int = 6): DataFrame = {
    val pairs = embeddingNearDupPairs(embeddings, threshold, numTables = numTables)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val labels = Dedup.connectedComponents(
      embeddings.select(col("vec_id").as("doc_id")), pairs)
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("group_size"))
    embeddings.select(col("vec_id"), col("label"))
      .join(labels.select(col("doc_id").as("vec_id"), col("component")), Seq("vec_id"))
      .filter(col("vec_id") === col("component"))
      .join(sizes, Seq("component"))
      .select(col("vec_id"), col("label"), col("group_size"))
      .orderBy("vec_id")
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the
    * n-gram `Curation.decontaminate`: flag every training vector whose
    * cosine to ANY eval vector clears `threshold` (paraphrased
    * benchmark leakage that exact n-gram overlap cannot see). The eval
    * set is carved deterministically from the corpus (every 40th
    * vector), mirroring the text-side convention.
    *
    * Scale shape: the eval side is tiny next to the corpus (real
    * benchmark suites are ~10^5 vectors vs 10^9+ training vectors), so
    * it BROADCASTS and the corpus scan is map-side only — per-vector
    * work is |eval| fused dot products, no shuffle but the per-vector
    * aggregate. For 10^5+ eval vectors, route through the batch ANN
    * index instead (annBatchTopK / batchProbeIvfSq) and threshold the
    * results — same report, sublinear probe. max/count are
    * order-independent aggregates, so the report is bit-stable. */
  def embeddingDecontaminate(embeddings: DataFrame,
                             threshold: Double = 0.4): DataFrame = {
    val eval0 = embeddings.filter(col("vec_id") % 40 === 0)
      .select(unitVector(col("embedding")).as("e_unit"))
    embeddings.filter(col("vec_id") % 40 =!= 0)
      .select(col("vec_id"), unitVector(col("embedding")).as("t_unit"))
      .crossJoin(broadcast(eval0))
      .select(col("vec_id"), dot(col("t_unit"), col("e_unit")).as("raw_cos"))
      .groupBy(col("vec_id"))
      .agg(
        sum(when(col("raw_cos") >= threshold, 1L).otherwise(0L)).as("n_eval_hits"),
        round(max(col("raw_cos")), 4).as("max_eval_cos"))
      .withColumn("contaminated", col("n_eval_hits") > 0)
      .orderBy("vec_id")
  }

  /** Hard-negative mining — the batch retrieval shape contrastive
    * embedding training feeds on: for every anchor (query) vector, the
    * top-k most-similar vectors with a DIFFERENT label. High-cosine
    * different-label neighbors are exactly the pairs a contrastive
    * loss learns most from (easy negatives contribute ~zero gradient).
    * Same plan as `batchTopKExact` — one broadcast anchor join, per-
    * anchor rank through the window-to-TopKPerKey rewrite — plus the
    * label-mismatch predicate riding the join (no post-filter: a
    * filtered top-k would under-fill). At corpus scale, route through
    * the batch IVF probe with an expanded k and label-filter the
    * candidate pool before the final rank — same recall-gate
    * discipline as the other index rows. */
  def hardNegatives(embeddings: DataFrame, queryPredicate: Column,
                    k: Int = 5): DataFrame = {
    val q = broadcast(embeddings.filter(queryPredicate)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        unitVector(col("embedding")).as("q_unit")))
    import org.apache.spark.sql.expressions.Window
    embeddings
      .select(col("vec_id"), col("label"), unitVector(col("embedding")).as("c_unit"))
      .join(q, col("query_id") =!= col("vec_id") && col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id"), col("label"),
        dot(col("q_unit"), col("c_unit")).as("raw_cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("raw_cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("label").as("neg_label"), round(col("raw_cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Per-label centroid + distance profile — the "cluster summary"
    * aggregation shape over vector columns. Element sums go through
    * DECIMAL(28,10) (a deterministic rounding of each float, summed
    * exactly) so the centroid doubles are identical regardless of
    * partial-aggregation order — raw double sums would drift in the
    * last ulp run-to-run. */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    val dim = 64
    val sums = (0 until dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast(DoubleType)
        .cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast(DoubleType).as(s"s$i"))
    val n = count(lit(1)).as("n_vecs")
    embeddings
      .groupBy(col("label"))
      .agg(sums.head, sums.tail :+ n: _*)
      .select(col("label"), col("n_vecs"),
        array((0 until dim).map(i => col(s"s$i") / col("n_vecs")): _*).as("centroid"))
      .orderBy("label")
  }
}
