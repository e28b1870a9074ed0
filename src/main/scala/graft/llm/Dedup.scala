package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnFns

/** Deduplication operators for training-data curation: exact,
  * keyed-keep-first, MinHash-LSH near-dup, SimHash near-dup.
  *
  * Scale design: every near-dup path is LSH-blocked — candidate pairs
  * come from equality joins on band/bucket keys, never from an O(n^2)
  * cross join. At 100 TB the band join shuffles only (band_key, doc_id,
  * signature) tuples, and AQE's skew-join handles hot buckets.
  */
object Dedup {

  /** X1 exact dedup, set semantics: one survivor (min id) per distinct
    * text + the duplicate count. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_id"), col("dup_count"))
      .orderBy("keep_id")

  /** X1 keyed keep-first: deterministic first-row-per-key by order
    * column — `dropDuplicates` with a defined winner
    * (row_number()=1 pattern, SURVEY §2.3 note on P9). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct 31-bit shingle-hash set per doc — the working currency of
    * both the LSH path and exact verification. The fused expression
    * (graft.functions.ShingleHashSet) hashes word n-grams without ever
    * materializing n-gram strings, and the band join / verification
    * shuffles carry compact int arrays — an order of magnitude lighter
    * on the wire at corpus scale. */
  def shingleHashSets(documents: DataFrame, shingleSize: Int): DataFrame =
    documents.select(
      col("doc_id"),
      graft.functions.VectorFns.shingleHashSet(TextOps.tokens(col("text")), shingleSize).as("hs"))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** X2 MinHash-LSH near-dup pairs.
    *
    * bands x rowsPerBand = numHashes; a pair becomes a candidate if any
    * band's row-slice matches exactly, and every candidate is verified
    * with EXACT hashed-shingle Jaccard — false positives cost work but
    * never correctness; band/row choice only affects recall
    * (P[miss] = (1-j^r)^b). The signature is computed by the fused
    * ShingleMinHash expression in one pass over the tokens. */
  def minhashPairs(
      documents: DataFrame,
      shingleSize: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val hashed = shingleHashSets(documents, shingleSize)
    val withSig = documents.select(
      col("doc_id"),
      graft.functions.VectorFns
        .shingleMinHash(TextOps.tokens(col("text")), shingleSize, numHashes)
        .as("sig"))

    // (band_idx, band_hash, doc_id) only — the join never carries the
    // shingle sets; candidates are re-joined to them after de-dup.
    val banded = withSig.select(
      col("doc_id"),
      posexplode(
        array((0 until bands).map { b =>
          ColumnFns.fnv1a64(
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast(StringType))
        }: _*)).as(Seq("band_idx", "band_hash")))

    val candidates = banded.as("l")
      .join(banded.as("r"), Seq("band_idx", "band_hash"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .join(hashed.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(hashed.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard over all pairs (brute-force oracle for the
    * LSH path in tests; the verification kernel shares `jaccard`).
    * Same hashed-shingle currency as minhashPairs so the two agree
    * exactly. */
  def ngramJaccardAllPairs(documents: DataFrame, shingleSize: Int = 3,
                           threshold: Double = 0.5): DataFrame = {
    val sh = shingleHashSets(documents, shingleSize)
    val l = sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val r = sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    l.crossJoin(r)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** X2 SimHash near-dup: 64-bit simhash, blocked on 4x16-bit chunks
    * (any pair within Hamming distance 3 shares at least one exact
    * 16-bit chunk — pigeonhole), verified with exact Hamming distance.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sims = documents.select(
      col("doc_id"),
      ColumnFns.simhash64(TextOps.tokens(col("text"))).as("sim"))
    val chunked = sims.select(
      col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL))
      }: _*)).as(Seq("chunk_idx", "chunk_val")))

    val l = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val r = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("sim").as("sim_b"))

    l.join(r, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
