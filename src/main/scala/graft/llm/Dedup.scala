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

  /** Word n-gram shingles, distinct, as array<string>. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature from a column of 31-bit shingle hashes:
    * numHashes linear permutations (a_i * h + b_i), min per permutation.
    * Coefficients and hashes stay within 31 bits so the product fits a
    * long WITHOUT overflow — Spark 4 runs ANSI mode by default, where
    * silent wraparound is an error. Pure higher-order functions —
    * codegen, no UDF. */
  def shingleHashes31(shingleArr: Column): Column =
    transform(shingleArr, s => ColumnFns.fnv1a64(s).bitwiseAND(lit(0x7fffffffL)))

  def minhashSignature(hashes31: Column, numHashes: Int): Column = {
    val rnd = new java.util.Random(42)
    def c31() = (rnd.nextLong() & 0x7fffffffL) | 1L
    val coeffs = Seq.fill(numHashes)((c31(), c31()))
    array(coeffs.map { case (a, b) =>
      array_min(transform(hashes31, h => h * lit(a) + lit(b)))
    }: _*)
  }

  /** X2 MinHash-LSH near-dup pairs.
    *
    * bands x rowsPerBand = numHashes; a pair collides if any band's
    * row-slice matches exactly. Candidates are verified with EXACT
    * n-gram Jaccard (array_intersect/array_union on the shingle sets),
    * so false positives cost work but never correctness; band/row
    * choice only affects recall (P[miss] = (1-j^r)^b).
    */
  def minhashPairs(
      documents: DataFrame,
      shingleSize: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = documents
      .select(col("doc_id"), shingles(col("text"), shingleSize).as("sh"))
      .withColumn("hs", shingleHashes31(col("sh")))
      .withColumn("sig", minhashSignature(col("hs"), numHashes))

    // (doc_id, band_idx, band_hash): hash the band's slice to one long.
    val banded = withSig.select(
      col("doc_id"), col("sh"),
      posexplode(
        array((0 until bands).map { b =>
          ColumnFns.fnv1a64(
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast(StringType))
        }: _*)).as(Seq("band_idx", "band_hash")))

    val l = banded.select(
      col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = banded.select(
      col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))

    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard for a candidate pair set — exposed standalone
    * (X2 verification kernel, also the brute-force oracle in tests). */
  def ngramJaccardAllPairs(documents: DataFrame, shingleSize: Int = 3,
                           threshold: Double = 0.5): DataFrame = {
    val sh = documents.select(col("doc_id"), shingles(col("text"), shingleSize).as("sh"))
    val l = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.crossJoin(r)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
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
