package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE vocabulary induction — the "train the tokenizer"
  * pass of a pre-training pipeline, run over the corpus itself.
  *
  * Representation: each distinct word becomes a SPACED SYMBOL STRING
  * (`"hello"` → `" h e l l o "`) carrying its corpus frequency. One
  * merge round is then two relational steps:
  *
  *   1. pair counting — explode adjacent symbol pairs (a zip of the
  *      symbol array with its own tail) weighted by word frequency,
  *      and hash-aggregate `(left, right) → Σ freq`. This is the only
  *      shuffle per round, and it shuffles PAIR COUNTS (vocabulary-
  *      sized), never the corpus;
  *   2. merge application — a single left-to-right non-overlapping
  *      `replace(s, " l r ", " lr ")` over the spaced strings. Plain
  *      string `replace` has identical semantics in Spark
  *      (`UTF8String.replace`) and ANSI SQL engines, which is what
  *      makes the whole training replayable as SQL — the operator's
  *      contract is exactly that single-pass semantic.
  *
  * The driver holds ONE row per round (the argmax pair — ties broken
  * by frequency desc, then binary string order), i.e. the learned
  * merge table itself: the same O(nMerges) driver state a production
  * distributed BPE trainer keeps. The working vocabulary is
  * `localCheckpoint`ed between rounds so plans stay round-local
  * instead of accreting `2^rounds` lineage.
  *
  * Scale shape: the corpus is scanned ONCE (word histogram); every
  * round after that touches only the distinct-word table, which is
  * orders of magnitude smaller than the corpus (Heaps' law) and
  * shrinks as merges fuse symbols. At 100 TB the corpus scan
  * dominates; rounds are vocabulary-sized hash-aggs.
  *
  * Reference scope: the reference pipeline has no tokenizer training;
  * this extends SURVEY §2.5 (X4 text analysis) with the vocabulary-
  * induction stage that precedes `token_bpe`-style application.
  */
object Bpe {

  /** `"abc"` → `" a b c "` — one space-delimited symbol per codepoint,
    * with sentinel spaces so every symbol (incl. first/last) matches
    * the `" l r "` merge pattern uniformly. */
  private def spacedSymbols(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1"), lit(" "))

  /** The distinct-word histogram in spaced-symbol form: `(w, s, freq)`
    * — the original word rides along so the trained state doubles as
    * the word → segmentation lookup table `applyBpe` joins on. */
  private def wordHistogram(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), spacedSymbols(col("w")).as("s"), col("freq"))

  /** Adjacent-pair counts over the current vocabulary state, weighted
    * by word frequency. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val a = split(trim(col("s")), " ")
    words
      .select(col("freq"), a.as("a"))
      .select(col("freq"), explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1),
        (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("freq")).as("pair_freq"))
  }

  /** Run `nMerges` rounds; returns (merge table rows, initial words,
    * final words). The words frames are localCheckpointed (small:
    * distinct-vocabulary-sized). */
  private def trainCore(documents: DataFrame, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame, DataFrame) = {
    val words0 = wordHistogram(documents).localCheckpoint()
    var words = words0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to nMerges) {
      val best = pairCounts(words)
        .orderBy(col("pair_freq").desc, col("lhs"), col("rhs"))
        .limit(1).collect()(0)
      val (l, r, f) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((round, l, r, f))
      words = words
        .withColumn("s", org.apache.spark.sql.functions.replace(
          col("s"), lit(s" $l $r "), lit(s" $l$r ")))
        .localCheckpoint()
    }
    (merges.result(), words0, words)
  }

  /** Train ONCE per (session, input plan, nMerges) and persist the
    * result as a parquet artifact dir — `merges` (the learned merge
    * table), `words0`/`wordsK` (initial/final word-segmentation
    * state). `q_bpe_train`/`q_bpe_compress`/`q_bpe_apply` all read
    * from the same artifact, so a bench session pays training once;
    * and the artifact dir IS the production hand-off: the train job
    * writes it, any number of later apply jobs (or a NEW session)
    * read it with zero retraining — the AnnIndex index-as-table
    * discipline applied to tokenizer state. */
  private[graft] def trainedDir(documents: DataFrame, nMerges: Int): String = {
    val spark = documents.sparkSession
    val key = s"bpe:${documents.queryExecution.analyzed.semanticHash()}:$nMerges"
    AnnIndex.artifact(spark, key) { dir =>
      val (merges, words0, wordsK) = trainCore(documents, nMerges)
      mergesDf(spark, merges).write.parquet(s"$dir/merges")
      words0.write.parquet(s"$dir/words0")
      wordsK.write.parquet(s"$dir/wordsK")
    }
  }

  private def mergesDf(spark: SparkSession,
                       merges: Seq[(Int, String, String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map {
        case (i, l, r, f) => Row(i, l, r, f) }, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("pair_freq", LongType, nullable = false))))

  /** Learned merge table: one row per round, `(round, lhs, rhs,
    * pair_freq)` in merge order. */
  def trainMerges(documents: DataFrame, nMerges: Int = 6): DataFrame = {
    val spark = documents.sparkSession
    spark.read.parquet(s"${trainedDir(documents, nMerges)}/merges")
      .orderBy("round")
  }

  /** Tokenize the corpus under the learned vocabulary — the APPLY half
    * of tokenizer training: per-doc word and BPE-piece counts. The
    * trained word table (distinct word → final segmentation) is
    * vocabulary-sized, so it BROADCASTS onto the corpus scan: at
    * 100 TB the apply is one map-side join + hash agg, the same shape
    * a production tokenizer-apply job has (merge rules shipped to
    * every worker, corpus never reshuffled). */
  def applyBpe(documents: DataFrame, nMerges: Int = 6): DataFrame = {
    val spark = documents.sparkSession
    val wordsK = spark.read.parquet(s"${trainedDir(documents, nMerges)}/wordsK")
    val pieces = wordsK.select(col("w"),
      size(split(trim(col("s")), " ")).as("n_p"))
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(pieces), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_p")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY by language — the metric that decides whether
    * a trained vocabulary serves every language it will tokenize:
    * pieces-per-word (and its occurrence-weighted corpus share) per
    * `lang`. A language with fertility far above the corpus mean is
    * being shredded into characters (under-represented in training) —
    * the standard signal to rebalance the tokenizer corpus mix. Same
    * dataflow as `applyBpe` (broadcast word→piece-count join onto the
    * corpus word stream, map-side) with the group key swapped to lang;
    * the ratio is ONE long/long division per group, bit-identical
    * cross-engine. */
  def fertilityByLang(documents: DataFrame, nMerges: Int = 6): DataFrame = {
    val spark = documents.sparkSession
    val wordsK = spark.read.parquet(s"${trainedDir(documents, nMerges)}/wordsK")
    val pieces = wordsK.select(col("w"),
      size(split(trim(col("s")), " ")).as("n_p"))
    documents
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(pieces), "w")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_p")).as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast(DoubleType) / col("n_words"), 6))
      .orderBy("lang")
  }

  /** ENCODE the corpus to token-id sequences — the actual pre-training
    * output format (`input_ids`): every word maps to its learned
    * segmentation's symbol ids, concatenated in document order. The
    * symbol vocabulary is the distinct final symbols ranked by binary
    * string order (a vocabulary-sized single-partition window —
    * bounded by construction, the same budget as the merge table);
    * the word → ids table broadcasts onto the corpus scan exactly
    * like `applyBpe`. Ids are 1-based and contiguous. */
  def encodeBpe(documents: DataFrame, nMerges: Int = 6): DataFrame = {
    val spark = documents.sparkSession
    val wordsK = spark.read.parquet(s"${trainedDir(documents, nMerges)}/wordsK")
    val pieces = wordsK.select(col("w"), split(trim(col("s")), " ").as("a"))
    val vocab = pieces.select(explode(col("a")).as("sym")).distinct()
      .withColumn("sym_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("sym")))
    val wids = pieces
      .select(col("w"), posexplode(col("a")).as(Seq("i", "sym")))
      .join(broadcast(vocab), Seq("sym"))
      .groupBy(col("w"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("sym_id")))),
        x => x("sym_id")).as("ids"))
    documents
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(wids), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(sort_array(collect_list(struct(col("pos"), col("ids")))),
        x => x("ids"))).as("ids_arr"))
      // Canonical comma-joined form, not a raw array<int>: the driver's
      // compare sorts on every output column and arrays aren't sortable
      // there (numpy arrays are unhashable in its pandas sort).
      .select(col("doc_id"), size(col("ids_arr")).as("n_ids"),
        array_join(col("ids_arr"), ",").as("input_ids"))
      .orderBy("doc_id")
  }

  /** Corpus-level compression report after applying the learned
    * merges: occurrence-weighted symbol counts before/after, plus the
    * resulting symbol-vocabulary size — the metric a tokenizer-
    * training run actually tracks (symbols/word ≈ bytes/token). */
  def compressionReport(documents: DataFrame, nMerges: Int = 6): DataFrame = {
    val dir = trainedDir(documents, nMerges)
    val spark = documents.sparkSession
    val words0 = spark.read.parquet(s"$dir/words0")
    val wordsK = spark.read.parquet(s"$dir/wordsK")
    def nSyms(s: Column): Column = size(split(trim(s), " ")).cast(LongType)
    val before = words0.agg(
      sum(col("freq")).as("n_words"),
      sum(nSyms(col("s")) * col("freq")).as("symbols_before"))
    val after = wordsK.agg(
      sum(nSyms(col("s")) * col("freq")).as("symbols_after"))
    val vocab = wordsK
      .select(explode(split(trim(col("s")), " ")).as("sym"))
      .agg(count_distinct(col("sym")).as("vocab_symbols"))
    // Three 1-row aggregates; the crossJoins broadcast single rows.
    before.crossJoin(after).crossJoin(vocab)
  }
}
