package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Training-data curation pipeline stages over `documents`: the
  * composed filter a corpus passes before tokenization, a deterministic
  * train/val/test split, and fixed-size token chunking with overlap.
  *
  * Scale shape: curation is projections + one hash-agg (text dedup) —
  * no join wider than the dedup key; the split is a pure projection;
  * chunking is explode-over-computed-offsets (output size ~ corpus
  * token count / stride, no shuffle at all).
  */
object Curation {

  /** Scan-local quality/language expressions — ONE spelling shared by
    * `curate` and `pipelineE2e`, so the composed pipeline inlines the
    * gates into a single corpus scan with no possibility of drift
    * (CurationSpec reconciles the two anyway). Every variant takes the
    * TOKEN ARRAY as an attribute so callers tokenize ONCE and fan the
    * flags out from the staged column — lambda-bearing HOFs defeat
    * runtime subexpression elimination, so spelling `tokens(text)`
    * inside every flag re-splits the text per flag (measured 2.5x on
    * the composed pipeline). */
  private[llm] def qualityFrom(text: Column, toks: Column): Column = {
    val nTok = size(toks)
    val avgWLen = (length(text) - nTok + 1).cast(DoubleType) / nTok.cast(DoubleType)
    val stopR = size(filter(toks, t => t.isin(TextOps.EnStopwords: _*)))
      .cast(DoubleType) / nTok.cast(DoubleType)
    when(nTok.between(10, 2000), lit(0.5)).otherwise(lit(0.0)) +
      when(avgWLen.between(3.0, 10.0), lit(0.3)).otherwise(lit(0.0)) +
      when(stopR > 0.0, lit(0.2)).otherwise(lit(0.0))
  }

  private[llm] def langPredFrom(toks: Column): Column = {
    val stopR = size(filter(toks, t => t.isin(TextOps.EnStopwords: _*)))
      .cast(DoubleType) / size(toks).cast(DoubleType)
    when(stopR > 0.05, lit("en")).otherwise(lit("other"))
  }

  /** The repetition drop flag as one scan-local expression (the same
    * arithmetic repetitionStats stages through named columns). */
  private[llm] def repetitiveFrom(toks: Column,
                                  topTokThreshold: Double = 0.2,
                                  dupBigramThreshold: Double = 0.3): Column = {
    val g2 = tokenGrams(toks, 2)
    val nTok = size(toks)
    val topFrac = when(nTok > 0,
      graft.functions.VectorFns.maxEqualRun(sort_array(toks)).cast(DoubleType)
        / nTok.cast(DoubleType)).otherwise(lit(0.0))
    val dupFrac = when(size(g2) > 0,
      lit(1.0) - size(array_distinct(g2)).cast(DoubleType) / size(g2).cast(DoubleType))
      .otherwise(lit(0.0))
    topFrac > topTokThreshold || dupFrac > dupBigramThreshold
  }

  /** One pass of the standard curation gauntlet, every rule explicit:
    * exact-dup (keep the min doc_id per identical text), language, and
    * quality-score gates, with the FIRST failing rule as the recorded
    * drop reason — the auditability a 100 TB curation run needs. */
  def curate(documents: DataFrame, minQuality: Double = 0.7): DataFrame = {
    val keeper = min(col("doc_id")).over(Window.partitionBy(col("text")))
    // Window first, then the global sort on the still-narrow (doc_id,
    // text, is_dup) rows; the tokenize/score projection sits ABOVE the
    // sort so the range-boundary sampling pass never evaluates it
    // (family-wide 2x-eval rule — see TextOps.sortedDocs). The token
    // array is STAGED once above the sort (HOF lambdas defeat
    // subexpression elimination — the quality + lang flags would
    // otherwise re-split per flag).
    documents
      .select(col("doc_id"), col("text"),
        (col("doc_id") =!= keeper).as("is_dup"))
      .orderBy("doc_id")
      .select(col("doc_id"), col("text"), col("is_dup"),
        TextOps.tokens(col("text")).as("__toks"))
      .withColumn("quality", qualityFrom(col("text"), col("__toks")))
      .withColumn("lang_pred", langPredFrom(col("__toks")))
      .withColumn("reason",
        when(col("is_dup"), lit("exact_dup"))
          .when(col("lang_pred") =!= "en", lit("lang"))
          .when(col("quality") < minQuality, lit("low_quality"))
          .otherwise(lit("keep")))
      .select(col("doc_id"), col("is_dup"), col("lang_pred"),
        col("quality"), col("reason"), (col("reason") === "keep").as("kept"))
  }

  /** Deterministic, engine-independent train/val/test split on the
    * document key: doc_id mod 10 -> 8/1/1. A pure projection — the
    * split is reproducible on any engine and any run, unlike
    * randomSplit. */
  def trainValTestSplit(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 8, lit("train"))
          .when(pmod(col("doc_id"), lit(10)) === 8, lit("val"))
          .otherwise(lit("test")).as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("split")

  /** Fixed-size token chunking with overlap (chunk = `size` tokens,
    * stride = `stride`): the packing step before tokenization. Chunk
    * offsets are computed per row and exploded — no shuffle; output
    * volume is corpusTokens/stride. */
  def chunkDocs(documents: DataFrame, size0: Int = 50, stride: Int = 40,
                docLimit: Int = 20): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nChunksMinus1 = greatest(
      ceil((size(toks) - lit(size0)).cast(DoubleType) / stride).cast(IntegerType),
      lit(0))
    // Sort the narrow (doc_id, text) input BEFORE tokenize + explode
    // (2x-eval rule): range partitions emit in doc_id order and
    // Generate preserves row order while emitting chunk_idx ascending,
    // so the output is still deterministically (doc_id, chunk_idx)-
    // ordered with no post-explode sort — the media frameSample shape.
    documents
      .filter(col("doc_id") < docLimit)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"), toks.as("t"),
        explode(sequence(lit(0), nChunksMinus1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        size(slice(col("t"), col("chunk_idx") * stride + 1, lit(size0))).as("n_chunk_tokens"),
        array_join(slice(col("t"), col("chunk_idx") * stride + 1, lit(size0)), " ").as("chunk_text"))
  }

  /** Content-defined chunking (CDC) — boundaries chosen by the CONTENT
    * around them, not by fixed offsets: position i ends a chunk when a
    * rolling hash of the last `window`=4 token values hits 0 mod
    * `avgMask`+1. The payoff over fixed-stride chunking is edit
    * locality: inserting a token shifts every fixed-offset chunk after
    * it, but content-defined boundaries RE-SYNC at the first unchanged
    * window — only the edited chunk's fingerprint changes, which is
    * what makes chunk-level dedup stable under local edits (the
    * rsync/LBFS discipline applied to corpus text).
    *
    * Everything is per-row array HOFs (transform/filter/zip over the
    * token array) inside whole-stage codegen — NO shuffle, NO explode
    * until the final chunk rows emit; at 100 TB this is a map-side
    * scan. The token value and the 4-term polynomial are pure integer
    * arithmetic (all bounded < 2^31, ANSI-safe), so any SQL engine
    * replays the exact boundary set. A production variant adds
    * min/max chunk-size clamps around the same boundary rule. */
  def chunkCdc(documents: DataFrame, avgMask: Int = 15): DataFrame = {
    val B = 131
    val (b2, b3) = (B * B, B * B * B)
    // portable token value: first-char codepoint mixed with length
    def tokVal(w: Column): Column =
      (ascii(substring(w, 1, 1)) * 31 + length(w)) % 64
    val toks = TextOps.tokens(col("text"))
    // boundary positions (1-based, >= window): 4-term polynomial of the
    // trailing token values, masked to an avg chunk of ~avgMask+1
    // tokens. Guarded by `when`: sequence(4, n) DESCENDS for n < 4 and
    // ANSI element_at throws out-of-bounds, so short docs must skip
    // the filter entirely (they are one whole-doc chunk).
    val bpos = when(size(col("t")) >= 4,
      filter(sequence(lit(4), size(col("t"))), i =>
        ((element_at(col("v"), i - 3) * b3 + element_at(col("v"), i - 2) * b2 +
          element_at(col("v"), i - 1) * B + element_at(col("v"), i))
          % 1000003 % (avgMask + 1)) === 0))
      .otherwise(array().cast("array<int>"))
    // chunk k spans (starts[k], ends[k]); a boundary at the LAST token
    // yields no trailing chunk (start would exceed the doc)
    val starts = concat(array(lit(1)), transform(col("b"), p => p + 1))
    val ends = concat(col("b"), array(size(col("t"))))
    documents
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"), transform(col("t"), tokVal(_)).as("v"))
      .select(col("doc_id"), col("t"), bpos.as("b"))
      .select(col("doc_id"), col("t"),
        posexplode(filter(zip_with(starts, ends,
          (s, e) => struct(s.as("s"), e.as("e"))), p => p("s") <= p("e"))))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        col("col.s").as("start_pos"),
        (col("col.e") - col("col.s") + 1).as("n_tokens"),
        array_join(slice(col("t"), col("col.s"),
          col("col.e") - col("col.s") + 1), " ").as("chunk_text"))
  }

  /** Sequence PACKING — the step between chunking and tokenization: a
    * document's chunk stream is concatenated and cut into fixed
    * `seqLen`-token training sequences (each chunk assigned to the
    * sequence its FIRST token lands in — the concat-then-split
    * discipline; a straddling chunk belongs to the sequence it starts
    * in). Packing is DOCUMENT-RESPECTING (sequences never mix
    * documents), which is both the usual contamination-hygiene choice
    * and what makes the operator scale: the running token offset is a
    * per-doc window (partitioned by doc_id), never a global
    * single-partition prefix sum.
    *
    * Output: one row per (doc_id, seq_idx) with the chunk count and
    * token count landing in that sequence — the shape a packing audit
    * reads (fill ratios, truncation tails). Pure window + hash agg;
    * integer arithmetic only, so the oracle replays it exactly. */
  def packSequences(documents: DataFrame, size0: Int = 50, stride: Int = 40,
                    seqLen: Int = 128): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nChunksMinus1 = greatest(
      ceil((size(toks) - lit(size0)).cast(DoubleType) / stride).cast(IntegerType),
      lit(0))
    val chunks = documents
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"), size(toks).as("n_tok"),
        explode(sequence(lit(0), nChunksMinus1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(size0), col("n_tok") - col("chunk_idx") * stride).as("n_chunk_tokens"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("cum_before", coalesce(sum(col("n_chunk_tokens")).over(w), lit(0L)))
      .withColumn("seq_idx", floor(col("cum_before") / lit(seqLen)).cast(IntegerType))
      .groupBy(col("doc_id"), col("seq_idx"))
      .agg(count(lit(1)).cast(IntegerType).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_seq_tokens"))
      .orderBy("doc_id", "seq_idx")
  }

  /** CROSS-document sequence packing (greedy next-fit) — the
    * padding-elimination pass every pre-training run executes: short
    * documents are CONCATENATED into fixed `seqLen`-token training
    * sequences (docs over seqLen truncate to it), the fill-rate lever
    * the within-doc `packSequences` cut cannot pull.
    *
    * Packing discipline: docs are bucketed by the multiplicative-mix
    * doc_id hash into `nBuckets` independent streams; within a bucket,
    * docs are walked in doc_id order and a doc joins the OPEN sequence
    * if it fits, else the sequence closes and a new one opens (greedy
    * next-fit). Next-fit — one open bin — rather than first-fit over
    * all open bins is the deliberate scale choice: it streams (O(1)
    * state per bucket, one pass, no random access to closed bins), it
    * is what production packers run, and its waste bound (each closed
    * sequence is more than half full when docs <= seqLen/2 dominate)
    * costs a few percent fill for an algorithm that never holds more
    * than a counter. Everything is integer arithmetic over a
    * deterministic order, so the DuckDB oracle replays the fold
    * exactly (a recursive CTE over per-bucket positions).
    *
    * Scale shape: ONE corpus scan stages (doc_id, bucket, n_tok) —
    * ~20 bytes/row, the text never shuffles — then one exchange on
    * bucket and a SORTED group fold (flatMapSortedGroups: Spark sorts
    * within partitions; no per-group in-memory buffering). Parallelism
    * = nBuckets, so size nBuckets to the cluster, not the data; the
    * per-bucket state is three integers regardless of corpus size. */
  /** The shared per-bucket next-fit fold: docs arrive in `sortCols`
    * order within their bucket, a doc joins the open sequence if it
    * fits, else the sequence closes. Emits the doc_id SPAN as running
    * min/max (== first/last packed for ascending-id order). */
  private def packFold(documents: DataFrame, seqLen: Int, nBuckets: Int,
                       sortCols: Seq[Column]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val docs = documents
      .select(col("doc_id"),
        ((col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(nBuckets.toLong))
          .cast(IntegerType).as("bucket"),
        least(size(TextOps.tokens(col("text"))), lit(seqLen)).as("n_tok"))
      .as[(Long, Int, Int)]
    docs.groupByKey(_._2)
      .flatMapSortedGroups(sortCols: _*) { (bucket, it) =>
        // the whole per-bucket state: current sequence's fill/docs/span
        var seqIdx = 0; var fill = 0; var nDocs = 0
        var minDoc = Long.MaxValue; var maxDoc = Long.MinValue
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Int, Int, Long, Long, Long)]
        def close(): Unit = {
          out += ((bucket, seqIdx, nDocs, fill, minDoc, maxDoc,
            fill.toLong * 1000000L / seqLen))
          seqIdx += 1; fill = 0; nDocs = 0
          minDoc = Long.MaxValue; maxDoc = Long.MinValue
        }
        for ((docId, _, nTok) <- it) {
          if (fill > 0 && fill + nTok > seqLen) close()
          minDoc = math.min(minDoc, docId); maxDoc = math.max(maxDoc, docId)
          fill += nTok; nDocs += 1
        }
        if (nDocs > 0) close()
        out
      }
      .toDF("bucket", "seq_idx", "n_docs", "n_seq_tokens",
        "first_doc", "last_doc", "fill_ppm")
      .orderBy("bucket", "seq_idx")
  }

  def packGreedy(documents: DataFrame, seqLen: Int = 128,
                 nBuckets: Int = 32): DataFrame =
    packFold(documents, seqLen, nBuckets, Seq(col("doc_id")))

  /** FIRST-fit decreasing — the classic fill upgrade over streaming
    * next-fit: docs walk their bucket in (n_tok DESC, doc_id) order
    * and each lands in the FIRST already-open sequence it fits, else
    * opens a new one. Big docs claim fresh sequences early and their
    * leftover space stays OPEN for the small-doc tail — which is
    * exactly what next-fit (one open bin) cannot do, and why a
    * decreasing sort only helps first-fit (measured: next-fit
    * decreasing packs WORSE than id-order greedy on this corpus —
    * 310 vs 302 sequences at sf0.001 — while FFD beats both).
    *
    * The price is state: the open-bin list per bucket, O(sequences in
    * the bucket) instead of O(1) — size nBuckets so a bucket's bins
    * fit comfortably in memory (bins ≈ bucketTokens / seqLen; the
    * per-bucket fold is still one pass). first_doc/last_doc are the
    * doc_id SPAN (min/max — pack order is not id order). Integer
    * fold over a deterministic order, so the DuckDB oracle replays it
    * exactly: a recursive CTE carrying the open-bin fill LIST as
    * state, first-fit = list_position of the first fitting bin. */
  def packFirstFitDecreasing(documents: DataFrame, seqLen: Int = 128,
                             nBuckets: Int = 32): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val docs = documents
      .select(col("doc_id"),
        ((col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(nBuckets.toLong))
          .cast(IntegerType).as("bucket"),
        least(size(TextOps.tokens(col("text"))), lit(seqLen)).as("n_tok"))
      .as[(Long, Int, Int)]
    docs.groupByKey(_._2)
      .flatMapSortedGroups(col("n_tok").desc, col("doc_id")) { (bucket, it) =>
        final class Bin {
          var fill = 0; var nDocs = 0
          var minDoc = Long.MaxValue; var maxDoc = Long.MinValue
        }
        val bins = scala.collection.mutable.ArrayBuffer.empty[Bin]
        for ((docId, _, nTok) <- it) {
          val i = bins.indexWhere(_.fill + nTok <= seqLen)
          val b = if (i >= 0) bins(i) else { val nb = new Bin; bins += nb; nb }
          b.fill += nTok; b.nDocs += 1
          b.minDoc = math.min(b.minDoc, docId); b.maxDoc = math.max(b.maxDoc, docId)
        }
        bins.iterator.zipWithIndex.map { case (b, i) =>
          (bucket, i, b.nDocs, b.fill, b.minDoc, b.maxDoc,
            b.fill.toLong * 1000000L / seqLen)
        }.toSeq
      }
      .toDF("bucket", "seq_idx", "n_docs", "n_seq_tokens",
        "first_doc", "last_doc", "fill_ppm")
      .orderBy("bucket", "seq_idx")
  }

  /** Corpus-level waste report over the greedy packing: sequences,
    * docs, packed vs capacity tokens, and the padding share (ppm) a
    * trainer would burn — the one-row audit a packing pass publishes.
    * Derived FROM packGreedy's per-sequence rows (same fold, one
    * aggregate on top). */
  def packGreedyReport(documents: DataFrame, seqLen: Int = 128,
                       nBuckets: Int = 32): DataFrame =
    packGreedy(documents, seqLen, nBuckets)
      .agg(
        count(lit(1)).as("n_sequences"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_seq_tokens")).as("packed_tokens"),
        (count(lit(1)) * seqLen.toLong).as("capacity_tokens"))
      .select(col("n_sequences"), col("n_docs"), col("packed_tokens"),
        col("capacity_tokens"),
        // `div` = exact integer division (Column./ is double division,
        // whose truncating cast can land one off the oracle's floor)
        expr("(capacity_tokens - packed_tokens) * 1000000 div capacity_tokens")
          .as("waste_ppm"))

  /** Token n-gram strings (full n-grams only; empty array when the doc
    * has fewer than n tokens — guarded because sequence(1, k) with k<1
    * would count DOWN). */
  private def tokenGrams(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Benchmark decontamination — the GPT-3/Llama-style n-gram overlap
    * check run before training: flag every training document sharing
    * any `gramSize`-token n-gram with an evaluation set, so benchmark
    * answers don't leak into the corpus. The eval set here is carved
    * deterministically from the corpus itself (every 40th doc
    * contributes tokens 11..40 as a stand-in "benchmark prompt"), which
    * makes the whole check reproducible in any engine.
    *
    * Scale shape: the eval side is tiny relative to the corpus (real
    * benchmark suites are ~10^5 grams vs 100 TB of training text), so
    * its distinct grams BROADCAST and the corpus-side probe is a
    * map-side hash semi-join — the 100 TB scan never shuffles; only
    * (doc_id, matched gram) survivors reach the count-distinct agg. */
  /** The decontamination SPARSE side — (doc_id, n_leaked_grams) for
    * docs with at least one benchmark-gram hit; two corpus reads (bench
    * grams + probe grams). Exposed so pipelineE2e can left-join it onto
    * its own doc spine instead of paying decontaminate's third scan. */
  private[llm] def leakedGramCounts(documents: DataFrame, gramSize: Int = 8): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val bench = documents
      .filter(pmod(col("doc_id"), lit(40)) === 7)
      .select(explode(tokenGrams(slice(toks, 11, 30), gramSize)).as("gram"))
      .distinct()
    documents
      .select(col("doc_id"), explode(tokenGrams(toks, gramSize)).as("gram"))
      .join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_leaked_grams"))
  }

  def decontaminate(documents: DataFrame, gramSize: Int = 8): DataFrame =
    documents.select(col("doc_id"))
      .join(leakedGramCounts(documents, gramSize), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"),
        (coalesce(col("n_leaked_grams"), lit(0L)) > 0L).as("contaminated"))
      .orderBy("doc_id")

  /** Within-document repetition stats (the Gopher/C4 repetition
    * filters): the most-frequent-token share and the duplicate-bigram
    * fraction, plus the composite "repetitive" drop flag. Boilerplate,
    * keyword-stuffed, and degenerate generator output score high on
    * both; clean prose stays low.
    *
    * Scale shape: ZERO shuffles — the bigram stats are per-row HOFs,
    * and the top-token share comes from the fused `max_equal_run`
    * kernel over the sorted token array (max element multiplicity ==
    * longest equal-adjacent run), replacing the explode -> (doc_id,
    * token) count -> per-doc max two-shuffle plan. The whole filter is
    * a scan-local projection at any corpus size. */
  def repetitionStats(documents: DataFrame,
                      topTokThreshold: Double = 0.2,
                      dupBigramThreshold: Double = 0.3): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    // Narrow input sorted BEFORE the kernel chain (2x-eval rule): the
    // range-boundary sampling pass reads only (doc_id, text); tokenize,
    // sort_array, bigrams, and max_equal_run each run exactly once.
    TextOps.sortedDocs(documents)
      .select(col("doc_id"), toks.as("t"), tokenGrams(toks, 2).as("g2"))
      .select(col("doc_id"), size(col("t")).as("n_tok"),
        graft.functions.VectorFns.maxEqualRun(sort_array(col("t"))).as("top_c"),
        size(col("g2")).as("n_g2"),
        size(array_distinct(col("g2"))).as("n_g2_distinct"))
      .select(
        col("doc_id"),
        when(col("n_tok") > 0,
          col("top_c").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .otherwise(lit(0.0)).as("top_tok_frac"),
        when(col("n_g2") > 0,
          lit(1.0) - col("n_g2_distinct").cast(DoubleType) / col("n_g2").cast(DoubleType))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
      .withColumn("repetitive",
        col("top_tok_frac") > topTokThreshold || col("dup_bigram_frac") > dupBigramThreshold)
  }

  /** The END-TO-END curation run as ONE plan (VERDICT r6 #6): exact
    * dedup -> language gate -> quality gate -> repetition filter ->
    * benchmark decontamination -> chunk -> train/val/test split,
    * reported as the funnel a 100 TB training-data run audits — one row
    * per stage with (docs in, docs dropped, docs out), chunk volume for
    * the survivors, and the final split sizes. Every doc is charged to
    * the FIRST stage that drops it (the same precedence `curate` uses),
    * so the stage counts partition the corpus and the funnel telescopes.
    *
    * Scale shape: ONE corpus scan computes every per-row stage (the
    * dup window plus the quality/lang/repetition flags and the token
    * count, via the shared scan-local expressions) — not one scan per
    * stage; decontamination joins in as its own broadcast-probe branch
    * (its gram explode changes cardinality, so it cannot ride the flag
    * projection). Three corpus reads total at any scale. The funnel
    * itself is ONE aggregate row unpivoted with stack() — no stage
    * materializes an intermediate corpus, and nothing widens beyond
    * (doc_id, flags). Composing the stages in one plan is also what
    * surfaces cross-operator materialization bugs: each stage's
    * columns are live simultaneously under whole-stage codegen instead
    * of in separate queries. */
  def pipelineE2e(documents: DataFrame, minQuality: Double = 0.7): DataFrame = {
    val keeper = min(col("doc_id")).over(Window.partitionBy(col("text")))
    // tokenize ONCE into a staged column; CollapseProject leaves the
    // stage in place because the alias is expensive and multiply
    // referenced, so every flag reads the array instead of re-running
    // the split regex (the HOF lambdas are not CSE-eligible)
    val flags = documents
      .select(col("doc_id"), col("text"), (col("doc_id") =!= keeper).as("is_dup"))
      .select(col("doc_id"), col("is_dup"), col("text"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("is_dup"),
        langPredFrom(col("toks")).as("lang_pred"),
        qualityFrom(col("text"), col("toks")).as("quality"),
        repetitiveFrom(col("toks")).as("repetitive"),
        size(col("toks")).as("n_tok"))
    val verdict = flags
      .join(leakedGramCounts(documents), Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("n_leaked_grams"), lit(0L)) > 0L)
      .select(col("doc_id"), col("n_tok"),
        when(col("is_dup"), lit("exact_dup"))
          .when(col("lang_pred") =!= "en", lit("lang"))
          .when(col("quality") < minQuality, lit("quality"))
          .when(col("repetitive"), lit("repetition"))
          .when(col("contaminated"), lit("decontamination"))
          .otherwise(lit("keep")).as("ff"))
    // chunk count per surviving doc — chunkDocs' offset formula
    val nChunks = greatest(
      ceil((col("n_tok") - lit(50)).cast(DoubleType) / 40).cast(LongType), lit(0L)) + 1L
    def dropped(stage: String) =
      sum(when(col("ff") === stage, 1L).otherwise(0L))
    val agg = verdict.agg(
      count(lit(1)).as("total"),
      dropped("exact_dup").as("d1"),
      dropped("lang").as("d2"),
      dropped("quality").as("d3"),
      dropped("repetition").as("d4"),
      dropped("decontamination").as("d5"),
      sum(when(col("ff") === "keep", nChunks).otherwise(0L)).as("n_chunks"),
      sum(when(col("ff") === "keep" && pmod(col("doc_id"), lit(10)) < 8, 1L)
        .otherwise(0L)).as("n_train"),
      sum(when(col("ff") === "keep" && pmod(col("doc_id"), lit(10)) === 8, 1L)
        .otherwise(0L)).as("n_val"),
      sum(when(col("ff") === "keep" && pmod(col("doc_id"), lit(10)) > 8, 1L)
        .otherwise(0L)).as("n_test"))
    agg.select(expr(
      """stack(9,
        |  CAST(1 AS INT), 'exact_dup',       total,                       d1, total - d1,
        |  CAST(2 AS INT), 'lang',            total - d1,                  d2, total - d1 - d2,
        |  CAST(3 AS INT), 'quality',         total - d1 - d2,             d3, total - d1 - d2 - d3,
        |  CAST(4 AS INT), 'repetition',      total - d1 - d2 - d3,        d4, total - d1 - d2 - d3 - d4,
        |  CAST(5 AS INT), 'decontamination', total - d1 - d2 - d3 - d4,   d5, total - d1 - d2 - d3 - d4 - d5,
        |  CAST(6 AS INT), 'chunk',           total - d1 - d2 - d3 - d4 - d5, CAST(0 AS BIGINT), n_chunks,
        |  CAST(7 AS INT), 'split_train',     total - d1 - d2 - d3 - d4 - d5, CAST(0 AS BIGINT), n_train,
        |  CAST(8 AS INT), 'split_val',       total - d1 - d2 - d3 - d4 - d5, CAST(0 AS BIGINT), n_val,
        |  CAST(9 AS INT), 'split_test',      total - d1 - d2 - d3 - d4 - d5, CAST(0 AS BIGINT), n_test
        |) AS (stage, stage_name, n_in, n_dropped, n_out)""".stripMargin))
      .orderBy("stage")
  }

  /** Domain-mixture resampling — the rebalancing pass that makes a
    * corpus match TARGET token shares per domain (here: language).
    * Given target shares, the largest achievable total without
    * upsampling is bounded by the BINDING domain (min over k of
    * available_k / share_k); every domain's keep rate is then
    * share_k * feasible / available_k (= 1.0 for the binding domain).
    * Rates are published as integer PARTS-PER-MILLION — the same bound
    * the row filter uses — and the kept sets are chosen by the
    * multiplicative-mix doc_id hash: no RNG, reproducible, and the
    * whole report (availability, rates, ACTUAL kept docs/tokens) is
    * exactly recomputable by the SQL oracle.
    *
    * Scale shape: the corpus TEXT is tokenized exactly ONCE — the
    * per-doc token count is staged into a narrow (lang, doc_id, n_tok)
    * table (~20 bytes/row vs the text payload) that both the
    * availability aggregate and the kept scan read; then a k-row global
    * window for the binding minimum, a broadcast of the k rates onto
    * the staged table, and one kept aggregate. At 100 TB the tokenize
    * IS the expensive part of the scan, so paying it twice (the
    * pre-round-8 shape) doubled the operator's cost. */
  def domainMixture(documents: DataFrame,
                    targets: Map[String, Double] = Map(
                      "en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
                      "fr" -> 0.15, "zh" -> 0.15)): DataFrame = {
    val tokCounts = documents
      .select(col("lang"), col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_tok"))
      .localCheckpoint()
    val share = targets.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    val avail = tokCounts
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("target_share", share)
    // binding-domain minimum over the k-row aggregate (k tiny — the
    // empty-frame window is a k-row single partition, not a data sort)
    val rated = avail
      .withColumn("feas",
        min(col("n_tokens").cast(DoubleType) / col("target_share"))
          .over(Window.partitionBy()))
      .withColumn("rate_ppm",
        round(least(lit(1.0), col("target_share") * col("feas") / col("n_tokens"))
          * 1000000, 0).cast(LongType))
      .drop("feas")
    val bucket = (col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(1000000L)
    val kept = tokCounts
      .join(broadcast(rated.select(col("lang"), col("rate_ppm"))), Seq("lang"))
      .filter(bucket < col("rate_ppm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens"))
    rated.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("target_share"),
        col("rate_ppm"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("lang")
  }

  /** Deterministic stratified sampling: per-language keep rates (e.g.
    * downsample the dominant language, keep rare ones whole) decided by
    * a multiplicative-mix pseudo-hash of doc_id — pure projection, no
    * RNG, no shuffle, reproducible run to run and portable to any SQL
    * engine. At 100 TB this is the rebalancing pass between curation
    * and tokenization; being a scan-local filter it parallelizes
    * perfectly and composes with partition pruning. */
  def stratifiedSample(documents: DataFrame,
                       rates: Map[String, Int] = Map("en" -> 20),
                       defaultRate: Int = 50): DataFrame = {
    // Knuth multiplicative mix, then a prime mod to decorrelate the
    // bucket from doc_id's own residues. All intermediate values stay
    // far below 2^63 (ANSI mode: overflow would throw, not wrap).
    val bucket = (col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(100L)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, pct)) =>
      when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    documents
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Deterministic epoch shuffle + shard assignment — the pass a
    * pre-training run executes after packing: a seeded pseudo-random
    * permutation of the corpus cut into `nShards` output shards. The
    * permutation key is a Knuth multiplicative mix of (doc_id + seed):
    * a pure column expression, so the same seed reproduces the same
    * epoch order on any engine with no RNG state to checkpoint. Shard
    * membership is the key's residue (uniform across shards) and the
    * within-shard position is a per-shard window rank — the only
    * shuffle is the nShards-way hash partition itself; each shard
    * sorts locally and writes independently, so at 100 TB this scales
    * with executor count, never a global sort. */
  def epochShuffle(documents: DataFrame, seed: Long = 17L,
                   nShards: Int = 8): DataFrame = {
    val key = ((col("doc_id") + lit(seed)) * lit(2654435761L)) % lit(1000000007L)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    documents
      .select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard", (col("shuffle_key") % nShards).cast(IntegerType))
      .withColumn("pos", row_number().over(w))
      .orderBy("shard", "pos")
  }

  /** Fixed-size per-key sample ("reservoir" shape): keep exactly `k`
    * documents per language, chosen by rank under a deterministic
    * per-doc hash — the same sample every run, insensitive to row
    * order and partitioning (a seeded reservoir without the sequential
    * state). Plans through the TopKPerKey heap operator, so every
    * partition retains at most k candidates per key and the shuffle
    * carries k·|keys| rows — never a full per-key sort; at 100 TB the
    * map-side heap is what makes a bounded sample affordable. */
  def reservoirSample(documents: DataFrame, k: Int = 40): DataFrame = {
    val rank = (col("doc_id") * lit(2654435761L)) % lit(1000000007L)
    val ranked = documents
      .select(col("lang"), col("doc_id"), rank.as("sample_rank"))
    graft.plans.TopK.perKey(ranked, Seq("lang"),
        Seq(col("sample_rank").asc, col("doc_id").asc), k)
      .orderBy("lang", "rn")
  }

  /** RAG context assembly — the serve-side composition the ANN index
    * and the packing ops exist for: every query retrieves its top-k
    * neighbor documents and packs them, IN RANK ORDER, into a context
    * window under a token budget (greedy prefix: cumulative tokens are
    * monotone, so `cum <= budget` IS the stop-at-first-overflow rule —
    * and is exactly replayable as a SQL window cumsum).
    *
    * Contract mirrors the batch-ANN rows: the assembled output is
    * computed over the EXACT batch top-k (deterministic, oracle-
    * recomputable), and `batch_recall_ok` gates that the persisted
    * IVF-SQ index probe recovers >= `bound` of the exact pairs — on a
    * production corpus the probe feeds the assembly directly and the
    * exact side is the sampled validation harness.
    *
    * Scale shape: retrieval is the batch probe (one broadcast
    * assignment join, pruned code-table scan); assembly adds ONE
    * narrow join (doc token counts — a projection of the corpus scan,
    * no text movement: the context carries doc IDS, the serving layer
    * fetches bodies point-wise) and a k-row-per-query window cumsum
    * partitioned by query — no global sort, no driver loop. */
  def ragContext(spark: org.apache.spark.sql.SparkSession, ivfDir: String,
                 sqDir: String, ivfSqDir: String, embeddings: DataFrame,
                 documents: DataFrame, queryPredicate: Column, k: Int = 5,
                 tokenBudget: Int = 128, nProbe: Int = 12, rerank: Int = 8,
                 bound: Double = 0.9): DataFrame = {
    val exact = Similarity.batchTopKExact(
      embeddings, embeddings.filter(queryPredicate), k).localCheckpoint()
    val ann = AnnIndex.batchProbeIvfSq(spark, ivfDir, sqDir, ivfSqDir,
      embeddings, queryPredicate, k, nProbe, rerank)
    val (total, hits) = Similarity.totalAndHits(exact, ann, Seq("query_id", "vec_id"))
    val ok = total == 0L || hits.toDouble / total >= bound

    val nTok = documents.select(col("doc_id").as("vec_id"),
      size(TextOps.tokens(col("text"))).as("n_tok"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    exact
      .join(nTok, Seq("vec_id"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= tokenBudget)
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("n_context_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("rank"), col("vec_id")))),
          x => x("vec_id").cast(StringType)), ",").as("context_doc_ids"))
      .withColumn("batch_recall_ok", lit(ok))
      .orderBy("query_id")
  }

  /** Weighted sampling without replacement — Efraimidis–Spirakis
    * exponential sort keys (public algorithm, IPL 2006): each doc draws
    * u in (0,1) from a DETERMINISTIC integer hash (the reservoir row's
    * Knuth multiplier) and ranks by u^(1/w) — realized as the monotone
    * equivalent ln(u)/w, so heavier docs (w = n_chars) float up with
    * exactly weight-proportional odds. The importance-sampling
    * primitive of a curation pipeline ("sample 1% of the corpus,
    * longer/higher-quality docs proportionally more often").
    *
    * Cross-engine: the integer hash is exact; ln(u)/w is ONE fixed
    * double expression spelled identically in the oracle, rounded into
    * DECIMAL(28,10) (ln outputs are non-terminating, so the half-way
    * tie class cannot arise — the BM25/LM discipline), and RANKING
    * uses the exact decimal. Per-lang top-k lowers to the TopKPerKey
    * heap operator: bounded state per partition, one key exchange —
    * the same plan as reservoirSample at any corpus size. */
  def weightedSample(documents: DataFrame, k: Int = 10): DataFrame = {
    val wkey = expr(
      "cast(round(ln((1 + (doc_id * 2654435761) % 999999) / 1000000.0)" +
        " / n_chars, 10) as decimal(28,10))")
    val ranked = documents
      .filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"), wkey.as("wkey"))
    graft.plans.TopK.perKey(ranked, Seq("lang"),
        Seq(col("wkey").desc, col("doc_id").asc), k)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        col("wkey").cast(DoubleType).as("wkey"), col("rn"))
      .orderBy("lang", "rn")
  }

  /** Corpus snapshot diff — the versioning primitive between two crawl
    * or pipeline epochs: which docs were added, removed, or changed.
    * The 100 TB shape: both sides reduce to (doc_id, fingerprint)
    * BEFORE the full-outer join — 8-byte xxhash64 fingerprints shuffle,
    * text bodies never do (the dedup-family bargain: hash equality
    * stands in for text equality under the no-collision event). The
    * changed/same verdict is a fingerprint compare; added/removed fall
    * out of the join's null sides. */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val fa = a.select(col("doc_id"), xxhash64(col("text")).as("fp_a"))
    val fb = b.select(col("doc_id"), xxhash64(col("text")).as("fp_b"))
    fa.join(fb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("same")).as("status"))
      .filter(col("status") =!= "same")
      .orderBy("doc_id")
  }

  /** The registered diff row: version B derives deterministically from
    * the corpus (drop id %% 17 == 0; append " rev2" to id %% 13 == 0;
    * add one new doc per id %% 29 == 0 at id + 1000000) — the oracle
    * rebuilds B by the same rules and diffs TEXT directly, so the
    * fingerprint bargain is on the hook. */
  def snapshotDiffDemo(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"))
    val next = base
      .filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(base.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("added "), col("doc_id").cast(StringType)).as("text")))
    snapshotDiff(base, next)
  }
}
