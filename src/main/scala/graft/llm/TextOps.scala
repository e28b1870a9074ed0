package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnFns

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization, token counting, quality scoring,
  * language-ID heuristic, per-source statistics, fingerprinting.
  *
  * All hot-path functions are built-in codegen'd expressions (split,
  * size, filter-HOF) — no Scala UDFs — so they scale to 100 TB scans
  * with full column pruning (only `text` + grouping keys are read).
  */
object TextOps {

  /** Whitespace tokenizer. The fixtures are pre-normalized ([a-z0-9 ]);
    * `normalizeTokens` additionally lowercases + strips non-alnum for
    * raw corpora. */
  def tokens(text: Column): Column = split(text, " ")

  def normalizeTokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9 ]", " ")), " +")

  /** Small English stopword list for the language-ID / quality
    * heuristics (public-domain list head). */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with", "at", "by")

  private def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(EnStopwords)))

  /** PII patterns shared verbatim with the DuckDB oracle — RE2-safe
    * (no lookaround), replace-all semantics in both engines. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction for training-data curation: scrub emails, phone
    * numbers, and IPv4 addresses from a text column, and count what
    * was removed (the counts drive corpus-level leakage reporting).
    * Order matters: emails first (their domains contain dot-runs an
    * aggressive IP pattern could clip), IPs before phones is safe
    * because the phone pattern requires dashes. Pure codegen'd
    * regexp_replace/extract_all — per-row, no shuffle, 100 TB-scan
    * friendly. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Re), lit(0))))
      .withColumn(
        "redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  /** Narrow (doc_id, text) scan, range-sorted BEFORE any expensive
    * projection: a projection under a global sort is evaluated twice
    * (the range-boundary sampling job re-executes the child plan), so
    * every per-row text operator below sorts the cheap input first and
    * projects after — the `propsMap`/media pattern (2.7 -> 0.7 s
    * measured there), applied family-wide. */
  private[llm] def sortedDocs(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text")).orderBy("doc_id")

  /** Per-document token counting (whitespace tokens + chars). */
  def tokenCount(documents: DataFrame): DataFrame =
    sortedDocs(documents)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))

  /** Per-source corpus statistics. Decimal-exact average for the
    * cross-engine compare. */
  def textStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast(LongType)).as("total_tokens"),
        graft.Tables.decAvg(length(col("text"))).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("source")

  /** Token frequency via explode (the Generator/UDTF class): top-k
    * tokens corpus-wide. Partial aggregation collapses the exploded
    * stream map-side, so the shuffle carries only distinct tokens. */
  def tokenExplode(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Stopword-ratio language-ID heuristic (n-gram/stopword class).
    * Deterministic + SQL-expressible so the oracle can replicate it. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val ratio = stopwordCount(toks).cast(DoubleType) / size(toks).cast(DoubleType)
    documents
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id")
      .select(
        col("doc_id"),
        col("lang").as("lang_declared"),
        ratio.as("en_stop_ratio"),
        when(ratio > 0.05, lit("en")).otherwise(lit("other")).as("lang_pred"))
  }

  /** Heuristic quality score: token count band + average word length
    * band + stopword presence. Pure comparisons/additions on exact
    * values — deterministic across engines. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks    = tokens(col("text"))
    val nTok    = size(toks)
    val avgWLen = (length(col("text")) - nTok + 1).cast(DoubleType) / nTok.cast(DoubleType)
    val stopR   = stopwordCount(toks).cast(DoubleType) / nTok.cast(DoubleType)
    val score =
      when(nTok.between(10, 2000), lit(0.5)).otherwise(lit(0.0)) +
      when(avgWLen.between(3.0, 10.0), lit(0.3)).otherwise(lit(0.0)) +
      when(stopR > 0.0, lit(0.2)).otherwise(lit(0.0))
    sortedDocs(documents)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        avgWLen.as("avg_word_len"),
        stopR.as("stop_ratio"),
        score.as("quality"))
  }

  /** Document fingerprints via the custom Catalyst expressions:
    * whole-doc FNV-1a (exact-dedup / shard key), 64-bit SimHash
    * (hamming-near-dup key), and the MOSS-style winnowing rolling-hash
    * fingerprint set (local-edit-robust overlap detection). */
  def fingerprint(documents: DataFrame): DataFrame =
    sortedDocs(documents)
      .select(
        col("doc_id"),
        ColumnFns.fnv1a64(col("text")).as("fp64"),
        ColumnFns.simhash64(tokens(col("text"))).as("simhash"),
        graft.functions.VectorFns.winnow(col("text")).as("winnow_fps"))

  /** The oracle-checkable face of `fingerprint`: per-doc k-gram /
    * window counts (recomputable from byte lengths by any SQL engine)
    * plus a `fp_bounds_ok` gate pinning winnowing's deterministic
    * guarantees — every emitted window selects a position, a position
    * heads at most w windows, and the distinct-hash set is a nonempty
    * subset of the selected positions:
    *   ceil(n_windows / w) <= n_selected_positions <= n_windows
    *   1 <= n_fingerprints <= n_selected_positions   (when windows > 0)
    * A broken rolling hash, deque, or dedup flips the gate on the
    * affected rows and breaks the driver's hash compare. */
  def fingerprintStats(documents: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val nGrams = greatest(octet_length(col("text")).cast(LongType) - (k - 1), lit(0L))
    // the kernel clamps the window to min(w, n): short-but-nonempty
    // docs emit exactly one whole-doc window
    val nWindows = when(nGrams === 0L, lit(0L))
      .when(nGrams < w.toLong, lit(1L))
      .otherwise(nGrams - (w - 1))
    val nPos = graft.functions.VectorFns.winnowPosCount(col("text"), k, w)
    val nFp = size(graft.functions.VectorFns.winnow(col("text"), k, w)).cast(LongType)
    sortedDocs(documents)
      .select(col("doc_id"), nGrams.as("n_grams"), nWindows.as("n_windows"),
        nPos.as("n_pos"), nFp.as("n_fp"))
      .select(
        col("doc_id"), col("n_grams"), col("n_windows"),
        when(col("n_windows") === 0L, col("n_pos") === 0L && col("n_fp") === 0L)
          .otherwise(
            col("n_pos") >= ceil(col("n_windows").cast(DoubleType) / w).cast(LongType) &&
            col("n_pos") <= col("n_windows") &&
            col("n_fp") >= 1L && col("n_fp") <= col("n_pos"))
          .as("fp_bounds_ok"))
  }

  /** Heavy hitters (frequent tokens above a support threshold) — the
    * vocabulary-pruning / stopword-discovery primitive. The OUTPUT is
    * the exact frequent set (one (token) count shuffle + threshold
    * filter); the single-pass distributed sketch (`stat.freqItems`,
    * Karp-Shenker-Papadimitriou) enters through its theorem gate: the
    * sketch result is a guaranteed SUPERSET of the truly-frequent set,
    * so `sketch_superset_ok` flips if the sketch ever loses a frequent
    * item. At 100 TB the sketch is the first pass (one scan, ~1/support
    * driver memory) and the exact count runs only over its candidates. */
  def heavyHitters(documents: DataFrame, support: Double = 0.02): DataFrame = {
    val tk = documents.select(explode(tokens(col("text"))).as("tok"))
    val total = tk.count()
    val exact = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(support) * lit(total.toDouble))
      .localCheckpoint() // used twice: gate probe + output
    val sketch = tk.stat.freqItems(Array("tok"), support)
      .head.getSeq[String](0).toSet
    val ok = sketch.nonEmpty &&
      exact.filter(!col("tok").isin(sketch.toSeq: _*)).limit(1).count() == 0
    exact.withColumn("sketch_superset_ok", lit(ok)).orderBy("tok")
  }

  /** BPE-ish regex tokenization (the GPT-2 pattern family, lookahead
    * dropped so the same pattern runs in RE2-based engines): runs of
    * letters/digits with an optional leading space, or punctuation
    * runs. Counts per doc. */
  val BpeishPattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def tokenCountBpe(documents: DataFrame): DataFrame =
    sortedDocs(documents)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0))).as("n_bpe_tokens"))

  /** TF-IDF feature scores per (doc, token): tf = in-doc frequency /
    * doc length, idf = ln((1+N)/(1+df)). Every stage is an equality-key
    * shuffle on (doc_id, token) or (token) — corpus-scale safe (a hot
    * stopword token skews the df join; AQE's skew split handles it).
    * The exact counts ride along so the float score is auditable. */
  def tfidf(documents: DataFrame, docLimit: Int = 20): DataFrame = {
    val nDocs = documents.count()
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf_count"))
    val len = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("doc_len"))
    val dfreq = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(len, "doc_id")
      .join(dfreq, "token")
      .withColumn("tfidf", round(
        (col("tf_count").cast(DoubleType) / col("doc_len")) *
          log((lit(1.0) + nDocs) / (lit(1.0) + col("df"))), 6))
      .filter(col("doc_id") < docLimit)
      .select(col("doc_id"), col("token"), col("tf_count"), col("doc_len"),
        col("df"), col("tfidf"))
      .orderBy("doc_id", "token")
  }

  /** Unigram LM quality proxy — the CCNet/RefinedWeb-style "perplexity
    * filter" with the LM reduced to the corpus's own unigram
    * distribution: each doc scored by the mean log-probability of its
    * tokens. Rare-token gibberish scores very low; degenerate
    * high-frequency repetition scores implausibly high — the standard
    * two-sided cut applied before tokenization when no external LM is
    * available.
    *
    * Scale shape: one (doc_id, token) explode feeds both the frequency
    * table and the scoring join; the frequency table is VOCAB-sized
    * (Zipf — tiny next to the corpus), so it broadcasts and the 100 TB
    * side never shuffles for the join; per-doc aggregation is the only
    * exchange. Open-vocab web corpora would drop the broadcast hint
    * and let AQE pick. Cross-engine float discipline: each ln is
    * rounded deterministically into DECIMAL(28,10) (Spark's
    * double->decimal cast = HALF_UP = DuckDB's ROUND-then-cast), the
    * sum is exact decimal, and only the final mean rounds to 6 dp —
    * accumulation order cannot move the hash. */
  /** Interpolated BIGRAM LM quality score — the conditional-probability
    * upgrade of `unigramLogProb`: per-doc mean of
    * ln(0.8·P(cur|prev) + 0.2·P(cur)), the Jelinek-Mercer smoothing a
    * CCNet-style perplexity filter actually runs (a pure unigram score
    * cannot see scrambled word order; the bigram term can). Context
    * counts are the bigram table's own marginals, so the model is
    * self-consistent (Σ_cur P(cur|prev) = 1 exactly).
    *
    * Scale shape: the unigram/context tables broadcast (Zipf); the
    * BIGRAM table carries no hint — at fixture scale AQE promotes it
    * to broadcast, on an open-vocab 100 TB corpus it becomes a shuffle
    * join keyed on (prev, cur), which is the honest cost of a
    * conditional model. Interpolation constants are spelled 0.8/0.2
    * LITERALLY in both engines (1.0-0.8 in binary is a DIFFERENT
    * double than the literal 0.2 — a 1-ULP trap that would flip the
    * DECIMAL rounding); the per-pair ln rounds into DECIMAL(28,10)
    * exactly like the unigram score, so sums are order-stable. */
  def bigramLogProb(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val pairs = documents.select(col("doc_id"),
      explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (p, c) => struct(p.as("prev"), c.as("cur")))).as("pc"))
      .select(col("doc_id"), col("pc.prev").as("prev"), col("pc.cur").as("cur"))
    val uniTok = documents.select(explode(toks).as("token"))
    val total = uniTok.count()
    val uni = uniTok.groupBy(col("token")).agg(count(lit(1)).as("uni_count"))
    val big = pairs.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("big_count"))
    val ctx = big.groupBy(col("prev")).agg(sum(col("big_count")).as("ctx_count"))
    pairs
      .join(big, Seq("prev", "cur"))
      .join(broadcast(ctx), Seq("prev"))
      .join(broadcast(uni.withColumnRenamed("token", "cur")), Seq("cur"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log(lit(0.8) * col("big_count") / col("ctx_count") +
            lit(0.2) * col("uni_count") / total.toDouble)
          .cast(DecimalType(28, 10))).cast(DecimalType(38, 10)).cast(DoubleType)
          .as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s") / col("n_bigrams"), 6).as("mean_logprob2"))
      .orderBy("doc_id")
  }

  def unigramLogProb(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    // the corpus token count is the one driver scalar the score needs
    val total = tok.count()
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("tok_count"))
    tok.join(broadcast(freq), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(log(col("tok_count").cast(DoubleType) / total.toDouble)
          .cast(DecimalType(28, 10))).cast(DecimalType(38, 10)).cast(DoubleType)
          .as("__s"))
      .select(col("doc_id"), col("n_tok"),
        round(col("__s") / col("n_tok"), 6).as("mean_logprob"))
      .orderBy("doc_id")
  }

  /** Gopher-style quality rules (Rae et al. 2021 §A1.1, the
    * rule-based pre-filter every production corpus pass runs before
    * the model-based ones): document-level structural gates —
    * word-count bounds, mean-word-length bounds, minimum stopword
    * presence, maximum single-word dominance. All four thresholds are
    * evaluated in INTEGER cross-multiplied form (e.g. stopword
    * fraction ≥ 2% as `stop_cnt * 50 >= n_words`), so the whole
    * operator — counts, flags, verdict — is exact integer arithmetic
    * with zero cross-engine float surface.
    *
    * Scale shape: one tokenize/explode pass, one (doc, token) count
    * agg, one per-doc rollup — the same two-level aggregation shape
    * as the repetition filter; no joins, no windows. */
  def gopherRules(documents: DataFrame,
                  minWords: Int = 40, maxWords: Int = 10000): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val perTok = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
    val agg = perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * length(col("token"))).as("n_letters"),
        sum(when(col("token").isin(EnStopwords: _*), col("c"))
          .otherwise(lit(0L))).as("stop_cnt"),
        max(col("c")).as("top_cnt"))
    agg.select(col("doc_id"), col("n_words"), col("stop_cnt"), col("top_cnt"),
        (col("n_words").between(minWords, maxWords) &&
          col("n_letters") >= col("n_words") * 3 &&
          col("n_letters") <= col("n_words") * 10 &&
          col("stop_cnt") * 50 >= col("n_words") &&
          col("top_cnt") * 5 <= col("n_words")).as("passes"))
      .orderBy("doc_id")
  }

  /** DSIR importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * score every raw document by how target-like it is under two bag
    * unigram models — log w(x) = Σ_tok [ln p_t(tok) − ln p_r(tok)]
    * with add-1 smoothing over the shared corpus vocabulary, p_t
    * fitted on the docs matching `targetLang`, p_r on the whole pool —
    * then select the top `selectFrac` by score (the deterministic
    * rank-based variant; the randomized Gumbel top-k of the paper
    * swaps in via the q_sample_weighted key machinery when sampling
    * diversity matters more than reproducibility).
    *
    * Cross-engine ln discipline (the unigramLogProb recipe): each ln
    * rounds into DECIMAL(28,10), both sums are exact decimals, their
    * difference is exact, ranking happens ON the exact decimal (ln
    * outputs are non-terminating — no half-way ties), and only the
    * REPORTED score rounds to 6 dp.
    *
    * Scale shape: one tokenize pass; both count tables are
    * vocabulary-sized (Zipf) so the enrichment joins broadcast; the
    * per-doc score is one grouped decimal sum. The final rank is a
    * global window — fine to the ~10^9-doc range; past that the
    * selection threshold comes from a sampled score quantile instead
    * (selection is a threshold either way, only its calibration
    * changes). */
  def dsirScore(documents: DataFrame, targetLang: String = "en",
                selectFrac: Double = 0.2): DataFrame = {
    val tok = documents.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("token"))
    val vocab = tok.select(col("token")).distinct().count()
    val nTarget = tok.filter(col("lang") === targetLang).count()
    val nRaw = tok.count()
    val tFreq = tok.filter(col("lang") === targetLang)
      .groupBy(col("token")).agg(count(lit(1)).as("t_count"))
    val rFreq = tok.groupBy(col("token")).agg(count(lit(1)).as("r_count"))
    def lnDec(c: Column, n: Long): Column =
      log((c.cast(DoubleType) + lit(1.0d)) / lit((n + vocab).toDouble))
        .cast(DecimalType(28, 10))
    val scored = tok
      .join(broadcast(rFreq), Seq("token"))
      .join(broadcast(tFreq), Seq("token"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        (sum(lnDec(coalesce(col("t_count"), lit(0L)), nTarget)).cast(DecimalType(38, 10)) -
          sum(lnDec(col("r_count"), nRaw)).cast(DecimalType(38, 10)))
          .cast(DecimalType(38, 10)).as("__d"))
    val kSel = math.floor(documents.count() * selectFrac).toLong
    scored
      .withColumn("__rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__d").desc, col("doc_id"))))
      .select(col("doc_id"), col("n_tok"),
        // REPORT the per-token mean (the division's non-terminating
        // quotient keeps the 6-dp round off half boundaries — the sum
        // itself CAN land exactly on one, where the engines' double
        // rounding splits); SELECTION ranked on the exact-decimal SUM
        // (length-weighted, as in the paper)
        round(col("__d").cast(DoubleType) / col("n_tok"), 6).as("dsir_logratio"),
        (col("__rank") <= kSel).as("selected"))
      .orderBy("doc_id")
  }

  /** PMI collocations — pointwise mutual information over ADJACENT
    * token pairs, the classic collocation-extraction signal (Church &
    * Hanks 1990): pmi(a,b) = ln( p(ab) / (p(a) p(b)) ) with p from the
    * corpus's own counts. High-PMI pairs are phrases that co-occur far
    * above chance — a curation pipeline uses them for stop-phrase
    * lists, tokenizer merge seeding, and boilerplate detection.
    *
    * Scale shape: bigram + unigram counts are two hash aggs over one
    * tokenize pass; the count tables are VOCABULARY-sized (the Zipf
    * argument), so the two enrichment joins broadcast and the final
    * top-k orders a vocab^2-bounded table — no corpus-sized work after
    * the aggregation. Cross-engine: one fixed double expression
    * (identical operand order), rounded into DECIMAL(28,10), RANKED on
    * the exact decimal (ln outputs non-terminating => no half-way
    * ties); ties in the rational itself break on the term pair. */
  def pmiCollocations(documents: DataFrame, minCount: Int = 5,
                      k: Int = 20): DataFrame = {
    val toks = documents.select(tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .localCheckpoint()
    val uni = toks.select(explode(col("t")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nt = toks.select(coalesce(sum(size(col("t"))), lit(0L)).as("nt"))
    val bg = toks.filter(size(col("t")) >= 2)
      .select(col("t"), explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(element_at(col("t"), col("i")).as("term_a"),
        element_at(col("t"), col("i") + 1).as("term_b"))
      .localCheckpoint()
    val bc = bg.groupBy(col("term_a"), col("term_b")).agg(count(lit(1)).as("n_ab"))
    val nb = bg.select(count(lit(1)).as("nb"))
    val pmiRaw = log(
      (col("n_ab").cast(DoubleType) / col("nb")) /
        ((col("ca").cast(DoubleType) / col("nt")) *
          (col("cb").cast(DoubleType) / col("nt"))))
    bc.filter(col("n_ab") >= minCount)
      .join(broadcast(uni.select(col("term").as("term_a"), col("c").as("ca"))), Seq("term_a"))
      .join(broadcast(uni.select(col("term").as("term_b"), col("c").as("cb"))), Seq("term_b"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
      .withColumn("pmi_d", round(pmiRaw, 10).cast(DecimalType(28, 10)))
      .orderBy(col("pmi_d").desc, col("term_a"), col("term_b"))
      .limit(k)
      .select(col("term_a"), col("term_b"), col("n_ab"),
        col("pmi_d").cast(DoubleType).as("pmi"))
  }
}
