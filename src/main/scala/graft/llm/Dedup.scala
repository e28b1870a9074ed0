package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Exact Jaccard over two sorted distinct hash sets via the fused
    * merge-scan kernel: |A∩B| from one O(n+m) loop, |A∪B| by
    * inclusion-exclusion — same integers, hence bit-identical
    * quotients, as the array_intersect/array_union spelling it
    * replaces (which built a hash set + two arrays per candidate
    * pair). */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.VectorFns.sortedIntersectSize(a, b)
    inter.cast(DoubleType) / (size(a) + size(b) - inter).cast(DoubleType)
  }

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
    // Both the band self-join (two sides) and the verification
    // re-attach (two sides) would otherwise re-run the fused
    // shingle/minhash kernels over the corpus per consumer; the
    // signature and hash-set tables are exactly what a production
    // minhash index persists, so materialize each once.
    val hashed = shingleHashSets(documents, shingleSize).localCheckpoint()
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
      .localCheckpoint()

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

  /** X2 exact n-gram Jaccard similarity join via positional prefix
    * filtering — the non-probabilistic sibling of minhashPairs
    * (SSJoin/PPJoin family): 100% recall at the threshold, no
    * bands/rows tuning.
    *
    * Theorem (prefix filter): order every shingle set by a global
    * total order. If J(A,B) >= t then |A∩B| >= ceil(t*max|A|,|B|),
    * and two sets with overlap >= a share an element within the first
    * |S| - a + 1 elements of each. So joining only on each doc's first
    * |S| - ceil(t*|S|) + 1 shingles finds EVERY qualifying pair;
    * exact Jaccard verification then removes false candidates. The
    * order in force is RAREST-FIRST (ascending global document
    * frequency — see prefixTuples): the theorem holds for any common
    * total order, but DF-ascending is the one that keeps hot
    * boilerplate shingles out of prefixes, so candidate volume tracks
    * true-pair density rather than hot-shingle density.
    *
    * Scale shape: the equality join carries (shingle, doc_id) for the
    * prefix only — ~(1-t)*|S| per doc; candidates are pair-deduped
    * before the wide hash-set arrays are re-attached. No cross join,
    * no recall loss; residual hot prefix shingles (corpora where even
    * the rare tail is shared) remain AQE-skew-join territory.
    */
  /** Per-doc prefix tuples (doc_id, n, shingle) under the GLOBAL total
    * order the prefix-filter theorem quantifies over. Two orders:
    *
    *  - `rarestFirst = true` (the production path): ascending global
    *    document frequency, ties by shingle value — the PPJoin/AllPairs
    *    ordering. Prefixes fill with the corpus's RAREST shingles, and
    *    a df=1 shingle joins with nothing, so prefix slots spent on it
    *    produce zero candidates; the globally-hot shingles (shared by
    *    half a template-heavy corpus, each contributing O(n_s^2) pairs)
    *    sort LAST and stay out of prefixes wherever the threshold
    *    allows. One DF aggregate + one rank join — both ~ the shingle
    *    volume the prefix explode already pays — buys candidate counts
    *    that track true-pair density instead of hot-shingle density
    *    (DedupSpec measures 34x on a boilerplate corpus).
    *  - `rarestFirst = false`: the shingle-hash order the sets already
    *    carry (ShingleHashSet emits sorted) — zero preprocessing,
    *    random-uniform prefixes; kept for the spec's A/B measurement.
    *
    * Correctness is order-INVARIANT: the theorem only needs both sides
    * to use the same total order, and exact verification follows. */
  private def prefixTuples(sh: DataFrame, threshold: Double,
                           rarestFirst: Boolean): DataFrame = {
    if (!rarestFirst) {
      val prefixLen = greatest(
        lit(1),
        (size(col("hs")).cast(DoubleType) -
          ceil(size(col("hs")).cast(DoubleType) * lit(threshold)) + 1).cast(IntegerType))
      sh.select(col("doc_id"), size(col("hs")).as("n"),
        posexplode(slice(col("hs"), lit(1), prefixLen)).as(Seq("__p0", "shingle")))
        .select(col("doc_id"), col("n"), col("shingle"), (col("__p0") + 1).as("pos"))
    } else {
      val exploded = sh.select(col("doc_id"), size(col("hs")).as("n"),
        explode(col("hs")).as("shingle"))
      val df = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val prefixLen = greatest(
        lit(1),
        (col("n").cast(DoubleType) -
          ceil(col("n").cast(DoubleType) * lit(threshold)) + 1).cast(IntegerType))
      exploded
        .join(df, Seq("shingle"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
        .filter(col("pos") <= prefixLen)
        .select(col("doc_id"), col("n"), col("shingle"), col("pos"))
    }
  }

  /** PPJoin positional filter, applied per colliding prefix element:
    * J(A,B) >= t forces overlap >= ceil(t/(1+t) * (|A|+|B|)), and a
    * collision at (posA, posB) in the COMMON total order caps the
    * achievable overlap at 1 + min(|A|-posA, |B|-posB) (everything
    * before the collision positions is disjoint by construction of the
    * first match; later collisions only have less suffix left). A true
    * pair's FIRST collision always satisfies the bound, so pruning
    * collision rows that fail it loses no pair — it only stops
    * low-position-overlap junk from reaching the pair-dedup shuffle. */
  private def positionalBound(threshold: Double): Column =
    lit(1) + least(col("l.n") - col("l.pos"), col("r.n") - col("r.pos")) >=
      // required overlap alpha = ceil(t/(1+t) * (|A|+|B|)); the 1e-9
      // slack keeps double rounding from pushing ceil ONE above the
      // exact rational when t(|A|+|B|)/(1+t) is an exact integer —
      // a too-strict alpha could prune a J == t pair; a too-loose one
      // only lets junk through to exact verification.
      ceil(lit(threshold / (1 + threshold)) *
        (col("l.n") + col("r.n")).cast(DoubleType) - lit(1e-9)).cast(IntegerType)

  /** Candidate (doc_a, doc_b) pairs from the prefix join, deduped —
    * exposed for the spec's candidate-count A/B measurement. */
  private[graft] def ngramCandidatePairs(documents: DataFrame, shingleSize: Int = 3,
                                         threshold: Double = 0.5,
                                         rarestFirst: Boolean = true): DataFrame =
    ngramCandidatePairsFrom(shingleHashSets(documents, shingleSize), threshold, rarestFirst)

  private def ngramCandidatePairsFrom(sh: DataFrame, threshold: Double,
                                      rarestFirst: Boolean): DataFrame = {
    val prefix = prefixTuples(sh, threshold, rarestFirst)
    // Length filter rides the equality join: J(A,B) <= min/max of the
    // set sizes, so mismatched sizes can't clear the threshold — pairs
    // die before the pair-dedup shuffle (~24% of candidates at sf0.1).
    // The positional filter then caps achievable overlap per collision.
    prefix.as("l")
      .join(prefix.as("r"),
        col("l.shingle") === col("r.shingle") && col("l.doc_id") < col("r.doc_id") &&
          least(col("l.n"), col("r.n")).cast(DoubleType) >=
            lit(threshold) * greatest(col("l.n"), col("r.n")) &&
          positionalBound(threshold))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  def ngramJaccardPairs(documents: DataFrame, shingleSize: Int = 3,
                        threshold: Double = 0.5,
                        rarestFirst: Boolean = true): DataFrame = {
    // The hashed shingle sets feed FOUR consumers under rarest-first
    // (the DF aggregate, the rank join, and both verification
    // re-attaches); materialize them once instead of re-tokenizing and
    // re-hashing the corpus per consumer. The checkpointed frame is
    // (doc_id, int-array) — a fraction of the text it came from, and
    // the same corpus-sized artifact a production run would persist
    // between dedup stages anyway.
    val sh0 = shingleHashSets(documents, shingleSize)
    val sh = if (rarestFirst) sh0.localCheckpoint() else sh0
    val candidates = ngramCandidatePairsFrom(sh, threshold, rarestFirst)

    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-set exact n-gram Jaccard join (delta vs corpus): the same
    * positional prefix filter as ngramJaccardPairs, but across two
    * DISJOINT document sets — the incremental-dedup shape, where a new
    * ingest batch is checked against the standing corpus without ever
    * re-joining the corpus to itself. 100% recall at the threshold by
    * the same prefix-filter theorem; only (shingle, doc_id) prefix
    * tuples of BOTH sides shuffle, and the candidate pair set is
    * deduped before the wide hash-set arrays re-attach. */
  def ngramJaccardAcross(left: DataFrame, right: DataFrame,
                         shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    // materialized once for the same four-consumer reason as
    // ngramJaccardPairs (union DF, rank join, verification re-attach)
    val shL = shingleHashSets(left, shingleSize).localCheckpoint()
    val shR = shingleHashSets(right, shingleSize).localCheckpoint()
    // Rarest-first needs ONE total order common to both sides, so the
    // document frequency is taken over the UNION of the two shingle
    // populations. One-shot spelling: a standing ingest cycle keeps
    // the corpus DF as maintained state instead (IncrementalDeduper).
    val unionDf = shL.unionByName(shR)
      .select(explode(col("hs")).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    crossPairsVerified(shL, shR, unionDf, threshold)
  }

  /** Cross-set prefix join + exact verification against an EXPLICIT
    * shingle document-frequency table (the common rarest-first total
    * order). Shared by the one-shot ngramJaccardAcross (union DF
    * computed fresh) and IncrementalDeduper (DF table maintained across
    * batches). `dfTable` must cover every shingle of both sides. */
  private def crossPairsVerified(shL: DataFrame, shR: DataFrame,
                                 dfTable: DataFrame, threshold: Double): DataFrame = {
    def prefixed(sh: DataFrame): DataFrame = {
      val prefixLen = greatest(
        lit(1),
        (col("n").cast(DoubleType) -
          ceil(col("n").cast(DoubleType) * lit(threshold)) + 1).cast(IntegerType))
      sh.select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("shingle"))
        .join(dfTable, Seq("shingle"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
        .filter(col("pos") <= prefixLen)
        .select(col("doc_id"), col("n"), col("shingle"), col("pos"))
    }
    val prefL = prefixed(shL)
    val prefR = prefixed(shR)

    val candidates = prefL.as("l")
      .join(prefR.as("r"),
        col("l.shingle") === col("r.shingle") &&
          least(col("l.n"), col("r.n")).cast(DoubleType) >=
            lit(threshold) * greatest(col("l.n"), col("r.n")) &&
          positionalBound(threshold))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .join(shL.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(shR.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** The standing ingest-dedup session (VERDICT r6 #4): the corpus's
    * shingle sets, its global shingle document-frequency table, and its
    * distinct text set are built ONCE at init, and `append` MAINTAINS
    * them by merging each accepted batch's counts — no corpus re-scan,
    * re-tokenize, or DF recompute per delta. `dedupBatch` flags a new
    * batch against the current state using the same cross-set prefix
    * join as the one-shot `incrementalDedup` (bit-identical output: the
    * merged DF table equals the union-DF by construction).
    *
    * At 100 TB these three artifacts are the dedup index a production
    * ingest pipeline persists between batches; here they are
    * session-lived localCheckpoints with the same maintenance algebra
    * (count merge under full-outer join; set union for texts). */
  final class IncrementalDeduper private[llm] (
      initState: IncrementalDeduper.State,
      shingleSize: Int, threshold: Double,
      stateDir: Option[String], initEpoch: Int) {

    /** Session-lived state (localCheckpoints): the in-memory spelling —
      * the ONLY scans of the corpus source are paid at construction.
      * For state that must survive a job restart, use
      * `IncrementalDeduper.init` / `.open` (parquet-backed epochs). */
    def this(corpus: DataFrame, shingleSize: Int = 3, threshold: Double = 0.7) =
      this(IncrementalDeduper.memoryState(corpus, shingleSize),
        shingleSize, threshold, None, 0)

    private var state = initState
    private var epoch = initEpoch

    /** Delta-side shingle sets + the batch's DF merged into the
      * standing table (counts add under a full-outer join). */
    private def batchState(shD: DataFrame): DataFrame = {
      val deltaDf = shD.select(explode(col("hs")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      state.df.select(col("shingle"), col("df").as("df_c"))
        .join(deltaDf.select(col("shingle"), col("df").as("df_d")),
          Seq("shingle"), "full_outer")
        .select(col("shingle"),
          (coalesce(col("df_c"), lit(0L)) + coalesce(col("df_d"), lit(0L))).as("df"))
    }

    /** Same report as `incrementalDedup(delta, corpus)` — exact-dup +
      * near-dup flags per delta doc — but against the MAINTAINED state:
      * the only per-batch work is the delta's own hashing plus the
      * prefix join, never a corpus pass. */
    def dedupBatch(delta: DataFrame): DataFrame = {
      val shD = shingleHashSets(delta, shingleSize).localCheckpoint()
      val exactIds = delta.select(col("doc_id"), col("text"))
        .join(state.texts, Seq("text"), "left_semi")
        .select(col("doc_id"))
        .withColumn("exact_dup", lit(true))
      val nearIds = crossPairsVerified(shD, state.sh, batchState(shD), threshold)
        .select(col("doc_a").as("doc_id")).distinct()
        .withColumn("near_dup", lit(true))
      delta.select(col("doc_id"))
        .join(exactIds, Seq("doc_id"), "left")
        .join(nearIds, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
          coalesce(col("near_dup"), lit(false)).as("near_dup"))
        .orderBy("doc_id")
    }

    /** Accept a batch into the corpus: merge its shingle sets, DF
      * counts, and texts into the standing state. In-memory mode
      * re-checkpoints (lineage stays flat across many batches);
      * persisted mode writes the merged state to the NEXT epoch's
      * parquet dirs — reads of the current epoch feed writes of the
      * next, never a self-overwrite — then flips the META marker
      * atomically, so a crash mid-append leaves the previous epoch
      * intact and reopenable. */
    def append(delta: DataFrame): Unit = {
      val shD = shingleHashSets(delta, shingleSize).localCheckpoint()
      stateDir match {
        case None =>
          // order matters: the DF merge reads the PRE-append state
          state = IncrementalDeduper.State(
            state.sh.unionByName(shD).localCheckpoint(),
            batchState(shD).localCheckpoint(),
            state.texts.unionByName(delta.select(col("text")))
              .distinct().localCheckpoint())
        case Some(dir) =>
          val spark = delta.sparkSession
          val next = epoch + 1
          val e = s"$dir/epoch=$next"
          state.sh.unionByName(shD)
            .write.mode("overwrite").parquet(s"$e/shingles")
          batchState(shD).write.mode("overwrite").parquet(s"$e/df")
          state.texts.unionByName(delta.select(col("text"))).distinct()
            .write.mode("overwrite").parquet(s"$e/texts")
          IncrementalDeduper.writeMeta(spark, dir, shingleSize, threshold, next)
          epoch = next
          state = IncrementalDeduper.readState(spark, dir, next)
      }
    }
  }

  /** Persistence for the standing dedup state (VERDICT r7 #3): the
    * corpus shingle sets, global shingle-DF table, and distinct text
    * set live as parquet under `stateDir/epoch=N/...` with an
    * atomically-replaced META marker naming the current epoch — the
    * artifact-dir discipline of AnnIndex applied to dedup state, so
    * the production ingest cycle this models survives job restarts: a
    * NEW session `open`s the dir and continues dedup/append WITHOUT
    * ever rescanning the corpus. All state + META I/O goes through the
    * Hadoop FS API under the session's hadoop conf, so the chain lives
    * wherever the session's warehouse does; on an object store without
    * atomic rename, the META flip maps to a conditional put or a
    * metastore transaction. */
  object IncrementalDeduper {
    private[llm] final case class State(sh: DataFrame, df: DataFrame, texts: DataFrame)

    private[llm] def memoryState(corpus: DataFrame, shingleSize: Int): State = {
      val sh = shingleHashSets(corpus, shingleSize).localCheckpoint()
      val df = sh.select(explode(col("hs")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
      State(sh, df, corpus.select(col("text")).distinct().localCheckpoint())
    }

    private[llm] def readState(spark: SparkSession, stateDir: String,
                               epoch: Int): State = {
      val e = s"$stateDir/epoch=$epoch"
      State(spark.read.parquet(s"$e/shingles"), spark.read.parquet(s"$e/df"),
        spark.read.parquet(s"$e/texts"))
    }

    /** Initialize persisted state from the corpus (the only corpus
      * scans — same count as the in-memory constructor) and open it. */
    def init(corpus: DataFrame, stateDir: String, shingleSize: Int = 3,
             threshold: Double = 0.7): IncrementalDeduper = {
      val spark = corpus.sparkSession
      val e1 = s"$stateDir/epoch=1"
      shingleHashSets(corpus, shingleSize)
        .write.mode("overwrite").parquet(s"$e1/shingles")
      // DF derives from the just-written shingle table, not a re-scan
      spark.read.parquet(s"$e1/shingles")
        .select(explode(col("hs")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$e1/df")
      corpus.select(col("text")).distinct()
        .write.mode("overwrite").parquet(s"$e1/texts")
      writeMeta(spark, stateDir, shingleSize, threshold, 1)
      open(spark, stateDir)
    }

    /** Reopen persisted state — NO corpus access: the restarted ingest
      * job's entry point. Params travel with the state (META), so the
      * reopened session dedups under the same contract it was built
      * with. */
    def open(spark: SparkSession, stateDir: String): IncrementalDeduper = {
      val (shingleSize, threshold, epoch) = readMeta(spark, stateDir)
      new IncrementalDeduper(readState(spark, stateDir, epoch),
        shingleSize, threshold, Some(stateDir), epoch)
    }

    /** Retention sweep for the epoch chain (round-9 sibling of the
      * IVF cell compaction): every `append` writes a FULL next-epoch
      * state, so a long-running ingest cycle accumulates one complete
      * state copy per batch — at production state sizes that is the
      * dominant storage cost of the whole scheme. Drop every epoch
      * older than the newest `keep` (default 1 = current only; keep=2
      * preserves one rollback target). The CURRENT epoch is never
      * eligible, and epochs NEWER than META's current (a crashed
      * half-written append) are left alone — the next append
      * overwrites them. Listing+deletes go through the Hadoop
      * FileSystem API, so the same sweep works on HDFS/S3-style
      * stores; on an object store, run it only after the META flip is
      * visible to readers (same ordering contract as append itself).
      *
      * @return (droppedEpochs, remainingEpochs). */
    def vacuum(spark: SparkSession, stateDir: String,
               keep: Int = 1): (Seq[Int], Seq[Int]) = {
      require(keep >= 1, s"keep must be >= 1, got $keep")
      val (_, _, current) = readMeta(spark, stateDir)
      val root = new org.apache.hadoop.fs.Path(stateDir)
      // session conf, not a bare Configuration(): an hdfs/s3a session's
      // credentials and fs impls must reach the sweep (ADVICE r9)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val epochs = fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
        .map(_.getPath.getName.stripPrefix("epoch=").toInt)
        .sorted
      val cut = current - keep + 1
      val drop = epochs.filter(e => e < cut && e <= current)
      drop.foreach(e =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/epoch=$e"), true))
      (drop, epochs.filterNot(drop.contains))
    }

    // META I/O goes through the Hadoop FS API with the SESSION's
    // hadoop conf (ADVICE r9: the java.nio spelling was local-only and
    // a bare `new Configuration()` would miss s3a/hdfs credentials),
    // so the whole epoch-chain lifecycle — write, read, vacuum —
    // ports to HDFS/S3-style stores together. The atomic-replace flip
    // uses FileContext rename with OVERWRITE (plain FileSystem.rename
    // refuses an existing destination on several implementations); on
    // an object store without atomic rename the same flip is a
    // conditional put or a metastore transaction.
    private def writeMeta(spark: SparkSession, stateDir: String,
                          shingleSize: Int, threshold: Double, epoch: Int): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val dir = new org.apache.hadoop.fs.Path(stateDir)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, "META.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"$shingleSize\n$threshold\n$epoch\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
      fc.rename(tmp, new org.apache.hadoop.fs.Path(dir, "META"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    private def readMeta(spark: SparkSession, stateDir: String): (Int, Double, Int) = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/META")
      val in = p.getFileSystem(conf).open(p)
      val ls =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      (ls(0).trim.toInt, ls(1).trim.toDouble, ls(2).trim.toInt)
    }
  }

  /** SUBSTRING-level dedup report — the repeated-passage shape
    * doc-level dedup misses entirely (boilerplate headers, license
    * blocks, templated paragraphs shared across otherwise-distinct
    * docs; the "deduplicating training data" ExactSubstr discipline
    * bounded to fixed windows): every `w`-token window of every doc is
    * fingerprinted, a window seen in >= 2 DISTINCT docs marks its
    * occurrences duplicated, and each doc reports its duplicated-
    * window share — the removal/trim decision input.
    *
    * Scale shape: the window explode is ~corpusTokens rows but carries
    * only (doc_id, hash8) — the window STRINGS die inside the scan
    * projection, so the two aggregations shuffle 16-byte rows. At
    * 100 TB add a stride and/or a Bloom prefilter of repeated hashes;
    * the dataflow is unchanged. The cross-doc test is countDistinct
    * over doc_id, so a window repeated only WITHIN one doc (already
    * covered by the repetition filters) does not flag. 64-bit
    * fingerprint collisions (~1e-9 at 10^5.5 windows) trade exactness
    * for never shuffling strings — the minhash bargain. */
  def substringDupStats(documents: DataFrame, w: Int = 20): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val wins = documents
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - (w - 1)),
          i => xxhash64(array_join(slice(col("t"), i, lit(w)), " ")))).as("h"))
    val dupHashes = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val perDoc = wins.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
    val dupPerDoc = wins.join(dupHashes, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_windows"))
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        when(col("n_windows") > 0,
          round(col("n_dup_windows").cast(DoubleType) / col("n_windows"), 6))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  /** Dedup over CONTENT-DEFINED chunks — the composition CDC exists
    * for: `Curation.chunkCdc`'s edit-stable chunks are fingerprinted
    * (64-bit; chunk strings die in the projection) and a chunk seen in
    * >= 2 distinct docs is duplicated; per doc: chunk/duplicated-chunk
    * counts, duplicated tokens, and the duplicated-token share. Where
    * the fixed-window `substringDupStats` re-fingerprints every
    * 20-token offset, CDC fingerprints each token ONCE (one chunk per
    * token), and a local edit re-syncs — so an incremental corpus pays
    * re-hashing only for edited chunks. Same two 16-byte-row
    * aggregations as the substring report; oracle groups chunk
    * STRINGS (the no-collision bargain). */
  def cdcChunkDupStats(documents: DataFrame): DataFrame = {
    val chunks = graft.llm.Curation.chunkCdc(documents)
      .select(col("doc_id"), col("n_tokens"),
        xxhash64(col("chunk_text")).as("h"))
    val dup = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val perDoc = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("n_tok"))
    val dupPerDoc = chunks.join(dup, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_chunks"), sum(col("n_tokens")).as("n_dup_tokens"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(coalesce(col("n_dup_tokens"), lit(0L)).cast(DoubleType) /
          col("n_tok"), 6).as("dup_token_frac"))
      .orderBy("doc_id")
  }

  /** Substring dedup APPLIED — passage REMOVAL with keep-first
    * semantics (the ExactSubstr removal pass: later occurrences of a
    * cross-doc-repeated window are cut, the first — smallest doc_id —
    * survives, so shared boilerplate remains represented exactly once
    * in the training corpus). A token is removed iff it lies inside
    * any removable window of its doc; the cleaned text is the
    * surviving tokens in order.
    *
    * Scale shape: the window explode carries (doc_id, pos, hash8)
    * only; removable POSITIONS (not strings) shuffle back and are
    * collected per doc — bounded by that doc's own window count — and
    * the cut itself is row-local array arithmetic: covered =
    * flatten(sequence(p, p+w-1)), kept = array_except(all positions,
    * covered) (hash-based, O(n) per doc), tokens re-joined in order.
    * The corpus text never reshuffles; only (doc_id, pos) pairs do.
    * Same 64-bit-fingerprint bargain as the marker report; the oracle
    * groups the window STRINGS, so equality is the no-collision
    * event. */
  def substringDedupApply(documents: DataFrame, w: Int = 20): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val wins = documents
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("t")) - (w - 1)),
          i => xxhash64(array_join(slice(col("t"), i, lit(w)), " ")))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"), min(col("doc_id")).as("first_doc"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("first_doc"))
    val remPerDoc = wins.join(dup, Seq("h"))
      .filter(col("doc_id") =!= col("first_doc"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("rpos"))
    documents
      .join(remPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), toks.as("t"),
        coalesce(col("rpos"), array().cast("array<int>")).as("rpos"))
      .select(col("doc_id"), col("t"),
        array_except(sequence(lit(1), size(col("t"))),
          array_distinct(flatten(transform(col("rpos"),
            p => sequence(p, p + (w - 1)))))).as("keep"))
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        (size(col("t")) - size(col("keep"))).as("n_removed"),
        array_join(transform(col("keep"),
          k => element_at(col("t"), k)), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Incremental dedup report: each document of the `delta` batch
    * flagged for exact duplication (identical text) and near
    * duplication (n-gram Jaccard >= `threshold`) AGAINST the standing
    * corpus. The production cycle this models: dedupe each ingest
    * batch against the corpus before appending, so the corpus is never
    * self-joined again after its initial clean. Exact flag = 8-byte
    * fingerprint semi-join; near flag = cross-set prefix join. */
  def incrementalDedup(delta: DataFrame, corpus: DataFrame,
                       threshold: Double = 0.7): DataFrame = {
    val exactIds = delta.select(col("doc_id"), col("text"))
      .join(corpus.select(col("text")).distinct(), Seq("text"), "left_semi")
      .select(col("doc_id"))
      .withColumn("exact_dup", lit(true))
    val nearIds = ngramJaccardAcross(delta, corpus, threshold = threshold)
      .select(col("doc_a").as("doc_id")).distinct()
      .withColumn("near_dup", lit(true))
    delta.select(col("doc_id"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"))
      .orderBy("doc_id")
  }

  /** End-to-end dedup APPLY: the surviving corpus after near-dup
    * removal — one canonical doc (the component's min doc_id) per
    * near-dup group, with its metadata and the size of the group it
    * represents. This is the operator a pipeline actually materializes
    * between curation and tokenization; pairs/clusters are the
    * intermediate evidence. */
  def applyDedup(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(documents, pairs)
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("group_size"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(labels, Seq("doc_id"))
      .filter(col("doc_id") === col("component"))
      .join(sizes, Seq("component"))
      .select(col("doc_id"), col("lang"), col("source"), col("group_size"))
      .orderBy("doc_id")
  }

  /** Dedup clustering: connected components over a near-dup pair list,
    * so each group of mutually-similar docs keeps one canonical
    * survivor (the min doc_id of its component).
    *
    * Min-label propagation to fixpoint: every vertex starts as its own
    * label; each round pushes labels across edges and keeps the min.
    * Rounds = graph diameter — near-dup components are tiny cliques /
    * short chains (diameter <= 3-4 in practice), so this converges in
    * a handful of shuffles on doc_id. Each round is one equality join
    * + one min-aggregate: fully distributed, nothing on the driver but
    * the convergence counter. At adversarial diameters switch to the
    * alternating large-star/small-star MapReduce CC (Kiveris et al.),
    * which squares the label-propagation rate; the per-round dataflow
    * is the same join+min shape.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // Materialize the edge list ONCE: the pair-join pipeline feeding
    // `edges` is the expensive part, and every propagation round (plus
    // the convergence probe) would otherwise re-execute it from the
    // scan. PERSISTED rather than localCheckpointed: the cache's real
    // sizes let the planner broadcast the SMALL side of each round's
    // propagation join (checkpoint origin stats are garbage-big, which
    // forced an SMJ exchanging BOTH tables every round — the cached
    // plan in plans/r19/cc_round_after.txt shows the edge scan feeding
    // the join with no exchange and the label table broadcast).
    // Released before return (the result is handed over checkpointed).
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.select(col("doc_id"), col("doc_id").as("component"))
    // Convergence probe via the MONOTONE LABEL SUM (guide §1.2 — don't
    // pay a join for what an aggregate proves): min-propagation only
    // ever lowers a vertex's label and never drops a vertex, so the
    // exact per-round label sum strictly decreases iff ANY label
    // changed — equal sums == fixpoint. One tiny aggregate job on the
    // just-checkpointed labels replaces the old per-round
    // next-join-prior improvement probe (a join + two exchanges of the
    // label table, every round). DECIMAL(38,0) keeps the sum exact at
    // any scale (ANSI long sum would overflow on 10^12-row corpora).
    // The sum is sound ONLY for integral ids (a string id casts to a
    // null decimal — every round would sum to 0 and "converge" after
    // one propagation; a fractional id truncates and can mask a
    // change): non-integral id types fall back to the join-based
    // any-label-changed probe, which works for any orderable type.
    val sumProbeOk = {
      import org.apache.spark.sql.types._
      labels.schema("component").dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var curSum = if (sumProbeOk) labelSum(labels) else java.math.BigDecimal.ZERO
    var converged = false
    var iter = 0
    // labels persist per round instead of localCheckpoint: the cached
    // groupBy(doc_id) output KEEPS its hash partitioning, so the next
    // round's join on src (= doc_id aliased — alias-aware partitioning)
    // needs no label exchange either; the probe aggregate doubles as
    // the cache materializer, and the prior round unpersists as soon
    // as the probe no longer needs it.
    var cached: Option[DataFrame] = None
    while (!converged && iter < maxIters) {
      val round = labels.unionByName(sym
          .join(labels.select(col("doc_id").as("src"), col("component")), Seq("src"))
          .select(col("dst").as("doc_id"), col("component")))
        .groupBy("doc_id").agg(min("component").as("component"))
      if (iter == 1) graft.ops.PlanDump.dump("cc_round", round)
      val next = round
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (sumProbeOk) {
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(curSum) == 0
        curSum = nextSum
      } else {
        converged = next.as("n")
          .join(labels.as("p"), col("n.doc_id") === col("p.doc_id"))
          .filter(col("n.component") =!= col("p.component"))
          .limit(1).count() == 0L
      }
      cached.foreach(_.unpersist())
      cached = Some(next)
      labels = next
      iter += 1
    }
    // hand consumers a checkpointed result so the caches can release
    // (several callers re-join the label table more than once)
    val out = labels.orderBy("doc_id").localCheckpoint()
    cached.foreach(_.unpersist())
    sym.unpersist()
    out
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond")
    * — the adversarial-diameter path. Plain min-label propagation
    * (above) needs diameter-many rounds, O(n) shuffles on a chain-
    * shaped dup graph; star rounds square the contraction rate, so a
    * 500-vertex chain converges in O(log n) rounds (see
    * DedupClusterSpec). Each round is the same join+min dataflow as
    * propagation: one groupBy-min + one equality join over the edge
    * list, fully distributed.
    *
    * Edge currency: canonical (u < v) pairs.
    *  - large-star: center c over BOTH directions, m = min(N(c) ∪ {c});
    *    every strictly-larger neighbor n > c re-attaches to m.
    *  - small-star: center = the larger endpoint v of each canonical
    *    edge, m = min of its smaller neighbors; those neighbors and v
    *    itself re-attach to m.
    * Fixpoint = depth-1 stars rooted at each component's min id. */
  private[graft] def connectedComponentsStarRounds(
      vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 40): (DataFrame, Int) = {
    def canon(df: DataFrame): DataFrame = df
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()

    // canonicalize KEYED on the next consumer's key (guide §2.4 — two
    // operations keyed the same way share one exchange): hash-
    // partitioning by `v` alone co-locates equal (u, v) rows, so the
    // dedup is exchange-free on top of the repartition, and smallStar's
    // groupBy("v") + equality join on "v" both RIDE the same exchange.
    // Same set as `canon` (dropDuplicates == distinct on these keys).
    def canonByV(df: DataFrame): DataFrame = df
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .repartition(col("v"))
      .dropDuplicates("u", "v")

    var e = canon(edges.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      canonByV(sym.filter(col("v") > col("u"))
        .join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // canonical (u < v): center v, smaller-neighbor u
      val mins = e.groupBy("v").agg(min(col("u")).as("m"))
      canon(e.join(mins, Seq("v"))
        .select(col("u"), col("m").as("v"))
        .unionByName(mins.select(col("v").as("u"), col("m").as("v"))))
    }

    // convergence probe: the exact set-equality test (exceptAll —
    // shuffles BOTH edge tables) now runs ONLY when the cheap monotone
    // witnesses already match. Star rounds never increase an edge's
    // endpoint sum and only merge rows, so the canonical edge set's
    // (count, Σ(u+v)) pair is non-increasing round over round; a round
    // that changed either is PROVEN unconverged by one tiny aggregate
    // on the just-checkpointed edges (guide §1.2). Σ only certifies
    // for integral ids (string ids sum to null) — non-integral ids
    // keep the exceptAll-every-round probe.
    val idsIntegral = {
      import org.apache.spark.sql.types._
      e.schema("u").dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
    }
    def stat(df: DataFrame): (Long, java.math.BigDecimal) =
      if (!idsIntegral) (df.count(), java.math.BigDecimal.ZERO)
      else {
        val r = df.agg(count(lit(1)), sum((col("u") + col("v"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
        (r.getLong(0),
          Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
      }
    var rounds = 0
    var converged = false
    var curStat = stat(e) // carried across rounds: 1 probe job per round
    while (!converged && rounds < maxIters) {
      val round = smallStar(largeStar(e))
      if (rounds == 0) graft.ops.PlanDump.dump("cc_star_round", round)
      val next = round.localCheckpoint()
      val nextStat = stat(next)
      converged = nextStat == curStat &&
        next.exceptAll(e).limit(1).count() == 0
      curStat = nextStat
      e = next
      rounds += 1
    }
    // min-agg guards the maxIters-exhausted case (a vertex could still
    // carry >1 star edge there); at a true fixpoint it's a no-op.
    val labels = vertices
      .join(e.select(col("v").as("doc_id"), col("u").as("component")), Seq("doc_id"), "left")
      .groupBy("doc_id")
      .agg(min(coalesce(col("component"), col("doc_id"))).as("component"))
      .orderBy("doc_id")
    (labels, rounds)
  }

  def connectedComponentsStar(vertices: DataFrame, edges: DataFrame,
                              maxIters: Int = 40): DataFrame =
    connectedComponentsStarRounds(vertices, edges, maxIters)._1

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

  /** Word n-gram strings as simhash FEATURES (shingled features): the
    * unigram feature set of two template-similar docs overlaps heavily
    * even when their content differs, which squeezes all simhashes of
    * a template-heavy corpus into a few bits of each other and makes
    * Hamming blocking near-quadratic. n-gram features change with
    * every local edit, so unrelated docs' feature sets are near-
    * disjoint and their simhashes near-independent — blocking density
    * drops to ~the true-pair rate. Docs shorter than n tokens
    * contribute one whole-doc feature (never an empty set, whose
    * simhash 0 would collide corpus-wide). */
  private def shingleFeatures(t: Column, n: Int): Column =
    if (n <= 1) t
    else when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array(array_join(t, " ")))

  /** X2 SimHash near-dup: 64-bit simhash over shingled features,
    * blocked on 4x16-bit chunks with Hamming-1 multiprobe, verified
    * with exact Hamming distance. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3,
                   featureShingle: Int = 3): DataFrame =
    simhashCandidates(documents, featureShingle = featureShingle)
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")

  /** The chunk blocking stage of simhashPairs, pre-Hamming filter:
    * every pair whose simhashes agree on some 16-bit chunk up to ONE
    * differing bit. One side of the equality join probes each chunk's
    * exact value plus its 16 Hamming-1 variants (the same multiprobe
    * idiom as the embedding L-tables LSH), which upgrades the plain
    * pigeonhole guarantee from Hamming <= 3 to Hamming <= 7: if every
    * chunk of a pair differs in >= 2 bits, the total distance is >= 8.
    * Token-level simhash on ~10^2-token docs flips ~4-8 bits for real
    * near-dups (measured at sf0.01), so exact-chunk blocking alone
    * misses them.
    *
    * Bucket cap (the posting-list frequency cap of production simhash
    * indexes): buckets larger than `maxBucket` on the build side are
    * dropped — a chunk value shared by that many docs carries ~no
    * signal, and real near-dups also agree on discriminative chunks.
    * The cap bounds the worst case at n * 4 * 17 * maxBucket pairs.
    *
    * Feature choice is the scale lever, measured on the fixture
    * corpus: UNIGRAM features (featureShingle=1) squeeze template-
    * similar short docs within a few bits of each other corpus-wide,
    * and the Hamming-1 neighborhood of many small buckets yields ~13%
    * of ALL pairs as candidates at sf0.1 (1.6M for 5k docs —
    * quadratic in spirit; the cap does not bind). SHINGLED features
    * (the default, word 3-grams) make unrelated docs' feature sets
    * near-disjoint, so their simhashes decorrelate: measured density
    * 0.12% of all pairs at sf0.1 (14.5k candidates, 113x fewer) with
    * blocking recall vs the 0.7-Jaccard truth 1.0 / 1.0 / 0.984 at
    * sf0.001/0.01/0.1 (gate bound 0.9; DedupSpec pins both numbers).
    * With density tracking the true-pair rate this IS a standalone
    * 100 TB blocking path; the prefix-filtered exact join
    * (ngramJaccardPairs) remains the zero-recall-loss alternative. */
  /** (doc_id, sim) — the 64-bit simhash column the blocking operates
    * on, under the chosen feature definition. */
  def simhashes(documents: DataFrame, featureShingle: Int = 3): DataFrame =
    documents.select(
      col("doc_id"),
      ColumnFns.simhash64(shingleFeatures(TextOps.tokens(col("text")), featureShingle))
        .as("sim"))

  def simhashCandidates(documents: DataFrame, maxBucket: Int = 256,
                        featureShingle: Int = 3): DataFrame = {
    // The simhash column feeds THREE consumers below (bucket-size agg,
    // probe side, build side); with shingled features each evaluation
    // re-builds every n-gram string and re-hashes it, so materialize
    // the (doc_id, sim) pairs once — 16 bytes/doc, and the same
    // signature table a production simhash index persists anyway
    // (measured: blocking stage 6.0 s -> ~1 s at sf0.1).
    val sims = simhashes(documents, featureShingle).localCheckpoint()
    val chunked = sims.select(
      col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL))
      }: _*)).as(Seq("chunk_idx", "chunk_val")))

    val bucketSizes = chunked.groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select(col("chunk_idx"), col("chunk_val"))

    val probes = chunked.select(
      col("doc_id").as("doc_a"), col("sim").as("sim_a"), col("chunk_idx"),
      explode(array(
        col("chunk_val") +:
          (0 until 16).map(b => col("chunk_val").bitwiseXOR(lit(1L << b))): _*))
        .as("chunk_val"))
    val r = chunked.join(bucketSizes, Seq("chunk_idx", "chunk_val"), "left_semi")
      .select(col("chunk_idx"), col("chunk_val"),
        col("doc_id").as("doc_b"), col("sim").as("sim_b"))

    probes.join(r, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Oracle gate for the simhash path (the annRecallGate pattern for
    * non-SQL-portable internals): the OUTPUT rows are the exact
    * prefix-filtered n-gram Jaccard pairs at `threshold` — fully
    * recomputable by the SQL oracle — and the simhash blocking enters
    * as a boolean `simhash_recall_ok` column, TRUE iff the chunk-join
    * candidate set covers >= `bound` of the exact pairs. A blocking
    * regression (bad hash, dropped chunk, broken join) flips the
    * column on every row and breaks the hash match. */
  def simhashRecallGate(documents: DataFrame, shingleSize: Int = 3,
                        threshold: Double = 0.7, bound: Double = 0.9,
                        featureShingle: Int = 3): DataFrame = {
    val truth = ngramJaccardPairs(documents, shingleSize, threshold)
      .localCheckpoint() // evaluated twice (count + output) — cut the join lineage
    val (total, hits) = Similarity.totalAndHits(truth,
      simhashCandidates(documents, featureShingle = featureShingle),
      Seq("doc_a", "doc_b"))
    truth.withColumn("simhash_recall_ok",
      lit(total == 0L || hits.toDouble / total >= bound))
  }

  /** Oracle gate for the MinHash path — the same pattern as
    * simhashRecallGate, because minhash recall is PROBABILISTIC at the
    * threshold by construction (P[miss] = (1-J^r)^b; for b=32/r=4
    * that is ~4-5% for pairs sitting right at J=0.5). The old all-pairs
    * equality oracle only held where the fixture planted no
    * near-threshold pairs (sf0.001/0.01); at sf0.1 five of 256 true
    * pairs sit close enough to the cliff to slip the bands — correct
    * LSH behavior, so the honest contract is the exact pair list plus a
    * measured recall bound (0.98 at sf0.1), not exact equality. */
  def minhashRecallGate(documents: DataFrame, shingleSize: Int = 3,
                        threshold: Double = 0.5, bound: Double = 0.9): DataFrame = {
    val truth = ngramJaccardPairs(documents, shingleSize, threshold)
      .localCheckpoint() // evaluated twice (count + output) — cut the join lineage
    val (total, hits) = Similarity.totalAndHits(truth,
      minhashPairs(documents, shingleSize, jaccardThreshold = threshold),
      Seq("doc_a", "doc_b"))
    truth.withColumn("minhash_recall_ok",
      lit(total == 0L || hits.toDouble / total >= bound))
  }
}
