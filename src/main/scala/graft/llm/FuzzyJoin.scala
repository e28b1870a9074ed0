package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance similarity join — the entity-resolution
  * primitive of a curation pipeline (matching scraped titles /
  * citations / author strings against a canonical table, where the
  * scrape introduces typo-level noise). The reference has no fuzzy
  * op; this extends the dedup family from token-set similarity
  * (Jaccard / MinHash) to CHARACTER-level similarity.
  *
  * Algorithm: PassJoin segment blocking (Li, Deng & Feng, "PassJoin:
  * A Partition-based Method for Similarity Joins", VLDB 2012 — public
  * literature) at threshold `tau`. The indexed side splits every
  * string into tau+1 contiguous segments (even floor partition:
  * segment i of a length-l string spans ((i-1)l div (tau+1), il div
  * (tau+1)]); by PIGEONHOLE, tau edits touch at most tau segments, so
  * any string within distance tau contains SOME segment verbatim,
  * shifted by at most tau positions. The probe side therefore
  * enumerates, per string of length m, the candidate index lengths
  * l in [m-tau, m+tau], all tau+1 segment slots, and the <= 2tau+1
  * admissible start positions — at most (2tau+1)^2 (tau+1) constant-
  * length substrings per probe — and equality-joins them against the
  * segment table. Survivors are verified with one exact thresholded
  * levenshtein call.
  *
  * Why this is the 100 TB shape: the blocking join is a bare equality
  * join on (segment text, slot, length) between two tables that are
  * each O(input) rows — never the all-pairs product, and never even
  * the length-band product (which is what the ORACLE runs: the test
  * oracle replays length-banded brute force, so engine == oracle is
  * the pigeonhole THEOREM holding, not two copies of the same code
  * agreeing). Segment keys are short strings with natural
  * selectivity; the verify uses the THRESHOLDED levenshtein (public
  * Spark >= 3.5 three-arg form) — O(tau * len) banded DP per pair
  * instead of O(len^2).
  */
object FuzzyJoin {

  /** PassJoin at threshold `tau`: all (probe, index) pairs within edit
    * distance tau. `index` must expose (`clean_id`, `s`); `probes`
    * (`dirty_id`, `q`). Output: (dirty_id, clean_id, dist), every
    * matched pair exactly once. Indexed strings shorter than tau+1
    * cannot host tau+1 non-empty segments and are skipped (their
    * matches are degenerate at title scale). */
  def editDistanceJoin(index: DataFrame, probes: DataFrame,
                       tau: Int = 1): DataFrame = {
    require(tau >= 1, "tau must be >= 1")
    val nSeg = tau + 1
    // indexed side: even floor partition into tau+1 segments —
    // seg(slot) = s[((slot-1)*l div nSeg) + 1 .. slot*l div nSeg],
    // the scheme the probe side re-derives from (l, slot) alone
    val segs = index
      .select(col("clean_id"), col("s"), length(col("s")).as("l"))
      .filter(col("l") >= nSeg)
      .withColumn("slot", explode(expr(s"sequence(1, $nSeg)")))
      .withColumn("st", expr(s"((slot - 1) * l) div $nSeg + 1"))
      .withColumn("li", expr(s"(slot * l) div $nSeg") - col("st") + 1)
      .select(col("clean_id"), col("s"), col("l"), col("slot"),
        expr("substring(s, st, li)").as("seg"))
    // probe side: enumerate (candidate length, slot, shifted start)
    val probeSubs = probes
      .select(col("dirty_id"), col("q"), length(col("q")).as("m"))
      .withColumn("l", explode(expr(s"sequence(m - $tau, m + $tau)")))
      .filter(col("l") >= nSeg)
      .withColumn("slot", explode(expr(s"sequence(1, $nSeg)")))
      .withColumn("st", expr(s"((slot - 1) * l) div $nSeg + 1"))
      .withColumn("li", expr(s"(slot * l) div $nSeg") - col("st") + 1)
      .withColumn("p", explode(expr(s"sequence(st - $tau, st + $tau)")))
      .filter(col("p") >= 1 && col("p") <= col("m") - col("li") + 1)
      .select(col("dirty_id"), col("q"), col("l"), col("slot"),
        expr("substring(q, p, li)").as("seg"))
    // candidate DEDUP runs on bare id pairs — the strings join back
    // only for the verify, AFTER the distinct (the family discipline:
    // fingerprints/ids shuffle, payloads don't)
    val candidates = probeSubs
      .join(segs.select(col("seg"), col("slot"), col("l"), col("clean_id")),
        Seq("seg", "slot", "l"))
      .select(col("dirty_id"), col("clean_id"))
      .distinct()
    candidates
      .join(probes.select(col("dirty_id"), col("q")), Seq("dirty_id"))
      .join(index.select(col("clean_id"), col("s")), Seq("clean_id"))
      // thresholded levenshtein returns -1 above the bound: banded DP
      .select(col("dirty_id"), col("clean_id"),
        expr(s"levenshtein(q, s, $tau)").as("dist"))
      .filter(col("dist") >= 0)
      .orderBy("dirty_id", "clean_id")
  }

  /** Canonical titles (first five tokens of every doc) and their
    * derivation-shared dirty variants. `clean` feeds the index side
    * of both registered rows. */
  private def cleanTitles(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id").as("clean_id"),
        filter(split(col("text"), " "), t => length(t) > 0).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("clean_id"),
        array_join(slice(col("t"), 1, 5), " ").as("s"))

  /** The registered tau=1 row: every fifth document yields a
    * "scraped" variant with ONE character deleted at a position that
    * walks the string (doc_id/5 mod len) — so the edit lands in
    * either segment across the corpus, exercising both pigeonhole
    * cases. Both derivations are plain string expressions the oracle
    * replays verbatim; the MATCH the oracle checks is brute force
    * over the length band. */
  def titleResolution(documents: DataFrame): DataFrame = {
    val clean = cleanTitles(documents).localCheckpoint()
    val dirty = clean
      .filter(col("clean_id") % 5 === 0)
      .select(col("clean_id").as("dirty_id"),
        expr("concat(substring(s, 1, (clean_id div 5) % length(s))," +
          " substring(s, (clean_id div 5) % length(s) + 2))").as("q"))
    editDistanceJoin(clean, dirty)
  }

  /** The registered tau=2 row: the same corpus with TWO chained
    * character deletions (positions walk independently via div 5 and
    * div 7), probing the 3-segment blocking — two edits can now hit
    * two different segments and the third must still match. */
  def titleResolution2(documents: DataFrame): DataFrame = {
    val clean = cleanTitles(documents).localCheckpoint()
    val d1 = clean
      .filter(col("clean_id") % 5 === 0)
      .select(col("clean_id").as("dirty_id"),
        expr("concat(substring(s, 1, (clean_id div 5) % length(s))," +
          " substring(s, (clean_id div 5) % length(s) + 2))").as("q1"))
    val dirty = d1.select(col("dirty_id"),
      expr("concat(substring(q1, 1, (dirty_id div 7) % length(q1))," +
        " substring(q1, (dirty_id div 7) % length(q1) + 2))").as("q"))
    editDistanceJoin(clean, dirty, tau = 2)
  }
}
