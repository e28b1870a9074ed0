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
  * Algorithm: PassJoin-style segment blocking (Li, Deng & Feng,
  * "PassJoin: A Partition-based Method for Similarity Joins", VLDB
  * 2012 — public literature) at threshold tau = 1. The indexed side
  * splits every string into tau+1 = 2 contiguous segments; by
  * PIGEONHOLE, a single edit touches at most one segment, so any
  * string within distance 1 contains the OTHER segment verbatim,
  * shifted by at most 1 position. The probe side therefore enumerates,
  * per string of length m, the candidate index lengths l in
  * {m-1, m, m+1}, both segment slots, and the <=3 admissible start
  * positions — at most 18 constant-length substrings per probe — and
  * equality-joins them against the segment table. Survivors are
  * verified with one exact levenshtein call.
  *
  * Why this is the 100 TB shape: the blocking join is a bare
  * equality join on (segment text, slot, length) between two tables
  * that are each O(input) rows — never the all-pairs product, and
  * never even the length-band product (which is what the ORACLE runs:
  * the test oracle replays length-banded brute force, so engine ==
  * oracle is the pigeonhole THEOREM holding, not two copies of the
  * same code agreeing). Segment keys are short strings with natural
  * selectivity; the verify set is the candidate set, which PassJoin's
  * paper shows is within a small factor of the true result on real
  * dirty data. The exact verify uses the THRESHOLDED levenshtein
  * (public Spark >= 3.5 three-arg form) — O(tau * len) per pair
  * instead of O(len^2), the banded-DP optimization.
  */
object FuzzyJoin {

  /** PassJoin at tau = 1: all (probe, index) pairs within edit
    * distance 1. `index` must expose (`clean_id`, `s`); `probes`
    * (`dirty_id`, `q`). Output: (dirty_id, clean_id, dist), every
    * matched pair exactly once. */
  def editDistanceJoin(index: DataFrame, probes: DataFrame): DataFrame = {
    // indexed side: 2 segments per string — seg1 = s[1 .. l/2],
    // seg2 = s[l/2+1 .. l] (floor split, the scheme the probe side
    // re-derives from l alone)
    val segs = index
      .select(col("clean_id"), col("s"), length(col("s")).as("l"))
      .filter(col("l") >= 2)
      .select(col("clean_id"), col("s"), col("l"),
        explode(array(
          struct(lit(1).as("slot"), expr("substring(s, 1, l div 2)").as("seg")),
          struct(lit(2).as("slot"), expr("substring(s, l div 2 + 1, l - l div 2)").as("seg"))
        )).as("x"))
      .select(col("clean_id"), col("s"), col("l"),
        col("x.slot").as("slot"), col("x.seg").as("seg"))
    // probe side: enumerate (candidate length, slot, shifted start)
    val probeSubs = probes
      .select(col("dirty_id"), col("q"), length(col("q")).as("m"))
      .withColumn("l", explode(expr("array(m - 1, m, m + 1)")))
      .filter(col("l") >= 2)
      .withColumn("slot", explode(expr("array(1, 2)")))
      .withColumn("li", when(col("slot") === 1, expr("l div 2"))
        .otherwise(col("l") - expr("l div 2")))
      .withColumn("pi", when(col("slot") === 1, lit(1)).otherwise(expr("l div 2 + 1")))
      .withColumn("p", explode(expr("array(pi - 1, pi, pi + 1)")))
      .filter(col("p") >= 1 && col("p") <= col("m") - col("li") + 1)
      .select(col("dirty_id"), col("q"), col("l"), col("slot"),
        expr("substring(q, p, li)").as("seg"))
    val candidates = probeSubs
      .join(segs, Seq("seg", "slot", "l"))
      .select(col("dirty_id"), col("q"), col("clean_id"), col("s"))
      .distinct()
    candidates
      // thresholded levenshtein returns -1 above the bound: banded DP
      .select(col("dirty_id"), col("clean_id"),
        expr("levenshtein(q, s, 1)").as("dist"))
      .filter(col("dist") >= 0)
      .orderBy("dirty_id", "clean_id")
  }

  /** The registered row: canonical titles are each document's first
    * five tokens; every fifth document yields a "scraped" variant with
    * ONE character deleted at a position that walks the string
    * (doc_id/5 mod len) — so the edit lands in either segment across
    * the corpus, exercising both pigeonhole cases. Both derivations
    * are plain string expressions the oracle replays verbatim; the
    * MATCH the oracle checks is brute force over the length band. */
  def titleResolution(documents: DataFrame): DataFrame = {
    val clean = documents
      .select(col("doc_id").as("clean_id"),
        filter(split(col("text"), " "), t => length(t) > 0).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("clean_id"),
        array_join(slice(col("t"), 1, 5), " ").as("s"))
      .localCheckpoint()
    val dirty = clean
      .filter(col("clean_id") % 5 === 0)
      .select(col("clean_id").as("dirty_id"),
        expr("concat(substring(s, 1, (clean_id div 5) % length(s))," +
          " substring(s, (clean_id div 5) % length(s) + 2))").as("q"))
    editDistanceJoin(clean, dirty)
  }
}
