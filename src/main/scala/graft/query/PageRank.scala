package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed PageRank — the link-authority quality signal a crawl
  * curation pipeline attaches to documents (host-graph ranking is the
  * standard upweight for well-linked sources; the reference has no
  * graph op, this is a north-star extension alongside the dedup/CC
  * family).
  *
  * Iterative dataflow: each round is ONE join of the edge list with
  * the current rank vector plus one hash aggregation of the
  * contributions — the textbook bulk-synchronous shape. Rounds are
  * `localCheckpoint`ed so lineage stays flat (the CC discipline);
  * at 100 TB each round shuffles O(|edges|) narrow (dst, long) rows
  * and the rank vector is O(|nodes|) — never materialized to the
  * driver.
  *
  * Cross-engine determinism: ranks are INTEGER FIXED-POINT at scale
  * 10^-12 and every step is integer arithmetic — `div` for the
  * out-degree split and the 85/100 damping, exact BIGINT sums. No
  * floating operation exists anywhere in the iteration, so there is
  * no rounding mode to disagree on (a first cut that rounded decimal
  * contributions hit genuine half-way ties at the 10th decimal:
  * rank/2 of a scale-10 decimal ENDS on the .5 boundary by
  * construction, and Spark's HALF_UP double→decimal cast vs DuckDB's
  * ROUND disagreed on 4 of 500 nodes — integers make the class
  * impossible rather than rare). The single float op is the final
  * output division r/10^12, on exact inputs below 2^53 — bit-identical
  * in both engines. Integer `div` floors, so each split sheds < 1
  * ulp(10^-12) of mass per round — bounded and deterministic, the
  * fixed-point analog of the float drift every PageRank has.
  *
  * The demo graph derives deterministically from the corpus ids
  * (contiguous 0..N-1 in the fixtures): every node emits edges to
  * (id+1) mod N and (id²+3) mod N — the chain rule keeps every node
  * emitting (no dangling mass) while the quadratic rule is
  * non-bijective, so in-degrees and converged ranks vary (a first
  * cut with a second BIJECTIVE rule produced a doubly-stochastic
  * graph whose exact stationary distribution is uniform — correct
  * and useless). Out-degree comes from the deduped edge table, so
  * nodes where both rules coincide are handled exactly.
  */
object PageRank {

  /** Fixed-point scale: 1 rank unit = 10^-12. */
  val Scale: Long = 1000000000000L

  def rank(documents: DataFrame, iters: Int = 4): DataFrame = {
    val n = documents.count()
    val ids = documents.select(col("doc_id"))
    val edges = ids.select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst"))
      .unionByName(ids.select(col("doc_id").as("src"),
        ((col("doc_id") * col("doc_id") + 3) % n).as("dst")))
      .distinct()
      .localCheckpoint()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()

    // teleport term (0.15/N) in fixed point, floored — Scala integer
    // division here, `//` in the oracle: identical semantics
    val teleport = Scale * 15L / 100L / n
    var ranks = ids.select(col("doc_id"), lit(Scale / n).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(outdeg, "src")
        .join(ranks.select(col("doc_id").as("src"), col("r").as("rs")), "src")
        .select(col("dst").as("doc_id"), expr("rs div outdeg").as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("s"))
      ranks = ids.join(contribs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(teleport) + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks
      .select(col("doc_id"),
        (col("r").cast(DoubleType) / Scale).as("pagerank"))
      .orderBy("doc_id")
  }
}
