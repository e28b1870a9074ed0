package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** BM25 lexical retrieval — the term-frequency complement of the ANN
  * stack (hybrid retrieval = this + the vector probes; curation uses
  * the same scoring to mine domain-relevant documents by keyword
  * profile). Okapi BM25 with the standard k1=1.2, b=0.75.
  *
  * Dataflow: the corpus tokenizes ONCE into a (doc_id, term, tf)
  * postings table + a (doc_id, dl) length table (one corpus-keyed
  * shuffle each); query terms and the per-term document frequencies
  * BROADCAST (query sets are small; the df table is vocabulary-sized
  * — Zipf, the unigram-LM argument); scoring is a map-side join over
  * the postings of the queried terms only, then one (query, doc) agg
  * and a TopKPerKey-lowered rank. Nothing query-sized ever shuffles
  * the corpus.
  *
  * Cross-engine determinism (the LM-row discipline): every per-term
  * score is computed in ONE fixed double expression — identical
  * operand order and literal spelling on both engines, fractional
  * literals CAST to DOUBLE in the oracle (DuckDB parses bare `1.2`
  * as DECIMAL — decimal folding would diverge from Spark's double
  * arithmetic) — then rounded into DECIMAL(28,10); the per-document
  * SUM is exact decimal, so accumulation order cannot move it, and
  * RANKING orders by the exact decimal sum (never the rounded double
  * output). ln() inputs are rational-but-non-terminating, so the
  * half-way-tie class the PageRank respelling hit cannot arise.
  *
  * Query sets are drawn from the corpus (every 250th doc; its first
  * `nQueryTerms` tokens form the query bag, multiplicity preserved —
  * the standard BM25 sum over query-term occurrences). */
object Bm25 {

  def score(documents: DataFrame, queryPredicate: Column, k: Int = 10,
            nQueryTerms: Int = 4): DataFrame = {
    val toks = documents
      .select(col("doc_id"), filter(split(col("text"), " "), t => length(t) > 0).as("t"))
      .filter(size(col("t")) > 0)
    val dls = toks.select(col("doc_id"), size(col("t")).as("dl"))
    val postings = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfTab = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))

    // corpus stats: two exact longs -> one exact double division,
    // identical on the oracle side
    val stats = dls.agg(count(lit(1)), sum(col("dl"))).collect()(0)
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n

    val qterms = documents.filter(queryPredicate)
      .select(col("doc_id").as("query_id"),
        explode(slice(filter(split(col("text"), " "), t => length(t) > 0),
          1, nQueryTerms)).as("term"))

    // ONE fixed double expression per (query term, posting); spelled
    // identically in the oracle (operand order + literal casts)
    val idf = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
    val tfn = (col("tf") * (lit(1.2) + lit(1.0))) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / lit(avgdl)))

    val perTerm = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfTab), Seq("term"))
      .join(dls, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        (idf * tfn).cast(DecimalType(28, 10)).as("c"))
    perTerm
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("s"))
      // rank on the EXACT decimal sum; the rounded double is output-only
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("s").cast(DoubleType), 6).as("bm25"))
      .orderBy("query_id", "rank")
  }

  /** Hybrid retrieval — reciprocal-rank fusion of the BM25 lexical
    * list and the exact vector top-k for the same query docs:
    * rrf = Σ 1/(60 + rank) over the lists a document appears in (the
    * standard RRF with the standard 60). Fusion is pure rank
    * arithmetic — 1/(60+r) of small ints is the identical double in
    * both engines, one addition per doc, ranked on the raw double
    * (the rounded value is output-only, same discipline as BM25) —
    * so the whole composition replays in SQL. Queries missing one
    * modality (the embeddings fixture covers a prefix of the doc-id
    * domain at some SFs) fuse from the list they have — the
    * partial-modality case a mixed corpus hits in production. */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                queryPredicate: Column, k: Int = 5, perList: Int = 10,
                rrfBase: Int = 60): DataFrame = {
    val lex = score(documents, queryPredicate, k = perList)
      .select(col("query_id"), col("doc_id"), col("rank").as("rl"))
    val vec = Similarity.batchTopKExact(embeddings,
        embeddings.withColumnRenamed("vec_id", "doc_id")
          .filter(queryPredicate).withColumnRenamed("doc_id", "vec_id"), perList)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank").as("rv"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfBase) + col("rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfBase) + col("rv")), lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy("query_id", "rank")
  }
}
