package graft

import org.apache.spark.sql.functions._

import graft.llm.{Bm25, Similarity}

/** BM25 lexical retrieval + RRF hybrid fusion. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("bm25 matches a hand-computed score on a known corpus") {
    val corpus = Seq(
      (0L, "spark runs fast"),
      (1L, "spark spark joins tables"),
      (2L, "duck runs slow and slow")).toDF("doc_id", "text")
    // query doc 0's first 4 terms = [spark, runs, fast]
    val out = Bm25.score(corpus, col("doc_id") === 0, k = 10)
      .collect().map(r => (r.getLong(2), r.getInt(1), r.getDouble(3)))
    // replicate the formula (same operand order) for doc 1, term "spark"
    val n = 3.0; val avgdl = (3 + 4 + 5).toDouble / 3
    def score(tf: Long, df: Long, dl: Long): Double =
      math.log((n - df + 0.5) / (df + 0.5) + 1) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    // doc 0 matches all three query terms; doc 1 only "spark"; doc 2 only "runs"
    val exp0 = r10(score(1, 2, 3)) + r10(score(1, 2, 3)) + r10(score(1, 1, 3))
    val exp1 = r10(score(2, 2, 4))
    val exp2 = r10(score(1, 2, 5))
    val expected = Seq((0L, exp0), (1L, exp1), (2L, exp2))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, s), i) =>
        (id, i + 1, s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(out.toSeq == expected)
  }

  test("bm25 fixture invariants: positive scores, contiguous ranks, repartition-insensitive") {
    val out = Bm25.score(docs, col("doc_id") % 250 === 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(3) > 0), "Lucene-style +1 idf keeps scores positive")
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"query $q")
    }
    val re = Bm25.score(docs.repartition(7), col("doc_id") % 250 === 2).collect()
    assert(re.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq ==
      out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("rrf fusion recomputes from the component rankings and keeps only union docs") {
    val emb = Tables.embeddings(spark, sf)
    val fused = Bm25.hybridRrf(docs, emb, col("doc_id") % 250 === 2).collect()
    assert(fused.nonEmpty)
    val lex = Bm25.score(docs, col("doc_id") % 250 === 2, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val vec = Similarity.batchTopKExact(emb, emb.filter(col("vec_id") % 250 === 2), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect = lex.get(key).map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.get(key).map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(lex.contains(key) || vec.contains(key), s"$key not in either list")
      assert(r.getDouble(3) ==
        BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$key")
    }
    // fused order is rrf desc within each query
    fused.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).toSeq ==
        sorted.map(_.getDouble(3)).sortBy(-_).toSeq, s"query $q")
    }
  }
}
