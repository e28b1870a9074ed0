package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Bpe

class BpeSpec extends SparkTestBase {

  private def corpus(texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("merge order matches hand-computed BPE on a known corpus") {
    // hist: hug:3 pug:1 pun:1 bun:1
    // r1 (u,g)=4; r2 (h,ug)=3; r3 (u,n)=2; r4 tie at 1 → (b,un) by order
    val merges = Bpe.trainMerges(corpus("hug hug hug pug pun bun"), 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "u", "g", 4L), (2, "h", "ug", 3L), (3, "u", "n", 2L), (4, "b", "un", 1L)))
  }

  test("overlapping pairs merge left-to-right single-pass (aaa → [aa, a])") {
    // "aaa" ×2: pair (a,a) counts 4 (two overlapping per word), but the
    // single-pass replace fuses only the first occurrence: " aa a ".
    val m = Bpe.trainMerges(corpus("aaa aaa"), 1).collect()(0)
    assert((m.getString(1), m.getString(2), m.getLong(3)) == ("a", "a", 4L))
    val rep = Bpe.compressionReport(corpus("aaa aaa"), 1).collect()(0)
    // 2 words, 3 symbols each before; one merge application per word → 2 after
    assert(rep.getLong(0) == 2L && rep.getLong(1) == 6L && rep.getLong(2) == 4L)
    // final state " aa a ": symbols {aa, a}
    assert(rep.getLong(3) == 2L)
  }

  test("argmax max pair frequency is non-increasing across rounds") {
    val docs = Tables.documents(spark, sf)
    val freqs = Bpe.trainMerges(docs, 6).collect().map(_.getLong(3))
    assert(freqs.length == 6)
    freqs.sliding(2).foreach { w => assert(w(0) >= w(1), w.mkString(",")) }
  }

  test("compression report invariants hold on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val r = Bpe.compressionReport(docs, 6).collect()(0)
    val (nWords, before, after, vocab) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val expectWords = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(nWords == expectWords)
    // every word has >=1 symbol; merges strictly shrink the weighted count
    assert(before >= nWords && after < before && after >= nWords)
    assert(vocab > 0)
  }

  test("apply tokenizes with the learned segmentation (hand-computed)") {
    // after 2 merges (u,g) then (h,ug): hug→[hug] pug→[p,ug]
    // pun→[p,u,n] bun→[b,u,n]
    val out = Bpe.applyBpe(corpus("hug pug pun bun hug hug"), 2).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 6L)           // words
    assert(out(0).getLong(2) == 1 + 2 + 3 + 3 + 1 + 1)  // pieces
  }

  test("per-doc apply totals reconcile with the compression report") {
    val docs = Tables.documents(spark, sf)
    val applied = Bpe.applyBpe(docs, 4)
      .agg(sum("n_words"), sum("n_bpe_tokens")).collect()(0)
    val rep = Bpe.compressionReport(docs, 4).collect()(0)
    // every corpus word occurrence contributes once to both spellings
    assert(applied.getLong(0) == rep.getLong(0), "word totals")
    assert(applied.getLong(1) == rep.getLong(2), "piece totals")
  }

  test("encode round-trips: ids decode back to the exact document text") {
    val docs = corpus("hug pug pun bun hug hug", "bun pun hug")
    val enc = Bpe.encodeBpe(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(2).split(',').map(_.toInt).toSeq)).toMap
    // rebuild the id -> symbol table the same way encode defines it
    val dir = Bpe.trainedDir(docs, 2)
    val syms = spark.read.parquet(s"$dir/wordsK")
      .select(explode(split(trim(col("s")), " ")).as("sym"))
      .distinct().collect().map(_.getString(0)).sorted
    val decode = syms.zipWithIndex.map { case (s, i) => (i + 1, s) }.toMap
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // decoding concatenates symbols; word boundaries are the only loss
    enc.foreach { case (id, ids) =>
      assert(ids.map(decode).mkString == texts(id).replace(" ", ""), s"doc $id")
    }
    // ids are 1-based and within the vocabulary
    assert(enc.values.flatten.forall(i => i >= 1 && i <= syms.length))
  }

  test("encode length reconciles with the apply piece counts") {
    val docs = Tables.documents(spark, sf)
    val nIds = Bpe.encodeBpe(docs, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    Bpe.applyBpe(docs, 4).collect().foreach { r =>
      assert(nIds(r.getLong(0)) == r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("fertility by language reconciles with the per-doc apply totals") {
    val docs = Tables.documents(spark, sf)
    val fert = Bpe.fertilityByLang(docs, 4).collect()
    assert(fert.nonEmpty)
    // lang totals sum to the corpus totals the apply report carries
    val applied = Bpe.applyBpe(docs, 4)
      .agg(sum("n_words"), sum("n_bpe_tokens")).collect()(0)
    assert(fert.map(_.getLong(1)).sum == applied.getLong(0), "word totals")
    assert(fert.map(_.getLong(2)).sum == applied.getLong(1), "piece totals")
    // fertility IS tokens/words, rounded; >= 1 (a word is >= 1 piece)
    fert.foreach { r =>
      val expect = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect && r.getDouble(3) >= 1.0, s"lang ${r.getString(0)}")
    }
  }

  test("train state is a memoized on-disk artifact shared across the BPE queries") {
    val docs = Tables.documents(spark, sf)
    val d1 = Bpe.trainedDir(docs, 6)
    val d2 = Bpe.trainedDir(docs, 6)
    // second touch reuses the artifact — train/compress/apply pay ONE training
    assert(d1 == d2)
    for (part <- Seq("merges", "words0", "wordsK"))
      assert(new java.io.File(s"$d1/$part").isDirectory, part)
    // the production hand-off: a reader with NO Bpe involvement reopens
    // the persisted merge table and reproduces trainMerges exactly
    val fresh = spark.read.parquet(s"$d1/merges").orderBy("round").collect().toSeq
    assert(fresh == Bpe.trainMerges(docs, 6).collect().toSeq)
  }

  test("apply plans read the artifact, not a retraining dataflow") {
    val docs = Tables.documents(spark, sf)
    val dir = Bpe.trainedDir(docs, 6)
    val scans = Bpe.applyBpe(docs, 6).queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(scans.exists(_.contains(dir)), s"no artifact scan in: $scans")
  }

  test("training is deterministic across independent runs") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.trainMerges(docs, 6).collect().toSeq
    val b = Bpe.trainMerges(docs, 6).collect().toSeq
    assert(a == b)
  }

  test("training is insensitive to input partitioning") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.trainMerges(docs, 4).collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(7), 4).collect().toSeq
    assert(a == b)
  }
}
