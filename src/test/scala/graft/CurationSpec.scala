package graft

import org.apache.spark.sql.functions._

import graft.llm.Curation

class CurationSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sf)

  test("curation reasons are consistent and kept docs pass every gate") {
    val out = Curation.curate(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (isDup, lang, quality, reason, kept) =
        (r.getBoolean(1), r.getString(2), r.getDouble(3), r.getString(4), r.getBoolean(5))
      if (kept) {
        assert(!isDup && lang == "en" && quality >= 0.7, r.toString)
        assert(reason == "keep")
      } else {
        assert(reason != "keep")
        if (reason == "exact_dup") assert(isDup)
        if (reason == "lang") assert(!isDup && lang != "en")
        if (reason == "low_quality") assert(!isDup && lang == "en" && quality < 0.7)
      }
    }
    // the fixture's planted dups are NEAR-dups (distinct texts), so no
    // exact_dup rows here — but both kept and dropped docs must exist
    assert(out.exists(_.getBoolean(5)))
    assert(out.exists(!_.getBoolean(5)))
  }

  test("e2e pipeline funnel telescopes and reconciles with the component stages") {
    val funnel = Curation.pipelineE2e(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(funnel.map(_._1).toSeq == (1 to 9))
    // stage 1 sees the whole corpus
    assert(funnel.head._3 == docs.count())
    // filter stages telescope: out(i) == in(i+1), in - dropped == out
    funnel.take(5).foreach { case (_, name, nIn, nDrop, nOut) =>
      assert(nIn - nDrop == nOut, s"$name: $nIn - $nDrop != $nOut")
    }
    funnel.take(5).sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(a._5 == b._3, s"${a._2} out ${a._5} != ${b._2} in ${b._3}")
    }
    val survivors = funnel(4)._5
    // chunk/split stages operate on the survivors
    assert(funnel.drop(5).forall(_._3 == survivors))
    // split partitions the survivors; every survivor chunks at least once
    assert(funnel.drop(6).map(_._5).sum == survivors)
    assert(funnel(5)._5 >= survivors)
    // the exact-dup drop count equals the dup set curate reports
    val curDups = Curation.curate(docs).filter(col("is_dup")).count()
    assert(funnel.head._4 == curDups)

    // FULL reconciliation against the component operators (the inlined
    // shared expressions must agree with curate/repetitionStats/
    // decontaminate run stand-alone): recompute every doc's
    // first-failing stage from the components and re-derive the drops
    val cur = Curation.curate(docs)
      .select(col("doc_id"), col("is_dup"), col("lang_pred"), col("quality"))
    val rep = graft.llm.Curation.repetitionStats(docs)
      .select(col("doc_id"), col("repetitive"))
    val dec = Curation.decontaminate(docs).select(col("doc_id"), col("contaminated"))
    val ff = cur.join(rep, Seq("doc_id")).join(dec, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("is_dup"), "exact_dup")
          .when(col("lang_pred") =!= "en", "lang")
          .when(col("quality") < 0.7, "quality")
          .when(col("repetitive"), "repetition")
          .when(col("contaminated"), "decontamination")
          .otherwise("keep").as("ff"))
      .groupBy("ff").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectedDrops = Seq("exact_dup", "lang", "quality", "repetition", "decontamination")
      .map(s => ff.getOrElse(s, 0L))
    assert(funnel.take(5).map(_._4).toSeq == expectedDrops,
      s"funnel drops ${funnel.take(5).map(_._4).toSeq} != component-derived $expectedDrops")
  }

  test("e2e pipeline reads the corpus three times, not once per stage") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
        case q: QueryStageExec => fileScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(fileScans)
      }
    val funnel = Curation.pipelineE2e(docs)
    funnel.collect()
    val scans = fileScans(funnel.queryExecution.executedPlan)
    // 1 flag projection (dup window + all scan-local gates in one pass)
    // + 2 decontamination branches (corpus grams, bench grams)
    assert(scans.size <= 3,
      s"pipeline re-scans the corpus per stage: ${scans.size} file scans")
  }

  test("sequence packing conserves the chunk stream and cuts contiguously") {
    val packed = Curation.packSequences(docs, seqLen = 32).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(packed.exists(_._2 > 0), "fixture must produce multi-sequence docs at L=32")
    // recompute the chunk stream per doc straight from the text
    val streams = docs.select("doc_id", "text").collect().map { r =>
      val n = r.getString(1).split(" ", -1).length
      val nChunks = math.max(math.ceil((n - 50) / 40.0).toInt, 0) + 1
      val lens = (0 until nChunks).map(ci => math.min(50, n - ci * 40))
      r.getLong(0) -> lens
    }.toMap
    packed.groupBy(_._1).foreach { case (doc, seqs) =>
      val lens = streams(doc)
      // conservation: every chunk in exactly one sequence, tokens intact
      assert(seqs.map(_._3).sum == lens.length, s"doc $doc chunk count")
      assert(seqs.map(_._4).sum == lens.map(_.toLong).sum, s"doc $doc token total")
      // cut indices ascend from 0 (gaps are legitimate: a 50-token
      // chunk spans >1 of the 32-token windows, so some windows
      // contain no chunk START and emit no row)
      assert(seqs.map(_._2).min == 0, s"doc $doc first seq id")
      // replay the concat-then-split assignment exactly
      var cum = 0L
      val expect = lens.map { l => val s = (cum / 32).toInt; cum += l; s }
      val gotCounts = seqs.map(s => s._2 -> s._3).toMap
      assert(expect.groupBy(identity).map { case (k, v) => k -> v.size } == gotCounts,
        s"doc $doc assignment")
    }
  }

  test("greedy cross-doc packing conserves docs/tokens, respects capacity, replays deterministically") {
    val seqLen = 128
    val packed = Curation.packGreedy(docs, seqLen = seqLen, nBuckets = 32).collect()
    assert(packed.nonEmpty)
    // conservation: every doc lands in exactly one sequence
    assert(packed.map(_.getAs[Int]("n_docs").toLong).sum == docs.count())
    // token conservation against the capped per-doc counts
    val totTok = docs
      .select(sum(least(size(split(col("text"), " ")), lit(seqLen)))).collect()
      .head.getLong(0)
    assert(packed.map(_.getAs[Int]("n_seq_tokens").toLong).sum == totTok)
    // capacity is a hard bound; fill_ppm is the exact integer ratio
    packed.foreach { r =>
      val fill = r.getAs[Int]("n_seq_tokens")
      assert(fill <= seqLen, r.toString)
      assert(r.getAs[Long]("fill_ppm") == fill.toLong * 1000000L / seqLen)
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
    }
    // the pass actually packs: multi-doc sequences must dominate over
    // one-doc fallbacks on the 10-99-token fixture docs at L=128
    assert(packed.count(_.getAs[Int]("n_docs") >= 2) > packed.length / 2)
    // next-fit invariant: within a bucket every non-final sequence
    // closed because the NEXT doc did not fit
    val docTok = docs
      .select(col("doc_id"), least(size(split(col("text"), " ")), lit(seqLen)))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    packed.groupBy(_.getAs[Int]("bucket")).foreach { case (_, seqs) =>
      val ordered = seqs.sortBy(_.getAs[Int]("seq_idx"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val nextFirst = docTok(b.getAs[Long]("first_doc"))
          assert(a.getAs[Int]("n_seq_tokens") + nextFirst > seqLen,
            s"sequence closed early: $a then $b")
        case _ => ()
      }
    }
    // deterministic: a second run is bit-identical
    val again = Curation.packGreedy(docs, seqLen = seqLen, nBuckets = 32).collect()
    assert(packed.toSeq == again.toSeq)
    // the corpus report aggregates the same fold
    val rep = Curation.packGreedyReport(docs, seqLen = seqLen, nBuckets = 32)
      .collect().head
    assert(rep.getAs[Long]("n_sequences") == packed.length.toLong)
    assert(rep.getAs[Long]("packed_tokens") == totTok)
    assert(rep.getAs[Long]("capacity_tokens") == packed.length.toLong * seqLen)
    val waste = rep.getAs[Long]("waste_ppm")
    assert(waste >= 0 && waste < 1000000)
  }

  test("first-fit-decreasing packing conserves the corpus and packs strictly better than greedy") {
    val seqLen = 128
    val ffd = Curation.packFirstFitDecreasing(docs, seqLen = seqLen, nBuckets = 32).collect()
    val greedy = Curation.packGreedy(docs, seqLen = seqLen, nBuckets = 32).collect()
    // same corpus in, same tokens out — only the arrangement differs
    assert(ffd.map(_.getAs[Int]("n_docs").toLong).sum ==
      greedy.map(_.getAs[Int]("n_docs").toLong).sum)
    assert(ffd.map(_.getAs[Int]("n_seq_tokens").toLong).sum ==
      greedy.map(_.getAs[Int]("n_seq_tokens").toLong).sum)
    ffd.foreach { r =>
      assert(r.getAs[Int]("n_seq_tokens") <= seqLen)
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
      assert(r.getAs[Long]("fill_ppm") ==
        r.getAs[Int]("n_seq_tokens").toLong * 1000000L / seqLen)
    }
    // the point of FFD: fewer sequences (less padding) than streaming
    // next-fit — measured 252 vs 302 at sf0.001 (next-fit DECREASING
    // read 310, i.e. the decreasing sort only helps when earlier bins
    // stay open, which is exactly what first-fit adds)
    assert(ffd.length < greedy.length,
      s"ffd ${ffd.length} sequences vs greedy ${greedy.length}")
    // deterministic replay
    val again = Curation.packFirstFitDecreasing(docs, seqLen = seqLen, nBuckets = 32).collect()
    assert(ffd.toSeq == again.toSeq)
  }

  test("domain mixture: binding domain keeps all, kept shares track the targets") {
    val rows = Curation.domainMixture(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 5)
    // exactly the binding domain(s) sit at rate 1.0 (1e6 ppm); nobody above
    assert(rows.exists(_._5 == 1000000L), "one domain must bind")
    assert(rows.forall(_._5 <= 1000000L), "no upsampling")
    // kept is a subset of available
    rows.foreach { r => assert(r._6 <= r._2 && r._7 <= r._3, s"$r") }
    // realized token shares track the targets (hash sampling is exact
    // in expectation; allow fixture-size noise)
    val total = rows.map(_._7).sum.toDouble
    rows.foreach { case (lang, _, _, share, _, _, keptTok) =>
      val realized = keptTok / total
      assert(math.abs(realized - share) < 0.06,
        s"$lang realized $realized vs target $share")
    }
  }

  test("split fractions are ~8/1/1 and partition the corpus") {
    val rows = Curation.trainValTestSplit(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.values.sum
    assert(total == docs.count())
    assert(rows("train") > rows("val") && rows("train") > rows("test"))
    assert(math.abs(rows("train").toDouble / total - 0.8) < 0.05)
  }

  test("chunking covers every token with the declared overlap") {
    val chunks = Curation.chunkDocs(docs).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    byDoc.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_.getInt(1))
      // every chunk except possibly the last has the full size
      sorted.init.foreach(c => assert(c.getInt(2) == 50, s"doc $docId"))
      assert(sorted.last.getInt(2) >= 1 && sorted.last.getInt(2) <= 50)
      // stride: chunk i starts at i*40 -> consecutive chunks overlap by 10
      val full = docs.filter(col("doc_id") === docId)
        .select(split(col("text"), " ")).first().getSeq[String](0)
      sorted.foreach { c =>
        val start = c.getInt(1) * 40
        val expect = full.slice(start, start + 50).mkString(" ")
        assert(c.getString(3) == expect, s"doc $docId chunk ${c.getInt(1)}")
      }
      // union of chunks covers the doc
      assert(sorted.last.getInt(1) * 40 + sorted.last.getInt(2) == full.length ||
             full.length <= 50)
    }
  }

  test("CDC chunks partition every document exactly") {
    val out = Curation.chunkCdc(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.groupBy(_._1).foreach { case (docId, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $docId ids")
      // contiguous: each chunk starts right after the previous ends
      sorted.foldLeft(1) { case (expectStart, (_, _, start, n, _)) =>
        assert(start == expectStart, s"doc $docId start $start != $expectStart")
        start + n
      }
      // conservation: concatenated chunk text rebuilds the doc
      assert(sorted.map(_._5).mkString(" ") == texts(docId), s"doc $docId text")
    }
    assert(out.map(_._1).toSet == texts.keySet)
  }

  test("CDC boundaries re-sync after a local edit (the point of CDC)") {
    import spark.implicits._
    val base = docs.orderBy(length(col("text")).desc, col("doc_id"))
      .select("text").as[String].head()
    val words = base.split(" ")
    assert(words.length > 40)
    // insert one token near the front
    val edited = (words.take(3) :+ "zzz") ++ words.drop(3)
    val two = Seq((0L, base), (1L, edited.mkString(" "))).toDF("doc_id", "text")
    val chunks = Curation.chunkCdc(two).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val (a, b) = (chunks.filter(_._1 == 0L).map(_._2).toSet,
                  chunks.filter(_._1 == 1L).map(_._2).toSet)
    // all chunks past the re-sync window are IDENTICAL between the two
    // versions: only chunks overlapping the edit (+ the 4-token window
    // after it) may differ. With ~avg-16 chunks over 40+ tokens, the
    // tail must share content.
    assert((a intersect b).nonEmpty,
      s"no shared chunks after a 1-token edit:\nA=$a\nB=$b")
    // and a fixed-stride chunker would NOT re-sync: verify the shifted
    // suffix really is realigned (the last chunk matches exactly)
    val lastA = chunks.filter(_._1 == 0L).maxBy(_._2.length)
    assert(b.exists(_ == lastA._2) || (a intersect b).size >= 1)
  }

  test("CDC handles short and sub-window docs as single whole chunks") {
    import spark.implicits._
    val tiny = Seq((0L, "a"), (1L, "a b c"), (2L, "w x y z")).toDF("doc_id", "text")
    val out = Curation.chunkCdc(tiny).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getString(4)))
    // docs 0 and 1 are under the 4-token window: exactly one chunk each
    assert(out.count(_._1 == 0L) == 1 && out.count(_._1 == 1L) == 1)
    assert(out.find(_._1 == 1L).get._3 == 3)
    // doc 2 has exactly one 4-token window; whatever the hash says,
    // chunks still partition it
    assert(out.filter(_._1 == 2L).map(_._3).sum == 4)
  }

  test("epoch shuffle is a permutation with contiguous per-shard positions") {
    val out = Curation.epochShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // every doc exactly once
    assert(out.map(_._1).toSet ==
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(out.length == out.map(_._1).toSet.size)
    // per-shard positions are 1..n with no gaps
    out.groupBy(_._3).foreach { case (shard, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length), s"shard $shard")
    }
    // all shards populated at fixture size
    assert(out.map(_._3).toSet == (0 until 8).toSet)
  }

  test("epoch shuffle is deterministic per seed and differs across seeds") {
    val a = Curation.epochShuffle(docs, seed = 17L).collect().toSeq
    val b = Curation.epochShuffle(docs.repartition(7), seed = 17L).collect().toSeq
    assert(a == b)
    val c = Curation.epochShuffle(docs, seed = 18L).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toMap
    val aMap = a.map(r => (r.getLong(0), r.getInt(2))).toMap
    // a different seed reshuffles: at least one doc changes shard
    assert(aMap.exists { case (id, s) => c(id) != s })
  }

  test("reservoir sample keeps exactly min(k, |key|) rows per language") {
    val k = 40
    val out = Curation.reservoirSample(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length == math.min(k.toLong, perLang(lang)), lang)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length), lang)
    }
    assert(out.groupBy(_._1).keySet == perLang.keySet)
  }

  test("RAG context assembly: rank-prefix packing under the token budget, recall gate true") {
    import graft.llm.{AnnIndex, Similarity}
    val emb = Tables.embeddings(spark, sf)
    val ivf = AnnIndex.ivfDir(spark, sf, emb)
    val sq = AnnIndex.sqDir(spark, sf, emb)
    val csq = AnnIndex.ivfSqDir(spark, sf, emb)
    val budget = 128
    val out = Curation.ragContext(spark, ivf, sq, csq, emb, docs,
      col("vec_id") % 50 === 2, k = 5, tokenBudget = budget,
      nProbe = 14, rerank = 24).collect()
    assert(out.nonEmpty)

    val nTok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = Similarity.batchTopKExact(emb, emb.filter(col("vec_id") % 50 === 2), 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }

    out.foreach { r =>
      val (q, nDocs, tokens, ids) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val packed = ids.split(',').map(_.toLong).toSeq
      assert(packed.size == nDocs)
      // packed docs are EXACTLY the rank prefix of the exact top-k
      assert(packed == exact(q).take(packed.size), s"query $q not a rank prefix")
      // token accounting is real and the budget holds
      assert(tokens == packed.map(nTok).sum && tokens <= budget, s"query $q tokens")
      // prefix is maximal: the next-ranked doc would not have fit
      if (packed.size < exact(q).size)
        assert(tokens + nTok(exact(q)(packed.size)) > budget, s"query $q not maximal")
      assert(r.getBoolean(4), s"query $q recall gate")
    }
  }

  test("reservoir sample is deterministic and plans through TopKPerKey") {
    val a = Curation.reservoirSample(docs).collect().toSeq
    val b = Curation.reservoirSample(docs.repartition(5)).collect().toSeq
    assert(a == b)
    val plan = Curation.reservoirSample(docs).queryExecution.optimizedPlan
    assert(plan.collect {
      case n: graft.plans.TopKPerKeyNode => n }.nonEmpty, s"$plan")
  }

  test("weighted sample recomputes exactly: Efraimidis-Spirakis keys, per-lang top-10") {
    val base = docs.select("lang", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = base.filter(_._3 > 0).groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.map { case (_, id, w) =>
        val u = (1 + (id * 2654435761L) % 999999).toDouble / 1000000.0
        val key = BigDecimal(math.log(u) / w)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        (lang, id, w, key)
      }.sortBy { case (_, id, _, key) => (-key.toDouble, id) }
        .take(10).zipWithIndex
        .map { case ((l, id, w, key), i) => (l, id, w, key.toDouble, i + 1) }
    }.sortBy(t => (t._1, t._5))
    val out = Curation.weightedSample(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(out == expected)
    // heavier docs are favored: the sampled mean length exceeds the
    // corpus mean (weight-proportional odds, deterministic fixture)
    val sampledMean = out.map(_._3).sum.toDouble / out.size
    val corpusMean = base.map(_._3).sum.toDouble / base.length
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean <= corpus mean $corpusMean")
  }

  test("snapshot diff statuses follow the derivation rules exactly") {
    val out = Curation.snapshotDiffDemo(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (
      ids.filter(id => id % 17 == 0).map(id => (id, "removed")) ++
      ids.filter(id => id % 17 != 0 && id % 13 == 0).map(id => (id, "changed")) ++
      ids.filter(id => id % 29 == 0).map(id => (id + 1000000L, "added"))
    ).toSeq.sortBy(_._1)
    assert(out == expected)
    assert(out.nonEmpty)
  }
}
