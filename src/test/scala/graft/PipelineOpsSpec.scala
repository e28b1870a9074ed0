package graft

import org.apache.spark.sql.functions._

import graft.llm.Curation
import graft.query.BloomMembership
import graft.sink.Compaction

/** Round-5 pipeline operators: decontamination, repetition stats,
  * Bloom membership, compaction tier histogram. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("decontaminate flags exactly the docs sharing an 8-gram with the bench set") {
    val out = Curation.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // flags are consistent: contaminated <=> n_leaked_grams > 0
    out.foreach { case (_, n, c) => assert(c == (n > 0)) }
    // every bench-contributing doc with >= 18 tokens is self-contaminated
    // (its own excerpt grams are in the corpus by construction)
    val benchIds = docs.filter(col("doc_id") % 40 === 7)
      .filter(size(split(col("text"), " ")) >= 18)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = out.collect { case (id, _, true) => id }.toSet
    assert(benchIds.nonEmpty && benchIds.subsetOf(contaminated))
    // docs sharing no tokens with any bench doc are clean
    assert(out.length == docs.count())
  }

  test("repetition stats match a direct computation on a constructed doc") {
    val df = Seq(
      (1L, "a a a a b"),            // top 'a' 4/5, bigrams: "a a"x3,"a b" -> dup frac 1 - 2/4
      (2L, "w x y z"),              // all distinct
      (3L, "spam")                  // single token, no bigrams
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(df).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(out(0) == ((1L, 4.0 / 5.0, 1.0 - 2.0 / 4.0, true)))
    assert(out(1) == ((2L, 1.0 / 4.0, 0.0, true))) // 1/4 > 0.2 threshold
    assert(out(2) == ((3L, 1.0, 0.0, true)))
    // fixture prose stays mostly below the thresholds
    val fixture = Curation.repetitionStats(docs).collect()
    val flagged = fixture.count(_.getBoolean(3))
    assert(flagged.toDouble / fixture.length < 0.5)
  }

  test("bloom membership: no false negatives ever, gates all true on fixture") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val out = BloomMembership.membershipReport(orders, customer).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)), "bloom false negative — impossible by theory")
    assert(out.forall(_.getBoolean(3)), "measured FPR exceeded 3x configured fpp")
    val exactTrue = out.count(_.getBoolean(1))
    val oracleTrue = customer.join(orders,
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(exactTrue.toLong == oracleTrue)
  }

  test("compaction tiers: appended small files land in the expected tiers and compact to one") {
    val dir = tmpDir("ctier") + "/t"
    Seq(500, 500, 2000).foreach { n =>
      spark.range(n).selectExpr("id AS event_id")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = Compaction.tierHistogram(spark, dir, "before").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(before == Map(0 -> 2L, 1 -> 1L))
    val (nb, na) = Compaction.compactFlat(spark, dir, "event_id")
    assert(nb == 3 && na == 1)
    val after = Compaction.tierHistogram(spark, dir, "after").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(after == Map(1 -> 1L)) // 3000 rows -> tier floor(log4(6)) = 1
  }

  test("incremental dedup flags match the brute-force cross-set check") {
    import graft.llm.Dedup
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val out = Dedup.incrementalDedup(delta, corpus).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.length.toLong == delta.count())
    // near flags == the cross-residue subset of the all-pairs truth
    val allPairs = Dedup.ngramJaccardAllPairs(docs, 3, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expNear = (allPairs.collect { case (a, b) if a % 5 == 0 && b % 5 != 0 => a } ++
      allPairs.collect { case (a, b) if b % 5 == 0 && a % 5 != 0 => b }).toSet
    assert(out.filter(_._3).map(_._1).toSet == expNear)
    assert(expNear.nonEmpty, "fixture should plant cross-residue near-dups")
  }

  test("IncrementalDeduper matches the one-shot incrementalDedup bit for bit") {
    import graft.llm.Dedup
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val oneShot = Dedup.incrementalDedup(delta, corpus).collect().toSeq
    val session = new Dedup.IncrementalDeduper(corpus).dedupBatch(delta).collect().toSeq
    assert(session == oneShot)
  }

  test("IncrementalDeduper scans the corpus at init only — batch plans touch no file source") {
    import graft.llm.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
        case q: QueryStageExec => fileScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(fileScans)
      }
    // corpus is parquet-backed; the delta is an in-memory frame, so ANY
    // file scan in the batch plan would be a corpus re-read
    val deduper = new Dedup.IncrementalDeduper(docs.filter(col("doc_id") % 5 =!= 0))
    val delta = Seq(
      (100000L, "completely novel text that matches nothing in the corpus at all"),
      (100001L, "another unique delta document with its own distinct words entirely")
    ).toDF("doc_id", "text")
    val report = deduper.dedupBatch(delta)
    report.collect()
    val scans = fileScans(report.queryExecution.executedPlan)
    assert(scans.isEmpty,
      s"batch dedup re-scanned a file source:\n${scans.map(_.metadata.get("Location"))}")
  }

  test("IncrementalDeduper.append maintains state: batch-2 flags equal a fresh recompute") {
    import graft.llm.Dedup
    val corpus0 = docs.filter(col("doc_id") % 5 =!= 0)
    val b1 = docs.filter(col("doc_id") % 10 === 0)
    val b2 = docs.filter(col("doc_id") % 10 === 5)
    val deduper = new Dedup.IncrementalDeduper(corpus0)
    deduper.append(b1)
    val incremental = deduper.dedupBatch(b2).collect().toSeq
    val fresh = Dedup.incrementalDedup(b2, corpus0.unionByName(b1)).collect().toSeq
    assert(incremental == fresh)
    assert(incremental.nonEmpty)
  }

  test("IncrementalDeduper persisted state: a NEW session reopens and continues with no corpus rescan") {
    import graft.llm.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
        case q: QueryStageExec => fileScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(fileScans)
      }
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val stateDir = tmpDir("graft_dedup_state_")
    Dedup.IncrementalDeduper.init(corpus, stateDir)

    // a FRESH session (new session state, no cached plans/lineage from
    // the builder session) reopens the artifact dir: flags must equal
    // the in-memory spelling bit for bit
    val s2 = spark.newSession()
    val reopened = Dedup.IncrementalDeduper.open(s2, stateDir)
    val delta2 = Tables.documents(s2, sf).filter(col("doc_id") % 5 === 0)
    val fromDisk = reopened.dedupBatch(delta2).collect().toSeq
    val inMem = new Dedup.IncrementalDeduper(corpus).dedupBatch(delta).collect().toSeq
    assert(fromDisk == inMem)

    // corpus-rescan pin: with an in-memory delta, every file scan in
    // the batch plan must read the STATE DIR, never the corpus fixture.
    // The delta texts are COPIES of corpus texts (exact dups) so every
    // join is non-empty — AQE's empty-relation propagation would
    // otherwise fold the state-scan branches clean out of the final
    // plan and the pin would vacuously pass.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val corpusTexts = corpus.orderBy(col("doc_id")).limit(2)
      .select("text").collect().map(_.getString(0))
    val deltaMem = s2.createDataFrame(
      java.util.Arrays.asList(
        Row(200000L, corpusTexts(0)),
        Row(200001L, corpusTexts(1))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val report = reopened.dedupBatch(deltaMem)
    val flags = report.collect()
    assert(flags.forall(_.getBoolean(1)), "copied texts must flag exact_dup")
    val scans = fileScans(report.queryExecution.executedPlan)
    assert(scans.nonEmpty, "persisted state must be parquet-backed")
    scans.foreach { s =>
      val loc = s.metadata.getOrElse("Location", "")
      assert(loc.contains(new java.io.File(stateDir).getName),
        s"batch plan scanned outside the state dir: $loc")
    }

    // append writes the NEXT epoch and a THIRD session's reopen
    // continues from it: batch-2 flags equal a fresh recompute over
    // corpus + batch-1
    val b1 = docs.filter(col("doc_id") % 10 === 0)
    val b2 = docs.filter(col("doc_id") % 10 === 5)
    reopened.append(Tables.documents(s2, sf).filter(col("doc_id") % 10 === 0))
    val s3 = spark.newSession()
    val reopened2 = Dedup.IncrementalDeduper.open(s3, stateDir)
    val incr = reopened2.dedupBatch(
      Tables.documents(s3, sf).filter(col("doc_id") % 10 === 5)).collect().toSeq
    val fresh = Dedup.incrementalDedup(b2, corpus.unionByName(b1)).collect().toSeq
    assert(incr == fresh)
  }

  test("IncrementalDeduper.vacuum drops only stale epochs; reopen and flags survive") {
    import graft.llm.Dedup
    def epochs(dir: String): Seq[Int] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
        .map(_.getName.stripPrefix("epoch=").toInt).sorted
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val stateDir = tmpDir("graft_dedup_vacuum_")
    val d = Dedup.IncrementalDeduper.init(corpus, stateDir)
    d.append(docs.filter(col("doc_id") % 10 === 0))
    d.append(docs.filter(col("doc_id") % 20 === 5))
    assert(epochs(stateDir) == Seq(1, 2, 3), "one full state copy per append")

    // keep=2: one rollback target stays; current epoch untouched
    val (drop2, remain2) = Dedup.IncrementalDeduper.vacuum(spark, stateDir, keep = 2)
    assert(drop2 == Seq(1) && remain2 == Seq(2, 3) && epochs(stateDir) == Seq(2, 3))

    val delta = docs.filter(col("doc_id") % 10 === 5)
    val before = Dedup.IncrementalDeduper.open(spark, stateDir)
      .dedupBatch(delta).collect().toSeq

    // keep=1: only the current epoch survives; a reopened session's
    // flags are identical — retention never touches live state
    val (drop1, remain1) = Dedup.IncrementalDeduper.vacuum(spark, stateDir)
    assert(drop1 == Seq(2) && remain1 == Seq(3) && epochs(stateDir) == Seq(3))
    val after = Dedup.IncrementalDeduper.open(spark, stateDir)
      .dedupBatch(delta).collect().toSeq
    assert(after == before)

    // idempotent once clean
    assert(Dedup.IncrementalDeduper.vacuum(spark, stateDir) == (Seq(), Seq(3)))

    // a crashed half-written FUTURE epoch (no META flip) is never
    // touched — the next append owns it
    new java.io.File(s"$stateDir/epoch=4/shingles").mkdirs()
    assert(Dedup.IncrementalDeduper.vacuum(spark, stateDir) == (Seq(), Seq(3, 4)))
    assert(new java.io.File(s"$stateDir/epoch=4").isDirectory)
    // and appending after a vacuum continues the chain normally
    d.append(docs.filter(col("doc_id") % 20 === 15))
    assert(epochs(stateDir).contains(4) &&
      Dedup.IncrementalDeduper.open(spark, stateDir).dedupBatch(delta)
        .collect().nonEmpty)
  }

  test("applyDedup keeps one survivor per component; group sizes partition the corpus") {
    import graft.llm.Dedup
    val pairs = Dedup.ngramJaccardPairs(docs)
    val out = Dedup.applyDedup(docs, pairs).collect()
    assert(out.map(_.getLong(3)).sum == docs.count())
    val comps = Dedup.connectedComponents(docs, pairs)
      .select("component").distinct().count()
    assert(out.length.toLong == comps)
  }

  test("salted equi-join equals the plain join and spreads keys over salts") {
    import graft.query.SkewJoin
    val e = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val dim = e.select(col("event_type")).distinct()
      .withColumn("w", length(col("event_type")))
    val salted = SkewJoin.saltedEquiJoin(e, dim, "event_type", forceShuffle = true)
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = e.join(dim, Seq("event_type"))
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain && salted.nonEmpty)
    // the salt column actually fans each hot key out over many sub-keys
    val fanout = e.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .groupBy("event_type").agg(countDistinct(col("__salt")).as("n"))
      .collect().map(_.getLong(1))
    assert(fanout.forall(_ >= 4), "hot keys should hit most of the 8 salts")
  }

  test("bigram logprob matches a hand-computed alternating doc") {
    // corpus = one doc "a b a b a b": bigrams (a,b)x3 (b,a)x2,
    // ctx a=3 b=2 (bigram marginals), uni a=3 b=3 of 6.
    // Every pair scores ln(0.8*1.0 + 0.2*3/6) = ln(0.9).
    val one = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val r = graft.llm.TextOps.bigramLogProb(one).collect()(0)
    assert(r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2) - math.log(0.9)) < 1e-6)
  }

  test("bigram logprob is order-sensitive where the unigram score is blind") {
    // same token multiset, different order: unigram scores are equal
    // BY CONSTRUCTION; the bigram score must separate them.
    val two = Seq(
      (0L, "a b a b a b a b"),   // regular alternation
      (1L, "a a b b b a a b")    // scrambled — rare (a,a)/(b,b) pairs
    ).toDF("doc_id", "text")
    val uni = graft.llm.TextOps.unigramLogProb(two).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(uni(0L) == uni(1L), "unigram must be order-blind")
    val big = graft.llm.TextOps.bigramLogProb(two).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(big(0L) > big(1L),
      s"bigram should prefer the regular doc: $big")
  }

  test("bigram counts reconcile: n_bigrams = n_tok - 1 per doc") {
    val nTok = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val out = graft.llm.TextOps.bigramLogProb(docs).collect()
    out.foreach { r =>
      assert(r.getLong(1) == nTok(r.getLong(0)) - 1L, s"doc ${r.getLong(0)}")
      assert(r.getDouble(2) <= 0.0)
    }
    // every doc with >= 2 tokens scores
    assert(out.length == nTok.count(_._2 >= 2))
  }

  test("max_equal_run over sorted tokens equals the explode-groupBy top-token count") {
    val direct = docs
      .select(col("doc_id"),
        graft.functions.VectorFns.maxEqualRun(sort_array(split(col("text"), " "))).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val viaShuffle = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max("count").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt)).toMap
    assert(direct == viaShuffle)
  }

  test("winnow position-count bounds hold on random repeat-heavy strings") {
    val rnd = new scala.util.Random(7)
    val k = 5; val w = 4
    for (_ <- 1 to 300) {
      val len = rnd.nextInt(200)
      // tiny alphabet -> many repeated k-grams, the case where the
      // distinct-HASH count can dip below the position bound
      val bytes = Array.fill(len)(('a' + rnd.nextInt(4)).toByte)
      val n = math.max(bytes.length - k + 1, 0)
      val windows = if (n <= 0) 0 else math.max(n - math.min(w, n) + 1, 1)
      val pos = graft.functions.Winnow.posCount(bytes, k, w)
      val fps = graft.functions.Winnow.fingerprints(bytes, k, w).length
      if (windows == 0) assert(pos == 0 && fps == 0)
      else {
        assert(pos >= (windows + w - 1) / w && pos <= windows)
        assert(fps >= 1 && fps <= pos)
      }
    }
  }

  test("simhash multiprobe blocking finds every pair within hamming 7 (fixture)") {
    import graft.llm.Dedup
    // The pigeonhole + hamming-1-probe guarantee holds for WHATEVER
    // feature definition the simhash uses — check it for both the
    // shingled default and the unigram variant, each against the
    // brute-force hamming truth of ITS OWN simhash column.
    for (fs <- Seq(3, 1)) {
      val sims = Dedup.simhashes(docs, featureShingle = fs)
      val within7 = sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("h"))
        .filter(col("h") <= 7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cand = Dedup.simhashCandidates(docs, featureShingle = fs).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(within7.nonEmpty, s"fixture should contain close simhash pairs (fs=$fs)")
      // pigeonhole + hamming-1 probe: all-chunks >= 2 bits apart => total >= 8
      assert(within7.subsetOf(cand), s"fs=$fs missing ${within7 -- cand}")
    }
  }

  test("PMI recomputes exactly on a known corpus and favors above-chance pairs") {
    import spark.implicits._
    // "x y" always adjacent (8x); "a" frequent but dispersed
    val corpus = Seq(
      (0L, "x y a x y a x y"),
      (1L, "x y a a x y a a"),
      (2L, "a x y a x y a a"),
      (3L, "x y x y a a a a")).toDF("doc_id", "text")
    val out = graft.llm.TextOps.pmiCollocations(corpus, minCount = 5, k = 20)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // hand recompute: per doc 7 bigrams -> 28 total; 32 tokens
    val toks = Seq("x y a x y a x y", "x y a a x y a a",
      "a x y a x y a a", "x y x y a a a a").map(_.split(" ").toSeq)
    val nt = toks.map(_.size).sum
    val bigs = toks.flatMap(t => t.zip(t.tail))
    val nb = bigs.size
    val uc = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = bigs.groupBy(identity).view.mapValues(_.size).toMap.toSeq
      .filter(_._2 >= 5)
      .map { case ((a, b), cab) =>
        val pmi = BigDecimal(math.log((cab.toDouble / nb) /
          ((uc(a).toDouble / nt) * (uc(b).toDouble / nt))))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        (a, b, cab.toLong, pmi)
      }
      .sortBy { case (a, b, _, p) => (-p.toDouble, a, b) }
      .map { case (a, b, c, p) => (a, b, c, p.toDouble) }
    assert(out.toSeq == expected)
    // the always-adjacent pair ranks first, above chance (pmi > 0)
    assert(out.head._1 == "x" && out.head._2 == "y" && out.head._4 > 0)
  }

  test("dsir: selection size is exact; target-language docs score higher on average") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val scored = graft.llm.TextOps.dsirScore(docs, targetLang = "en", selectFrac = 0.2)
    val n = docs.count()
    assert(scored.count() == n, "every doc is scored")
    assert(scored.filter(col("selected")).count() == math.floor(n * 0.2).toLong)
    val byLang = scored.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_logratio")).as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(byLang(true) > byLang(false),
      s"importance weights must favor the target distribution: $byLang")
    // partition-insensitive: the exact-decimal ranking is stable
    val again = graft.llm.TextOps.dsirScore(docs.repartition(7), "en", 0.2)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    val first = scored.collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(again == first)
  }
}
