package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** ANN as a BUILD-ONCE INDEX, not a per-query demo.
  *
  * The retrieval shapes a training-data pipeline actually runs — "label
  * every doc with its nearest eval neighbors", "serve per-prompt
  * context" — hit the same corpus with thousands of queries, so the
  * expensive parts (centroid training, cell assignment, LSH signature
  * hashing) must be paid ONCE and persisted, then every probe reads
  * only its slice of the persisted layout:
  *
  *  - IVF: centroids live in a k-row parquet table (broadcast-joined
  *    for assignment — NEVER embedded as nCells x dim plan literals,
  *    which bloats the expression tree O(nCells*dim) and breaks codegen
  *    at real cell counts), and the corpus is written PARTITIONED BY
  *    cell, so a probe's `cell IN (...)` prunes to nProbe partitions at
  *    the file-listing level — the q_zorder_layout pruning discipline
  *    applied to vector search. AnnIndexSpec pins the pruning (files
  *    read == files in probed partitions) and that nCells=256 plans
  *    without literal blowup.
  *  - LSH: the (vec_id, embedding, buckets) signature table is hashed
  *    once and persisted; single-query probes and batch bucket joins
  *    both read it instead of re-projecting numTables x numPlanes
  *    hyperplanes over the corpus per query.
  *
  * Artifacts are memoized per (session, sfDir+params) so every
  * registered query in a run shares one build; at cluster scale the
  * same writes land on a real table path and survive across jobs.
  */
object AnnIndex {

  private val Dim = 64

  // ---- distributed IVF training (broadcast-join assignment) ----

  /** Deterministic hash-sample seeds: the nCells corpus vectors with
    * the smallest murmur3(vec_id), unit-normalized, numbered 1..nCells
    * in (hash, id) order. The row_number window runs on the ALREADY
    * LIMITed nCells rows — never a global single-partition sort. */
  private[graft] def seedCentroids(embeddings: DataFrame, nCells: Int): DataFrame =
    embeddings
      .select(col("vec_id"), Similarity.unitVector(col("embedding")).as("centroid"))
      .orderBy(hash(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .withColumn("cell",
        row_number().over(Window.orderBy(hash(col("vec_id")), col("vec_id"))))
      .select(col("cell"), col("centroid"))

  /** Nearest-centroid assignment as a BROADCAST JOIN + argmax over
    * rows: units x broadcast(centroids) -> per-row dot -> min over
    * (-dot, cell) structs. The k-fold row expansion is map-side only
    * (broadcast join), and the hash aggregate's partial phase collapses
    * it back to one row per vec_id BEFORE the shuffle — exchange volume
    * is n rows, not n*k. The struct min is the deterministic tie-break
    * (largest dot, then smallest cell — same as the first-max-index
    * rule the literal-array spelling used). */
  private[graft] def assignCells(units: DataFrame, centroids: DataFrame): DataFrame =
    units.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct((-Similarity.dot(col("u"), col("centroid"))).as("nd"),
          col("cell").as("c")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(min(col("sc")).as("m"))
      .select(col("vec_id"), col("m.c").as("cell"))

  /** `iters` distributed Lloyd passes over hash-sampled seeds; fully
    * distributed — no k-row driver collect per pass. Element sums go
    * through DECIMAL(28,10) so per-cell means are bit-stable under any
    * partial-agg order; the re-normalization fold is sequential in
    * element order on both the SQL and the driver spelling. Cells that
    * captured no vectors keep their previous centroid. Each pass ends
    * in a k-row localCheckpoint (trivially rebuildable; the real
    * artifact is the parquet write in buildIvf). */
  private[graft] def trainCentroids(units: DataFrame, seeds: DataFrame,
                                    iters: Int): DataFrame = {
    var cents = seeds
    for (_ <- 0 until iters) {
      val assigned = assignCells(units, cents)
      val sums = (0 until Dim).map(i =>
        sum(element_at(col("u"), i + 1).cast(DecimalType(28, 10)))
          .cast(DoubleType).as(s"s$i"))
      val refined = units.join(assigned, Seq("vec_id"))
        .groupBy(col("cell"))
        .agg(sums.head, sums.tail :+ count(lit(1)).as("n"): _*)
        .select(col("cell"),
          array((0 until Dim).map(i => col(s"s$i") / col("n")): _*).as("m"))
        .withColumn("nrm", sqrt(aggregate(col("m"), lit(0.0), (acc, x) => acc + x * x)))
        .select(col("cell"),
          when(col("nrm") > 0, transform(col("m"), _ / col("nrm"))).as("refined"))
      cents = cents.join(refined, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("refined"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    cents
  }

  // ---- index build / probe ----

  /** Build the IVF index under `dir`:
    *   dir/centroids — (cell, centroid) parquet, nCells rows;
    *   dir/cells     — the corpus partitioned by cell (Hive layout),
    *                   so probes prune at file listing.
    * Assignment reads the centroids BACK from parquet — the persisted
    * doubles, not the training lineage, are the contract. */
  def buildIvf(spark: SparkSession, embeddings: DataFrame, dir: String,
               nCells: Int = 16, lloydIters: Int = 1): Unit = {
    // Unit vectors feed every Lloyd pass AND the final assignment;
    // materialize once. localCheckpoint is not executor-fault-tolerant
    // — acceptable for a bounded build job (a lost executor restarts
    // the build); a long-lived cluster build would persist
    // MEMORY_AND_DISK instead.
    val units = embeddings
      .select(col("vec_id"), Similarity.unitVector(col("embedding")).as("u"))
      .localCheckpoint()
    val cents = trainCentroids(units, seedCentroids(embeddings, nCells), lloydIters)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    val assigned = assignCells(units, spark.read.parquet(s"$dir/centroids"))
    embeddings.join(assigned, Seq("vec_id"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/cells")
  }

  /** The query's nProbe nearest cells — one nCells-row read + argsort,
    * driver-side by nature (it picks WHICH partitions to touch). */
  private[graft] def probeCellsFor(spark: SparkSession, dir: String,
                                   qVec: Array[Float], nProbe: Int): Seq[Int] =
    spark.read.parquet(s"$dir/centroids").collect()
      .map { r =>
        val c = r.getSeq[Double](1)
        (r.getInt(0), c.zip(qVec).map { case (a, b) => a * b.toDouble }.sum)
      }
      .sortBy { case (cell, d) => (-d, cell) }
      .take(nProbe).map(_._1).toSeq

  /** Probe the persisted index: read ONLY the nProbe nearest cell
    * partitions, exact-cosine re-rank, top-k. The corpus scan is
    * partition-pruned — at cluster scale this touches nProbe
    * directories of a 100 TB table, never the table. */
  def probeIvf(spark: SparkSession, dir: String, embeddings: DataFrame,
               queryId: Long = 0L, k: Int = 10, nProbe: Int = 4): DataFrame = {
    val qRows = embeddings.filter(col("vec_id") === queryId)
      .select("embedding").collect()
    require(qRows.nonEmpty, s"probeIvf: query vec_id=$queryId not found in corpus")
    val qVec: Array[Float] = qRows.head.getSeq[Float](0).toArray
    val cells = probeCellsFor(spark, dir, qVec, nProbe)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(cells: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("q_emb")).as("raw_cos"))
      .orderBy(col("raw_cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw_cos"), 4).as("cos_sim"))
  }

  /** Persist the LSH signature table (vec_id, embedding, buckets):
    * numTables sign-LSH bucket ids per vector, hashed ONCE. */
  def buildLsh(embeddings: DataFrame, path: String,
               numPlanes: Int = 4, numTables: Int = 6): Unit =
    Similarity.lshSignatureTable(embeddings, numPlanes, numTables)
      .write.mode("overwrite").parquet(path)

  // ---- int8 scalar-quantized tier (the IO lever at 100 TB) ----
  //
  // A float32 embedding table's payload IS the scan bill at corpus
  // scale; 8-bit scalar quantization cuts the first-pass bytes 4x
  // (dim bytes/vector instead of 4*dim). The standard two-phase read:
  // rank EVERYTHING on the quantized codes (cheap, slightly lossy),
  // then exact-float re-rank only a rerank*k candidate pool — recall
  // is gated, not assumed, exactly like the LSH/IVF tiers.
  //
  // Quantization grid: per-DIMENSION affine (min_d, scale_d) over the
  // UNIT-normalized corpus, so dequantized dot products approximate
  // cosine directly. Codes are exact integers from one deterministic
  // rounding; params are min/max aggregates (no accumulation-order
  // sensitivity), so the whole tier is bit-reproducible.

  /** Build the SQ8 index under `dir`:
    *   dir/sq_params — 1 row: per-dim mins + scales (array<double>);
    *   dir/sq_codes  — (vec_id, codes array<int> in 0..255), the
    *                   4x-smaller first-pass table. */
  def buildSq(spark: SparkSession, embeddings: DataFrame, dir: String): Unit = {
    val units = embeddings
      .select(col("vec_id"), Similarity.unitVector(col("embedding")).as("u"))
      .localCheckpoint()
    val params = units.agg(
      array((0 until Dim).map(i => min(element_at(col("u"), i + 1))): _*).as("mins"),
      array((0 until Dim).map(i =>
        (max(element_at(col("u"), i + 1)) - min(element_at(col("u"), i + 1))) / 255.0): _*)
        .as("scales"))
    params.coalesce(1).write.mode("overwrite").parquet(s"$dir/sq_params")
    val p = spark.read.parquet(s"$dir/sq_params")
    units.crossJoin(broadcast(p))
      .select(col("vec_id"), quantize(col("u"), col("mins"), col("scales")).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/sq_codes")
  }

  /** code_d = round((x_d - min_d) / scale_d), 0..255; constant dims
    * (scale 0) land on code 0. */
  private[graft] def quantize(u: org.apache.spark.sql.Column,
                              mins: org.apache.spark.sql.Column,
                              scales: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    zip_with(zip_with(u, mins, (x, m) => x - m), scales,
      (d, s) => when(s > 0, round(d / s, 0)).otherwise(lit(0.0)).cast("int"))

  /** dequant_d = code_d * scale_d + min_d — the first-pass vector. */
  private[graft] def dequantize(codes: org.apache.spark.sql.Column,
                                mins: org.apache.spark.sql.Column,
                                scales: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    zip_with(zip_with(codes, scales, (c, s) => c * s), mins, (v, m) => v + m)

  /** Two-phase quantized top-k: rank the WHOLE corpus on dequantized
    * int8 codes (the 4x-cheaper scan), keep a rerank*k pool, exact
    * float-cosine re-rank only the pool. Output schema matches the
    * other ANN probes. */
  def sqTopK(spark: SparkSession, dir: String, embeddings: DataFrame,
             queryId: Long = 0L, k: Int = 10, rerank: Int = 4): DataFrame = {
    val p = spark.read.parquet(s"$dir/sq_params")
    val qCodes = embeddings.filter(col("vec_id") === queryId)
      .select(Similarity.unitVector(col("embedding")).as("u"))
      .crossJoin(broadcast(p))
      .select(dequantize(quantize(col("u"), col("mins"), col("scales")),
        col("mins"), col("scales")).as("q_dq"))
    val pool = spark.read.parquet(s"$dir/sq_codes")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(p))
      .crossJoin(broadcast(qCodes))
      .select(col("vec_id"),
        Similarity.dot(dequantize(col("codes"), col("mins"), col("scales")), col("q_dq"))
          .as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rerank * k)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    pool.select(col("vec_id"))
      .join(embeddings, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("q_emb")).as("raw_cos"))
      .orderBy(col("raw_cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw_cos"), 4).as("cos_sim"))
  }

  /** Compose the two index tiers (the classic IVF-SQ layout): the int8
    * code table written PARTITIONED BY the IVF cell, so a probe reads
    * nProbe partitions OF THE 4x-SMALLER table — partition pruning and
    * quantization multiply. Builds on the persisted ivf + sq artifacts
    * (assignment and codes are read back, not recomputed). */
  def buildIvfSq(spark: SparkSession, ivfDir: String, sqDir: String,
                 outDir: String): Unit =
    spark.read.parquet(s"$ivfDir/cells").select(col("vec_id"), col("cell"))
      .join(spark.read.parquet(s"$sqDir/sq_codes"), Seq("vec_id"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$outDir/cells_sq")

  /** IVF-SQ probe: nProbe nearest cells chosen from the centroid table
    * (as probeIvf), the first pass ranks ONLY those cells' int8 codes
    * (dequantized dot), and the exact float re-rank touches just a
    * rerank*k pool fetched by id via a broadcast join. At 100 TB the
    * first pass reads nProbe partitions of the code table — the
    * cheapest possible candidate scan this side of losing recall. */
  def probeIvfSq(spark: SparkSession, ivfDir: String, sqDir: String,
                 ivfSqDir: String, embeddings: DataFrame, queryId: Long = 0L,
                 k: Int = 10, nProbe: Int = 4, rerank: Int = 4): DataFrame = {
    val qRows = embeddings.filter(col("vec_id") === queryId)
      .select("embedding").collect()
    require(qRows.nonEmpty, s"probeIvfSq: query vec_id=$queryId not found")
    val qVec: Array[Float] = qRows.head.getSeq[Float](0).toArray
    val cells = probeCellsFor(spark, ivfDir, qVec, nProbe)

    val p = spark.read.parquet(s"$sqDir/sq_params")
    val qDq = embeddings.filter(col("vec_id") === queryId)
      .select(Similarity.unitVector(col("embedding")).as("u"))
      .crossJoin(broadcast(p))
      .select(dequantize(quantize(col("u"), col("mins"), col("scales")),
        col("mins"), col("scales")).as("q_dq"))
    val pool = spark.read.parquet(s"$ivfSqDir/cells_sq")
      .filter(col("cell").isin(cells: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(p))
      .crossJoin(broadcast(qDq))
      .select(col("vec_id"),
        Similarity.dot(dequantize(col("codes"), col("mins"), col("scales")), col("q_dq"))
          .as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rerank * k)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    broadcast(pool.select(col("vec_id")))
      .join(embeddings, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("q_emb")).as("raw_cos"))
      .orderBy(col("raw_cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw_cos"), 4).as("cos_sim"))
  }

  // ---- per-session artifact cache ----

  // Weak-keyed on the session (long-lived processes that cycle sessions
  // must not retain dirs); inner map keyed by sfDir + params so every
  // registered query of a run shares one build per configuration.
  private val cache = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.Map[String, String]]()

  private def artifact(spark: SparkSession, key: String)(build: String => Unit): String = {
    val m = cache.synchronized {
      var mm = cache.get(spark)
      if (mm == null) { mm = scala.collection.mutable.Map.empty[String, String]; cache.put(spark, mm) }
      mm
    }
    // builds serialized per session: first toucher pays, others reuse
    m.synchronized {
      m.getOrElseUpdate(key, {
        val d = java.nio.file.Files.createTempDirectory("graft_annindex_").toFile
        d.deleteOnExit()
        build(d.toString)
        d.toString
      })
    }
  }

  /** Memoized IVF index dir for this session + fixture. */
  def ivfDir(spark: SparkSession, sfDir: String, embeddings: DataFrame,
             nCells: Int = 16, lloydIters: Int = 1): String =
    artifact(spark, s"ivf:$sfDir:$nCells:$lloydIters")(
      buildIvf(spark, embeddings, _, nCells, lloydIters))

  /** Memoized LSH signature table for this session + fixture. */
  def lshSignatures(spark: SparkSession, sfDir: String, embeddings: DataFrame,
                    numPlanes: Int = 4, numTables: Int = 6): DataFrame = {
    val dir = artifact(spark, s"lsh:$sfDir:$numPlanes:$numTables")(
      d => buildLsh(embeddings, s"$d/lsh", numPlanes, numTables))
    spark.read.parquet(s"$dir/lsh")
  }

  /** Memoized SQ8 index dir for this session + fixture. */
  def sqDir(spark: SparkSession, sfDir: String, embeddings: DataFrame): String =
    artifact(spark, s"sq8:$sfDir")(buildSq(spark, embeddings, _))

  /** Memoized IVF-SQ composed layout (built ON the ivf + sq artifacts,
    * which it materializes first if needed). */
  def ivfSqDir(spark: SparkSession, sfDir: String, embeddings: DataFrame,
               nCells: Int = 16, lloydIters: Int = 1): String = {
    val ivf = ivfDir(spark, sfDir, embeddings, nCells, lloydIters)
    val sq = sqDir(spark, sfDir, embeddings)
    artifact(spark, s"ivfsq:$sfDir:$nCells:$lloydIters")(
      buildIvfSq(spark, ivf, sq, _))
  }
}
