package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{AnnIndex, Similarity}
import graft.sink.Compaction

/** Streaming vector ingest against the STANDING ANN index — the
  * composition the append path (`AnnIndex.appendIvf/Sq/IvfSq`) exists
  * for, and the ANN twin of `StateDedupIngest` (round-10 verdict task
  * 6; closes the last asymmetry between the dedup and ANN state
  * lifecycles): micro-batches of new vectors arrive on a stream; each
  * batch is (1) FLAGGED against the index state at its start — every
  * batch vector's top-3 neighbors among everything indexed before it
  * (the route-new-docs-to-near-dups / attach-context-at-ingest shape)
  * — and (2) APPENDED into the persisted IVF/SQ/IVF-SQ layouts with
  * the EXISTING centroids and quantization grid, delta-only writes.
  * Per-batch flag output lands in a per-batch sink dir (foreachBatch
  * append discipline — flags never accumulate on the driver). The
  * cycle ends with the IVF cell compaction sweep: each append left one
  * delta file per touched cell, and `compactPartitioned` restores the
  * per-cell file budget on BOTH cell-partitioned trees (probe parity
  * and the file-count drop are spec-pinned via `report`).
  *
  * Flag contract (the standard ANN row discipline): the EMITTED rows
  * are the exact brute-force top-3 against the state at batch start —
  * fully SQL-replayable given pinned batch boundaries — and the routed
  * batch probe of the same state enters as `batch_recall_ok`
  * (>= 0.9 pair recall at nProbe=14/rerank=24).
  *
  * Determinism contract (what lets a DuckDB oracle replay a STREAM):
  * MemoryStream + explicit processAllAvailable() pins the batch
  * boundaries, and batch-k flags depend only on (corpus, batches < k)
  * — so the fixed point equals the two-stage batch recompute the
  * registered oracle spells. At scale the same foreachBatch body runs
  * under any real source; batch boundaries then vary but each batch's
  * flags remain exact w.r.t. the state at its start. */
object StreamAnnIngest {

  final case class Vec(vec_id: Long, embedding: Seq[Float], label: Int)

  private val cache = DemoMemo.register(java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()))
  private val reports = new scala.collection.concurrent.TrieMap[
    String, ((Int, Int), (Int, Int))]()

  def demo(spark: SparkSession, sfDir: String): DataFrame = {
    val m = cache.synchronized {
      var mm = cache.get(spark)
      if (mm == null) {
        mm = scala.collection.mutable.Map.empty[String, DataFrame]
        cache.put(spark, mm)
      }
      mm
    }
    m.synchronized { m.getOrElseUpdate(sfDir, runImpl(spark, sfDir)) }
  }

  /** (cells, cells_sq) (filesBefore, filesAfter) of the closing
    * compaction sweep — for the spec's file-count pin. */
  def report(sfDir: String): Option[((Int, Int), (Int, Int))] = reports.get(sfDir)

  private def runImpl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emb = graft.Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 10 =!= 3 && col("vec_id") % 10 =!= 7)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ann_").toString
    val (ivf, sq, csq) = (s"$root/ivf", s"$root/sq", s"$root/csq")
    AnnIndex.buildIvfSqAll(spark, corpus, ivf, sq, csq)

    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_ann_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ann_ckpt_").toString

    val batch1 = emb.filter(col("vec_id") % 10 === 3).as[Vec].collect().toSeq
    val batch2 = emb.filter(col("vec_id") % 10 === 7).as[Vec].collect().toSeq

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Vec]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // flag against the index state AS OF the batch's start: the
        // emitted rows are the exact top-3 over the indexed vectors
        // (read back from the cell tree — the index IS the state),
        // the routed probe of the same state gates them
        val state = spark.read.parquet(s"$ivf/cells")
          .select(col("vec_id"), col("embedding"))
        val exact = Similarity.batchTopKExact(state, batch, k = 3).localCheckpoint()
        val ann = AnnIndex.batchProbeIvfSqFrames(spark, ivf, sq, csq, emb,
          batch, k = 3, nProbe = 14, rerank = 24)
        val (total, hits) = Similarity.totalAndHits(exact, ann,
          Seq("query_id", "vec_id"))
        exact
          .withColumn("batch_recall_ok",
            lit(total == 0L || hits.toDouble / total >= 0.9))
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        // absorb: delta-only appends, existing centroids + grid — one
        // shared unit projection, no standing-index scans (appendAll)
        AnnIndex.appendAll(spark, ivf, sq, csq, batch)
      }
      .start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // lifecycle close: sweep the delta files the appends accumulated
    // in both cell-partitioned trees (the q_ann_ivf_compact sweep)
    val rCells = Compaction.compactPartitioned(spark, s"$ivf/cells", "cell", "vec_id")
    val rSq = Compaction.compactPartitioned(spark, s"$csq/cells_sq", "cell", "vec_id")
    reports.put(sfDir, (rCells, rSq))

    spark.read.parquet(outDir)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"),
        col("batch_recall_ok"))
      .orderBy("query_id", "rank")
  }
}
