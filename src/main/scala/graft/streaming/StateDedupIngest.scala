package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Streaming corpus ingest against the STANDING dedup state — the
  * composition `IncrementalDeduper` exists for (reference dataflow:
  * `spark_consumer.py`'s foreachBatch sink discipline applied to the
  * LLM-curation side): micro-batches of new documents arrive on a
  * stream; each batch is (1) flagged against the state built from
  * everything before it — corpus + all prior batches, never a corpus
  * rescan — and (2) appended into the persisted epoch chain, exactly
  * the crash-safe parquet epochs + atomic META discipline the batch
  * API uses. Per-batch flag output lands in a per-batch sink dir
  * (foreachBatch append discipline — flags never accumulate on the
  * driver).
  *
  * Determinism contract (what lets a DuckDB oracle replay a STREAM):
  * MemoryStream + explicit processAllAvailable() pins the batch
  * boundaries, and batch-k flags depend only on (corpus, batches < k)
  * — so the fixed point equals the two-stage batch recompute, which
  * is what the registered oracle spells. At scale the same
  * foreachBatch body runs under any real source (Kafka/files); batch
  * boundaries then vary but each batch's flags remain exact w.r.t.
  * the state at its start — the ingest-dedup semantics a training
  * pipeline wants.
  */
object StateDedupIngest {

  final case class Doc(doc_id: Long, text: String)

  // per-(session, sfDir) memo: the stream runs once per session; the
  // weak key drops the entry when the session goes away
  private val cache = DemoMemo.register(java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()))

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

  private def runImpl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_stream_dedup_state_").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_dedup_out_").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_dedup_ckpt_").toString
    val deduper = Dedup.IncrementalDeduper.init(corpus, stateDir)

    val batch1 = docs.filter(col("doc_id") % 10 === 0).as[Doc].collect().toSeq
    val batch2 = docs.filter(col("doc_id") % 10 === 5).as[Doc].collect().toSeq

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // flag against the state as of the batch's start, THEN absorb
        deduper.dedupBatch(batch)
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        deduper.append(batch)
      }
      .start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // retention: the ingest cycle ends with the vacuum sweep — every
    // append left a full prior-epoch state copy; only the current
    // epoch survives (keep=1), completing the ingest -> flag ->
    // append -> vacuum lifecycle a standing production stream runs
    Dedup.IncrementalDeduper.vacuum(spark, stateDir)

    spark.read.parquet(outDir)
      .select(col("doc_id"), col("exact_dup"), col("near_dup"))
      .orderBy("doc_id")
  }
}
