package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sink.ManifestSink

/** Streaming writes through manifest commits — exactly-once VISIBILITY
  * for a file-based streaming sink: each micro-batch commits a new
  * table EPOCH through `ManifestSink.publishAppend`, so a reader at
  * any instant sees a complete, atomically-committed
  * prefix of the stream — never a half-written batch. This closes the
  * gap the plain foreachBatch parquet sink leaves at 100 TB: a reader
  * listing the directory mid-batch sees partial task files; the
  * manifest pointer flips only after the batch's files are audited.
  *
  * Epoch layout = WAP indirection, per batch: batch id -> epoch id,
  * committed via `publishAppend` — each manifest references the prior
  * epoch's data files plus the new batch's, so a commit costs
  * O(batch) data I/O (data files are written once and shared across
  * manifests; a cumulative republish would be quadratic over the
  * stream's life). Previous epochs stay pinned (time travel across
  * stream history) until `ManifestSink.vacuum` bounds them —
  * file sharing is vacuum-safe: dropped epochs' files survive while
  * any kept manifest references them. Determinism:
  * MemoryStream pins batch boundaries, cumulative content is a pure
  * prefix function, so the final manifest-resolved read replays in
  * SQL as the full expected content — and the spec additionally pins
  * each intermediate epoch against its prefix. */
object StreamManifestSink {

  final case class Ev(event_id: Long, user_id: Long, value: Double)

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, (String, DataFrame)]]())

  /** Runs the demo once per session + SF; returns (tableRoot, frame). */
  def demoWithRoot(spark: SparkSession, sfDir: String): (String, DataFrame) = {
    val m = cache.synchronized {
      var mm = cache.get(spark)
      if (mm == null) {
        mm = scala.collection.mutable.Map.empty[String, (String, DataFrame)]
        cache.put(spark, mm)
      }
      mm
    }
    m.synchronized { m.getOrElseUpdate(sfDir, runImpl(spark, sfDir)) }
  }

  def demo(spark: SparkSession, sfDir: String): DataFrame =
    demoWithRoot(spark, sfDir)._2

  private def runImpl(spark: SparkSession, sfDir: String): (String, DataFrame) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val root = java.nio.file.Files.createTempDirectory("graft_stream_manifest_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_manifest_ckpt_").toString

    val batch1 = ev.filter(col("event_id") % 3 === 0).as[Ev].collect().toSeq
    val batch2 = ev.filter(col("event_id") % 3 === 1).as[Ev].collect().toSeq

    // APPEND-publish per batch: the new manifest references the prior
    // epoch's files plus this batch's — O(batch) data I/O per commit,
    // never a cumulative rewrite (quadratic over a stream's life);
    // the pointer still flips only after the batch's files are audited
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // range-cluster each batch on the zone-map column so the
        // streamed table keeps its data-skipping property per commit
        ManifestSink.publishAppendWithStats(
          batch.repartitionByRange(4, col("event_id"))
            .sortWithinPartitions("event_id"),
          root, id.toInt + 1, "event_id")
        ()
      }
      .start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    (root, ManifestSink.read(spark, root).orderBy("event_id"))
  }
}
