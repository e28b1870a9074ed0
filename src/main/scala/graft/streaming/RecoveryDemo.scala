package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Checkpoint recovery (SURVEY §2.1 S8; the reference pins one
  * checkpoint dir per query, `src/spark_consumer.py:159,209`, and its
  * docs warn about stale-checkpoint recovery semantics) surfaced as a
  * deterministic batch result: a file-source stream through the REAL ingest-dedup
  * operator (`dropDuplicatesWithinWatermark`) is STOPPED mid-run and a
  * NEW query object is started from the same checkpoint. The fixed
  * point proves the two recovery guarantees at once:
  *
  *  - source offsets recover: file 1 is not re-read after the restart
  *    (its rows appear exactly once, with the pre-restart batch id);
  *  - operator STATE recovers: file 2 redelivers a file-1 reading, and
  *    the restarted query drops it because the dedup state store was
  *    rebuilt from the checkpoint — a fresh query would emit it again.
  *
  * Exactly-once ingest across restarts is precisely this pair. Every
  * run uses fresh temp dirs, so concurrent invocations are isolated;
  * results are memoized per session by StreamingDemos.
  */
object RecoveryDemo {

  private val BaseMs = 1704067200000L // 2024-01-01T00:00:00Z

  private val schema = StructType(Seq(
    StructField("device_id", StringType),
    StructField("timestamp", LongType),
    StructField("temperature", FloatType)))

  private def writeFile(dir: String, name: String, rows: Seq[(String, Long, Float)]): Unit = {
    val json = rows.map { case (d, t, v) =>
      s"""{"device_id":"$d","timestamp":$t,"temperature":$v}"""
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), json.getBytes("UTF-8"))
  }

  private[graft] def recoveryDemoImpl(spark: SparkSession): DataFrame = {
    val src = Files.createTempDirectory("graft_recov_src_").toString
    val ckpt = Files.createTempDirectory("graft_recov_ckpt_").toString
    val collected =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean, String, Long, Float)]()

    def runOnce(afterRestart: Boolean): Unit = {
      // A NEW query object each call — only the checkpoint carries
      // offsets + state across the stop/start boundary.
      val q = StreamJoins.dedupWithinWatermark(
        spark.readStream.schema(schema).json(src))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          df.collect().foreach { r =>
            collected.add((batchId, afterRestart, r.getString(0), r.getLong(1), r.getFloat(2)))
          }
        }
        .start()
      q.awaitTermination()
    }

    // run 1: two readings, drained as batch 0, then the query STOPS
    writeFile(src, "f1.json", Seq(
      ("d1", BaseMs, 21f),
      ("d2", BaseMs + 1000L, 22f)))
    runOnce(afterRestart = false)

    // run 2 from the SAME checkpoint: d1@Base is a redelivery (must be
    // dropped by the RECOVERED state), d1@Base+2s is genuinely new
    writeFile(src, "f2.json", Seq(
      ("d1", BaseMs, 21f),
      ("d1", BaseMs + 2000L, 23f)))
    runOnce(afterRestart = true)

    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val rows = collected.asScala.toSeq
    // The result is a LOCAL Seq from here on — the source/checkpoint
    // dirs carry no live dependency, so delete them now instead of
    // leaking two temp trees per invocation (specs call this outside
    // the memo cache).
    Seq(src, ckpt).foreach { d =>
      try
        Files.walk(Paths.get(d))
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.deleteIfExists(p))
      // Files.walk surfaces traversal errors as UncheckedIOException (a
      // RuntimeException) — best-effort cleanup must swallow those too,
      // not fail the recovery query on a transient FS hiccup.
      catch { case scala.util.control.NonFatal(_) => () }
    }
    rows
      .toDF("batch_id", "after_restart", "device_id", "timestamp", "temperature")
      .orderBy("after_restart", "device_id", "timestamp")
  }
}
