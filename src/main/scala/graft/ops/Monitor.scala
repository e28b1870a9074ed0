package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Ops/monitoring surface — the engine analog of the reference's
  * monitor scripts (`monitoring/monitor.sh:21-87` row counts + health,
  * `monitoring/cassandra_latency_check.py` read latency,
  * `monitoring/compaction_monitor.sh:20-33` storage health; the
  * compaction counterpart lives in `graft.sink.Compaction`).
  *
  * Design: no full scans for bookkeeping. Row counts come from parquet
  * footers (block metadata), so a 100 TB table reports in seconds from
  * file listings; streaming health reads the already-collected
  * `lastProgress` of a running query; latency probes time a real query.
  */
object Monitor {

  final case class TableStats(table: String, files: Long, bytes: Long, rows: Long)

  /** Footer-derived stats for one parquet table directory. Listing and
    * footer reads both go through the Hadoop `FileSystem` API, so the
    * same sweep works against local paths, `file:///` URIs, and
    * HDFS/S3-style object stores — where a `java.io.File` listing would
    * silently return nothing. */
  def tableStats(dir: String, table: String): TableStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FileStatus, Path}
    import scala.jdk.CollectionConverters._
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootStatus = fs.getFileStatus(root)
    val files: Array[FileStatus] =
      if (rootStatus.isFile) Array(rootStatus)
      else fs.listStatus(root)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    var rows = 0L
    var bytes = 0L
    files.foreach { st =>
      bytes += st.getLen
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try rows += r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally r.close()
    }
    TableStats(table, files.length.toLong, bytes, rows)
  }

  /** The monitor.sh row-count sweep over the fixture warehouse as a
    * DataFrame — registered as `q_monitor_stats`, so the footer-based
    * counts are themselves under the DuckDB COUNT(*) oracle. */
  def statsReport(spark: SparkSession, sfDir: String,
                  tables: Seq[String] = Seq("events", "lineitem", "orders",
                    "customer", "supplier", "part", "nation", "region",
                    "documents", "embeddings")): DataFrame = {
    val rows = tables.sorted.map { t =>
      val s = tableStats(s"$sfDir/$t.parquet", t)
      Row(s.table, s.rows)
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  final case class StreamHealth(
      name: String, batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double, triggerExecutionMs: Long, stateRows: Long)

  /** Health snapshot of a running streaming query (None before its
    * first completed batch) — inputs the reference's monitor tails
    * from consumer logs. */
  def streamHealth(q: StreamingQuery): Option[StreamHealth] =
    Option(q.lastProgress).map { p =>
      val stateRows =
        if (p.stateOperators == null) 0L
        else p.stateOperators.map(_.numRowsTotal).sum
      StreamHealth(
        name = Option(p.name).getOrElse(q.id.toString),
        batchId = p.batchId,
        numInputRows = p.numInputRows,
        processedRowsPerSecond =
          if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
        triggerExecutionMs =
          Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L),
        stateRows = stateRows)
    }

  /** Read-latency probe: wall-clock a real query (the analog of
    * `cassandra_latency_check.py`'s timed point read). */
  def timedProbe[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
