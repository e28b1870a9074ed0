package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.ManifestSink

/** Epoch as a V2 streaming offset: the commit-marker sequence is
  * already a totally-ordered log, so the offset IS the epoch number —
  * no side bookkeeping to drift from the table. */
final case class EpochOffset(epoch: Int) extends Offset {
  override def json(): String = epoch.toString
}

/** `spark.readStream.table("graft.`/path`")` — the DSv2 micro-batch
  * HALF of the streaming-source story (the `format("graft-manifest")`
  * V1 source remains for change-feed mode): offsets are committed
  * epochs, each batch (from, to] plans EXACTLY the files those epochs
  * appended to the manifest — per-trigger work is O(new data)
  * regardless of table size. The first batch from the initial offset
  * is the snapshot-then-tail opening (full manifest of the first
  * observed epoch), or `option("startEpoch", N)` skips the snapshot.
  *
  * Append-only contract (Delta's): a batch range that REMOVED
  * manifest files or changed delete vectors (CoW rewrite, compaction,
  * MoR delete) fails fast rather than silently re-streaming carried
  * rows — `option("allowRewrites", true)` opts out for key-deduping
  * consumers; row-level change feeds stay on the V1 source's
  * `changeFeedKey` mode (a diff is a join, not a file list — it
  * cannot be planned as raw file partitions).
  *
  * Column pruning applies: the scan builder's pruned `required`
  * schema reaches every batch's parquet plan. Exactly-once composes
  * the same way as the V1 source: immutable files + engine-owned
  * offsets + an idempotent-txn downstream sink. */
final class GraftMicroBatchStream(spark: SparkSession, dir: String,
                                  tableSchema: StructType, required: StructType,
                                  startEpoch: Int, allowRewrites: Boolean)
  extends MicroBatchStream {

  private val rootUri = new org.apache.hadoop.fs.Path(dir).toUri.getPath

  private def relFiles(e: Int): Set[String] =
    if (e <= 0) Set.empty
    else ManifestSink.manifestFiles(spark, dir, e).map { p =>
      new org.apache.hadoop.fs.Path(p).toUri.getPath
        .stripPrefix(rootUri).stripPrefix("/")
    }.toSet

  override def initialOffset(): Offset = EpochOffset(startEpoch)

  override def latestOffset(): Offset =
    EpochOffset(ManifestSink.currentEpochOpt(spark, dir)
      .filter(_ > startEpoch).getOrElse(startEpoch))

  override def deserializeOffset(json: String): Offset =
    EpochOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[EpochOffset].epoch
    val to = end.asInstanceOf[EpochOffset].epoch
    if (to <= from) return Array.empty
    val prev = relFiles(from)
    val cur = relFiles(to)
    val removed = prev -- cur
    val dvChanged =
      (if (from <= 0) None else ManifestSink.commitDv(spark, dir, from)) !=
        ManifestSink.commitDv(spark, dir, to)
    if ((removed.nonEmpty || dvChanged) && !allowRewrites)
      throw new IllegalStateException(
        s"streaming read of $dir: epochs ($from, $to] removed " +
          s"${removed.size} files / changed delete vectors; the micro-batch " +
          "source requires append-only epochs — set allowRewrites=true, or " +
          "use format(\"graft-manifest\") with changeFeedKey for the " +
          "row-level change feed")
    val added = (cur -- prev).toSeq.sorted
    if (added.isEmpty) Array.empty
    else {
      // sizes from the manifest entries of `to` — the per-batch plan
      // pays zero per-file RPCs, like every other planning path
      val sizes = ManifestSink.manifestEntries(spark, dir, to).toMap
      scanOver(added.map { n =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$n")
        sizes.get(n).filter(_ >= 0)
          .map(s => new org.apache.hadoop.fs.FileStatus(s, false, 1, 134217728L, 0L, p))
          .getOrElse(p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getFileStatus(p))
      }).planInputPartitions()
    }
  }

  private def scanOver(statuses: Seq[org.apache.hadoop.fs.FileStatus]) = {
    val idx = new graft.sink.StaticFileIndex(spark,
      new org.apache.hadoop.fs.Path(dir), statuses)
    ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(Map.empty),
      idx,
      dataSchema = tableSchema,
      readDataSchema = required,
      readPartitionSchema = StructType(Nil),
      pushedFilters = Array.empty,
      options = CaseInsensitiveStringMap.empty()).toBatch
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scanOver(Nil).createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
