package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the bucketed sink layout — the engine
  * analog of Cassandra's compaction strategies (`cassandra/init.cql:
  * 27-31,50-53`; matrix `docs/baseline-architecture.md:161-167`):
  * streaming appends leave one small file per micro-batch per bucket;
  * periodically rewriting each bucket into max(1, bytes/targetBytes)
  * files restores scan efficiency, preserving the in-bucket clustering
  * sort. Idempotent: a second pass is a no-op rewrite.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) parquet data-file counts. */
  def compact(spark: SparkSession, path: String, keyCol: String, clusterCol: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def dataFiles(p: java.io.File): Seq[java.io.File] =
      if (!p.exists()) Seq.empty
      else if (p.isDirectory) p.listFiles().toSeq.flatMap(dataFiles)
      else if (p.getName.endsWith(".parquet")) Seq(p)
      else Seq.empty

    val root = new java.io.File(path)
    val before = dataFiles(root)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_.length()).sum
    val targetFiles = math.max(1, (totalBytes / targetFileBytes).toInt)

    val df = spark.read.parquet(path)
    val tmp = path + "__compacting"
    df.repartition(targetFiles, col("bucket"))
      .sortWithinPartitions(col(keyCol), col(clusterCol).desc)
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(root)
    new java.io.File(tmp).renameTo(root)
    (before.size, dataFiles(root).size)
  }
}
