package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small-file compaction for the bucketed sink layout — the engine
  * analog of Cassandra's compaction strategies (`cassandra/init.cql:
  * 27-31,50-53`; matrix `docs/baseline-architecture.md:161-167`):
  * streaming appends leave one small file per micro-batch per bucket;
  * periodically rewriting each bucket into max(1, bytes/targetBytes)
  * files restores scan efficiency, preserving the in-bucket clustering
  * sort. Idempotent: a second pass is a no-op rewrite.
  *
  * All listings and moves go through the Hadoop `FileSystem` API (like
  * `graft.ops.Monitor`), so the same sweep works on local paths,
  * `file:///` URIs, and HDFS/S3-style stores.
  */
object Compaction {

  private def fsOf(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  private def dataFiles(path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val (fs, root) = fsOf(path)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, /*recursive=*/ true)
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) out += st
    }
    out.result()
  }

  /** @return (filesBefore, filesAfter) parquet data-file counts. */
  def compact(spark: SparkSession, path: String, keyCol: String, clusterCol: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val before = dataFiles(path)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_.getLen).sum
    val targetFiles = math.max(1, (totalBytes / targetFileBytes).toInt)

    val df = spark.read.parquet(path)
    val tmp = path + "__compacting"
    df.repartition(targetFiles, col("bucket"))
      .sortWithinPartitions(col(keyCol), col(clusterCol).desc)
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)

    val (fs, root) = fsOf(path)
    fs.delete(root, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), root)
    (before.size, dataFiles(path).size)
  }

  /** Flat (bucketless) compaction of an append-accumulated directory
    * into max(1, totalBytes/targetFileBytes) files sorted by `sortCol`.
    * The micro-batch-append -> periodic-rewrite cycle for a plain
    * parquet table. */
  def compactFlat(spark: SparkSession, path: String, sortCol: String,
                  targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val before = dataFiles(path)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_.getLen).sum
    val targetFiles = math.max(1, (totalBytes / targetFileBytes).toInt)

    // recursive lookup: micro-batch appends may land in per-batch
    // subdirectories (concurrent writers can't share one _temporary)
    val df = spark.read.option("recursiveFileLookup", "true").parquet(path)
    val tmp = path + "__compacting"
    df.repartition(targetFiles).sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(tmp)

    val (fs, root) = fsOf(path)
    fs.delete(root, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), root)
    (before.size, dataFiles(path).size)
  }

  /** Size-tier histogram of a table's data files — the engine analog of
    * the reference's SSTable size-tier report
    * (`monitoring/cassandra_auto_flush.sh:22-78`): tier t holds files
    * with rows in [base*growth^t, base*growth^(t+1)), tier -1 anything
    * below base. Many files piling up in a low tier = the signal to
    * compact. Tiers are keyed on footer ROW counts, not bytes — rows
    * are deterministic across encoders and runs, bytes are not — and
    * footers make the sweep scan-free (metadata only, like Monitor). */
  def tierHistogram(spark: SparkSession, path: String, phase: String,
                    baseRows: Long = 500, growth: Int = 4): DataFrame = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val tiers = dataFiles(path).map { st =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      val rows = try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum finally r.close()
      if (rows < baseRows) -1
      else (math.log(rows.toDouble / baseRows) / math.log(growth.toDouble) + 1e-9).toInt
    }
    val rows = tiers.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (tier, fs) => Row(phase, tier, fs.size.toLong) }
    val schema = StructType(Seq(
      StructField("phase", StringType, nullable = false),
      StructField("tier", IntegerType, nullable = false),
      StructField("n_files", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
