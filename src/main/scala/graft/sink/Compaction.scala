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

  /** Swap the rewritten `tmp` tree in for `path` via RENAME-ASIDE
    * (ADVICE r9: the delete-then-rename first cut had a window where a
    * failed second rename left the table deleted): path -> path__old,
    * tmp -> path, then drop path__old. Every rename's boolean result
    * is checked — a failure throws with the recovery copy still on
    * disk (`__old` after step 1, `tmp` after a failed step 2). */
  private def swapIn(path: String, tmp: String): Unit = {
    val (fs, root) = fsOf(path)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(old, true)
    if (!fs.rename(root, old))
      throw new java.io.IOException(s"compaction swap: rename $path -> $old failed")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), root))
      throw new java.io.IOException(
        s"compaction swap: rename $tmp -> $path failed; original preserved at $old")
    fs.delete(old, true): Unit
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

    swapIn(path, tmp)
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

    swapIn(path, tmp)
    (before.size, dataFiles(path).size)
  }

  /** Compact ANY hive-partitioned directory (partition column parsed
    * from the `col=value` path segments) with a PER-PARTITION-VALUE
    * file budget: partition value v gets max(1, ceil(bytes(v)/target))
    * output files, so a hot cell that accumulated gigabytes splits
    * while a cold cell collapses to one file. This is the IVF-cell
    * sweep (round-9 verdict task 5): incremental appends
    * (`AnnIndex.appendIvf`) leave one delta file per append per cell,
    * and probe cost creeps with file count; the sweep restores
    * one-file-per-small-cell without touching the index's centroid or
    * grid artifacts, and probe results are bit-identical (same rows,
    * same partition values — only the file layout changes).
    *
    * Scale shape: the only driver-side state is one (value, n_files)
    * row per partition value (≤ nCells for an IVF index — bounded,
    * same class as the probed-cell union); rows route to output files
    * via a broadcast of that map + a salt, one shuffle total.
    *
    * The per-value budget is BEST-EFFORT, not exact (ADVICE r9): the
    * router is `repartition(totalFiles, partitionCol, __salt)`, a hash
    * partitioning, so distinct (value, salt) groups can collide into
    * one task and a value may land in fewer (or shared) output files
    * than its computed max(1, ceil(bytes/target)). Collisions only
    * ever UNDER-shoot the file count — never oversize a cold cell —
    * and the spec's bound is `1 <= files(v) <= budget(v)`.
    *
    * @return (filesBefore, filesAfter). */
  def compactPartitioned(spark: SparkSession, path: String, partitionCol: String,
                         sortCol: String,
                         targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val before = dataFiles(path)
    if (before.isEmpty) return (0, 0)
    val marker = partitionCol + "="
    // per-partition-value byte totals from the listing (no data scan)
    val filesPerValue: Map[String, Long] = before
      .groupBy(_.getPath.toString.split('/')
        .find(_.startsWith(marker)).map(_.stripPrefix(marker)).getOrElse(""))
      .map { case (v, fs) =>
        v -> math.max(1L, (fs.map(_.getLen).sum + targetFileBytes - 1) / targetFileBytes)
      }
    val totalFiles = filesPerValue.values.sum.toInt

    import spark.implicits._
    val budget = filesPerValue.toSeq.toDF("__pv", "__n_files")
    val df = spark.read.parquet(path)
    val tmp = path + "__compacting"
    df.withColumn("__pv", col(partitionCol).cast(StringType))
      .join(broadcast(budget), Seq("__pv"))
      // salt splits an over-budget value across its n_files outputs
      .withColumn("__salt", pmod(xxhash64(col(sortCol)), col("__n_files")))
      .repartition(totalFiles, col(partitionCol), col("__salt"))
      .drop("__pv", "__n_files", "__salt")
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)

    swapIn(path, tmp)
    (before.size, dataFiles(path).size)
  }

  /** Parquet data-file count under `path` (recursive) — the metric
    * compaction moves; exposed for specs and reports. */
  def fileCount(path: String): Int = dataFiles(path).size

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
