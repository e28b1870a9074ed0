package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish table commits — the manifest discipline the
  * lakehouse formats (Iceberg/Delta — public designs) use to make a
  * multi-file batch write ATOMIC on a store whose directory listings
  * are not transactional. The reference's sink writes rely on
  * Cassandra's per-row atomicity; a file-based 100 TB sink has no such
  * luxury: a writer that dies after 500 of 800 task files leaves a
  * directory that LISTS as half a table. The fix is indirection:
  *
  *   1. WRITE   — data files land under an epoch directory
  *                (`data-epoch=N/`); files are immutable once written.
  *   2. AUDIT   — the publisher lists exactly the files the Spark
  *                write produced (post-write listing of the epoch dir:
  *                the committed task outputs).
  *   3. PUBLISH — a `manifest-N` file naming those files is written,
  *                then the `MANIFEST` pointer flips to N via Hadoop
  *                FileContext rename-OVERWRITE (the IncrementalDeduper
  *                META discipline) — ONE atomic metadata operation.
  *
  * Readers resolve `MANIFEST` -> `manifest-N` -> file list and read
  * ONLY listed files: a crashed writer's orphans, a concurrent
  * in-flight epoch, or a stray temporary are all INVISIBLE until some
  * later publish lists them. Old epochs stay readable by pinning their
  * manifest (time travel) until a retention sweep drops them — the
  * same lifecycle as the dedup epoch chain and the artifact cache.
  * All I/O goes through the session's Hadoop conf, so the scheme
  * ports to HDFS/S3a stores unchanged (object stores without atomic
  * rename swap step 3 for a conditional put, as the META docs note).
  */
object ManifestSink {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Publish `df` as epoch `epoch` of the table at `root`. Returns the
    * number of data files committed to the manifest. */
  def publish(df: DataFrame, root: String, epoch: Int): Int = {
    val spark = df.sparkSession
    val epochDir = s"$root/data-epoch=$epoch"
    df.write.mode("overwrite").parquet(epochDir)
    // AUDIT: exactly the parquet files the committed write produced
    val dirPath = new org.apache.hadoop.fs.Path(epochDir)
    val f = fs(spark, dirPath)
    val files = f.listStatus(dirPath).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => s"data-epoch=$epoch/${p.getName}")
      .sorted
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val manifest = new org.apache.hadoop.fs.Path(rootPath, s"manifest-$epoch")
    val out = f.create(manifest, true)
    try out.write((files.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // PUBLISH: atomic pointer flip
    val tmp = new org.apache.hadoop.fs.Path(rootPath, "MANIFEST.tmp")
    val o2 = f.create(tmp, true)
    try o2.write(s"$epoch\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o2.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(rootPath.toUri, conf)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(rootPath, "MANIFEST"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    files.size
  }

  /** APPEND-publish: epoch N's manifest = epoch N-1's file list PLUS
    * the new batch's files — the snapshot-append every lakehouse
    * format builds on. Data files are written ONCE and shared across
    * all later manifests; a batch append costs O(batch) data I/O +
    * O(table files) metadata, never a table rewrite (the naive
    * cumulative-republish alternative is O(total) data PER BATCH —
    * quadratic over a stream's life). `vacuum` already accounts for
    * sharing: a dropped epoch's files survive while ANY kept manifest
    * references them. */
  def publishAppend(df: DataFrame, root: String, epoch: Int): Int = {
    val spark = df.sparkSession
    val epochDir = s"$root/data-epoch=$epoch"
    df.write.mode("overwrite").parquet(epochDir)
    val dirPath = new org.apache.hadoop.fs.Path(epochDir)
    val f = fs(spark, dirPath)
    val fresh = f.listStatus(dirPath).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => s"data-epoch=$epoch/${p.getName}")
    val prior =
      if (epoch <= 1) Seq.empty[String]
      else {
        val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
        manifestFiles(spark, root, epoch - 1).map { p =>
          new org.apache.hadoop.fs.Path(p).toUri.getPath
            .stripPrefix(rootUri).stripPrefix("/")
        }
      }
    val files = (prior ++ fresh).sorted
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val manifest = new org.apache.hadoop.fs.Path(rootPath, s"manifest-$epoch")
    val out = f.create(manifest, true)
    try out.write((files.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val tmp = new org.apache.hadoop.fs.Path(rootPath, "MANIFEST.tmp")
    val o2 = f.create(tmp, true)
    try o2.write(s"$epoch\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o2.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(rootPath, "MANIFEST"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    files.size
  }

  /** Publish with per-file ZONE MAPS (the Iceberg/Delta data-skipping
    * core): alongside `manifest-N`, a `stats-N` file records each data
    * file's (min, max) of `statsCol`, computed in ONE pass over the
    * just-written epoch (grouped by `input_file_name`). A range read
    * then prunes the file LIST before any scan is planned — the
    * manifest is a coarse secondary index, complementing row-group
    * stats (which prune only after a file is opened). Callers cluster
    * the write on the stats column (`repartitionByRange` + sort) so
    * file ranges are disjoint and pruning actually bites. */
  def publishWithStats(df: DataFrame, root: String, epoch: Int,
                       statsCol: String): Int = {
    val spark = df.sparkSession
    val n = publish(df, root, epoch)
    writeSidecar(spark, root, epoch, epochStatsLines(df, root, epoch, statsCol))
    n
  }

  /** Zone-map stats for the files of ONE epoch dir, as sidecar lines
    * ("relpath|lo|hi") — one pass over the epoch grouped by
    * input_file_name, one collected row per data file (bounded by the
    * file budget). */
  private def epochStatsLines(df: DataFrame, root: String, epoch: Int,
                              statsCol: String): Seq[String] = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    spark.read.parquet(s"$root/data-epoch=$epoch")
      .groupBy(input_file_name().as("f"))
      .agg(min(col(statsCol)).as("lo"), max(col(statsCol)).as("hi"))
      .collect()
      .map { r =>
        val name = new org.apache.hadoop.fs.Path(r.getString(0)).getName
        s"data-epoch=$epoch/$name|${r.get(1)}|${r.get(2)}"
      }
      .toSeq
  }

  private def writeSidecar(spark: SparkSession, root: String, epoch: Int,
                           lines: Seq[String]): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val out = f.create(new org.apache.hadoop.fs.Path(rootPath, s"stats-$epoch"), true)
    try out.write((lines.sorted.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** APPEND-publish with zone maps: the stats sidecar composes the
    * same way the manifest does — epoch N's sidecar = epoch N-1's
    * lines + the new batch files' stats, so a STREAMING table keeps
    * its data-skipping property at O(batch) stats work per commit.
    * Requires the prior epoch to carry a sidecar (or be absent). */
  def publishAppendWithStats(df: DataFrame, root: String, epoch: Int,
                             statsCol: String): Int = {
    val spark = df.sparkSession
    val n = publishAppend(df, root, epoch)
    val prior =
      if (epoch <= 1) Seq.empty[String]
      else {
        val p = new org.apache.hadoop.fs.Path(s"$root/stats-${epoch - 1}")
        val in = fs(spark, p).open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      }
    writeSidecar(spark, root, epoch,
      prior ++ epochStatsLines(df, root, epoch, statsCol))
    n
  }

  /** Compact the CURRENT epoch into a new one — the "rewrite data
    * files" maintenance op that closes the manifest lifecycle: an
    * append-committed stream leaves one file set per batch; this
    * reads the committed view, rewrites it range-clustered into
    * `numFiles` files, and publishes the rewrite as epoch cur+1 WITH
    * fresh zone maps. Readers never see an intermediate state (the
    * pointer flips atomically, old epochs stay pinned for travel
    * until `vacuum` reclaims them — which also deletes the
    * now-unreferenced pre-compaction files). Returns the new epoch. */
  def compact(spark: SparkSession, root: String, statsCol: String,
              numFiles: Int = 4): Int = {
    import org.apache.spark.sql.functions.col
    val cur = currentEpoch(spark, root)
    val next = cur + 1
    publishWithStats(
      read(spark, root)
        .repartitionByRange(numFiles, col(statsCol))
        .sortWithinPartitions(statsCol),
      root, next, statsCol)
    next
  }

  /** Range read through the zone maps: scan ONLY files whose
    * [lo, hi] overlaps [from, to]. Returns the pruned frame and the
    * (selected, total) file counts as evidence. */
  def readRangePruned(spark: SparkSession, root: String, from: Long,
                      to: Long, epoch: Int = -1): (DataFrame, Int, Int) = {
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    val p = new org.apache.hadoop.fs.Path(s"$root/stats-$e")
    val in = fs(spark, p).open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    val all = lines.map { l =>
      val Array(name, lo, hi) = l.split('|')
      (name, lo.toLong, hi.toLong)
    }
    val hit = all.filter { case (_, lo, hi) => hi >= from && lo <= to }
    val files =
      if (hit.isEmpty) Seq(s"$root/data-epoch=$e") // empty-range guard
      else hit.map { case (name, _, _) => s"$root/$name" }
    val df = spark.read.parquet(files: _*)
    (df, hit.size, all.size)
  }

  /** The epoch the table currently publishes. */
  def currentEpoch(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$root/MANIFEST")
    val in = fs(spark, p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next().trim.toInt
    finally in.close()
  }

  /** Manifest-resolved file list of `epoch` (absolute paths). */
  def manifestFiles(spark: SparkSession, root: String, epoch: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/manifest-$epoch")
    val in = fs(spark, p).open(p)
    val names =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    names.map(n => s"$root/$n")
  }

  /** Read the table AS PUBLISHED: only manifest-listed files — orphans
    * and unpublished epochs are invisible. Pass `epoch` to time-travel
    * to a pinned manifest. */
  def read(spark: SparkSession, root: String, epoch: Int = -1): DataFrame = {
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    spark.read.parquet(manifestFiles(spark, root, e): _*)
  }

  /** Retention sweep — the vacuum discipline of the dedup epoch chain
    * / artifact cache applied to table epochs: keep the newest `keep`
    * published epochs (the CURRENT epoch is always kept), drop older
    * manifests + their now-unreferenced data files, and sweep orphans
    * (crashed-writer strays referenced by NO surviving manifest).
    * Time travel remains available across exactly the kept epochs.
    * @return (droppedEpochs, keptEpochs), each sorted. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): (Seq[Int], Seq[Int]) = {
    require(keep >= 1, "must keep at least the current epoch")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val cur = currentEpoch(spark, root)
    val epochs = f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toInt)
      .sorted
    // newest `keep`, plus the current epoch unconditionally
    val kept = (epochs.takeRight(keep) :+ cur).distinct.sorted
    val dropped = epochs.filterNot(kept.contains)
    val keptFiles = kept
      .flatMap(e => manifestFiles(spark, root, e))
      .map(new org.apache.hadoop.fs.Path(_).toUri.getPath)
      .toSet
    dropped.foreach { e =>
      manifestFiles(spark, root, e)
        .map(p => new org.apache.hadoop.fs.Path(p))
        .filterNot(p => keptFiles.contains(p.toUri.getPath))
        .foreach(p => f.delete(p, false))
      f.delete(new org.apache.hadoop.fs.Path(rootPath, s"manifest-$e"), false)
    }
    // orphan sweep: data files no surviving manifest references
    orphanFiles(spark, root).foreach(p =>
      f.delete(new org.apache.hadoop.fs.Path(p), false))
    (dropped, kept)
  }

  /** Files under the table root that NO manifest references — the
    * candidates a retention sweep deletes (crashed writers, replaced
    * epochs). Listing only; deletion policy is the caller's. */
  def orphanFiles(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val referenced = f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .flatMap(m => manifestFiles(spark, root,
        m.stripPrefix("manifest-").toInt))
      .map(new org.apache.hadoop.fs.Path(_).toUri.getPath)
      .toSet
    val it = f.listFiles(rootPath, true)
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && name.endsWith(".parquet"))
        all += s.getPath.toUri.getPath
    }
    all.toSeq.filterNot(referenced).sorted
  }
}
