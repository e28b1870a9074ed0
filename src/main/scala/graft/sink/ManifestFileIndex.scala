package graft.sink

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Zone-map data skipping INSIDE Catalyst planning — the Delta
  * TahoeFileIndex pattern: `ManifestSink.table(spark, root)` returns a
  * plain DataFrame whose scan is backed by this custom [[FileIndex]];
  * when the user writes an ordinary `.filter(col("event_id")
  * .between(...))`, Spark pushes the data filters into
  * `listFiles(partitionFilters, dataFilters)` at PLANNING time, and
  * the index answers with only the files whose committed per-column
  * (min, max) overlap the predicate. No side API, no special read
  * call — the idiomatic DataFrame program gets manifest resolution,
  * orphan invisibility, AND file skipping for free, which is the
  * Spark-first spelling of "the manifest is a coarse secondary
  * index". `readRangePruned` remains the explicit-evidence API (it
  * returns the hit counts); this is the transparent one.
  *
  * Pruning is CONSERVATIVE: only And/Or trees of simple
  * (column op literal) comparisons on stats-carrying columns prune;
  * anything unrecognized keeps the file. Long and string bounds are
  * both honored. The row-level filter still applies after the scan —
  * skipping is an I/O optimization, never a correctness dependency
  * (the same contract as parquet row-group stats one level down). */
final class ManifestFileIndex(spark: SparkSession, root: String, epoch: Int)
  extends FileIndex {

  /** FileStatuses built from MANIFEST METADATA (rel + committed size —
    * Delta's add.size): ZERO per-file RPCs at index construction. The
    * pre-size legacy fallback (size -1 in an old manifest) resolves
    * with one counted getFileStatus per unknown file — the counter is
    * the spec evidence that current-format tables never pay it.
    * mtime is 0 (unused by the parquet read path; files are
    * immutable) and blockSize a nominal 128 MB (split planning uses
    * maxPartitionBytes, not the block size, on non-HDFS stores). */
  private val statuses: Seq[FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    ManifestSink.manifestEntries(spark, root, epoch).map { case (rel, size) =>
      val p = new Path(s"$root/$rel")
      if (size >= 0) new FileStatus(size, false, 1, 134217728L, 0L, p)
      else {
        ManifestFileIndex.legacyStatusRpcs.incrementAndGet()
        p.getFileSystem(conf).getFileStatus(p)
      }
    }
  }

  private val filePaths: Seq[Path] = statuses.map(_.getPath)

  private val statRows: Array[org.apache.spark.sql.Row] =
    SnapshotCache.statRows(spark, root, epoch).getOrElse(Array.empty)

  /** relpath -> column -> (loLong, hiLong, loStr, hiStr), any null. */
  private val zoneMaps: Map[String, Map[String, (Option[Long], Option[Long],
      Option[String], Option[String])]] =
    statRows.filterNot(_.getString(1).startsWith("__"))
      .groupBy(_.getString(0))
      .map { case (file, rows) =>
        file -> rows.map { r =>
          r.getString(1) -> (
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getString(4)),
            if (r.isNullAt(5)) None else Some(r.getString(5)))
        }.toMap
      }

  /** File dictionaries (see ManifestSink.dictStats): complete per-file
    * value sets for point pruning; overflowed (file, col) pairs are
    * never pruned by the dictionary. */
  private val dictLong: Map[(String, String), Set[Long]] =
    statRows.filter(r => r.getString(1).startsWith("__dict:") && !r.isNullAt(2))
      .groupBy(r => (r.getString(0), r.getString(1).stripPrefix("__dict:")))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
  private val dictStr: Map[(String, String), Set[String]] =
    statRows.filter(r => r.getString(1).startsWith("__dict:") && !r.isNullAt(4))
      .groupBy(r => (r.getString(0), r.getString(1).stripPrefix("__dict:")))
      .map { case (k, rs) => k -> rs.map(_.getString(4)).toSet }

  /** Bucketed layouts (see ManifestSink.bucketStats): column ->
    * (numBuckets, rel -> bucket id). A point lookup on the bucket key
    * keeps only the files of floorMod(v, n)'s bucket — the
    * hash-layout point tier that needs no per-value state at all
    * (where min/max are blind and dictionaries would overflow). */
  private val bucketSpecs: Map[String, (Int, Map[String, Int])] =
    statRows.filter(r => r.getString(1).startsWith("__bucket:") && !r.isNullAt(2))
      .groupBy(_.getString(1))
      .flatMap { case (spec, rs) =>
        spec.split(":", 3) match {
          case Array(_, c, n) =>
            Some(c -> (n.toInt, rs.map(r => r.getString(0) -> r.getLong(2).toInt).toMap))
          case _ => None
        }
      }

  private def bucketMayMatch(rel: String, colName: String, v: Long): Boolean =
    bucketSpecs.get(colName).forall { case (n, fb) =>
      fb.get(rel).forall(_ == java.lang.Math.floorMod(v, n.toLong).toInt)
    }

  /** Per-file bloom filters (see ManifestSink.bloomStats): the
    * high-cardinality point tier — (rel, col) -> (m, k, hex bitmap).
    * Probed for EqualTo/In where no dictionary covers the file. */
  private val blooms: Map[(String, String), (Long, Long, String)] =
    statRows.filter(r => r.getString(1).startsWith("__bloom:") && !r.isNullAt(4))
      .groupBy(r => (r.getString(0), r.getString(1).stripPrefix("__bloom:")))
      .map { case (k, rs) =>
        k -> (rs.head.getLong(2), rs.head.getLong(3), rs.head.getString(4)) }

  /** The probe value's bit positions, cached per (value, m, k) — one
    * tiny local-plan evaluation per distinct probe, not per file. */
  private val bloomPosCache =
    scala.collection.mutable.Map.empty[(Any, Long, Long), Seq[Int]]
  private def bloomMayContain(rel: String, colName: String,
                              v: scala.Either[Long, String]): Option[Boolean] =
    blooms.get((rel, colName)).map { case (m, k, hex) =>
      val key = (v, m, k)
      val pos = bloomPosCache.getOrElseUpdate(key, {
        val probe = v match {
          case scala.Left(l)  => org.apache.spark.sql.functions.lit(l)
          case scala.Right(s) => org.apache.spark.sql.functions.lit(s)
        }
        ManifestSink.bloomProbePositions(spark, probe, m, k)
      })
      ManifestSink.bloomHexTest(hex, pos)
    }

  private def relOf(p: Path): String = ManifestSink.relOfData(p)

  /** String bound comparisons in UTF8String BINARY order — the order
    * Spark's min/max produced the committed bounds in. Java String
    * </<= is UTF-16 code-unit order, which diverges for
    * supplementary-plane code points and would wrongly prune files
    * (silent row loss) (ADVICE r11). */
  private def u8cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Conservative may-match: false ONLY when the zone map proves no
    * row of the file can satisfy `e`. */
  private def mayMatch(rel: String, e: Expression): Boolean = {
    def bounds(c: String) = zoneMaps.get(rel).flatMap(_.get(c))
    def longCmp(c: String, test: (Long, Long) => Boolean): Boolean =
      bounds(c) match {
        case Some((Some(lo), Some(hi), _, _)) => test(lo, hi)
        case _ => true
      }
    def strCmp(c: String, test: (String, String) => Boolean): Boolean =
      bounds(c) match {
        case Some((_, _, Some(lo), Some(hi))) => test(lo, hi)
        case _ => true
      }
    def lit(l: Any): Option[scala.Either[Long, String]] = l match {
      case i: Int => Some(scala.Left(i.toLong))
      case i: Long => Some(scala.Left(i))
      case i: Short => Some(scala.Left(i.toLong))
      case i: Byte => Some(scala.Left(i.toLong))
      case s: UTF8String => Some(scala.Right(s.toString))
      case s: String => Some(scala.Right(s))
      case _ => None
    }
    def cmp(col: String, v: Any,
            onLong: (Long, Long, Long) => Boolean,
            onStr: (String, String, String) => Boolean): Boolean =
      lit(v) match {
        case Some(scala.Left(l))  => longCmp(col, (lo, hi) => onLong(l, lo, hi))
        case Some(scala.Right(s)) => strCmp(col, (lo, hi) => onStr(s, lo, hi))
        case None => true
      }
    // point predicates walk the skipping ladder: the bucket layout
    // first (integral keys — a file of the wrong bucket provably
    // holds no match), then exact dictionary, then bloom probe (no
    // false negatives), then the zone bounds
    def point(colName: String, v: Any): Boolean =
      lit(v) match {
        case Some(scala.Left(l)) if !bucketMayMatch(rel, colName, l) => false
        case Some(scala.Left(l)) => dictLong.get((rel, colName)) match {
          case Some(s) => s.contains(l)
          case None => bloomMayContain(rel, colName, scala.Left(l)).getOrElse(
            longCmp(colName, (lo, hi) => lo <= l && l <= hi))
        }
        case Some(scala.Right(sv)) => dictStr.get((rel, colName)) match {
          case Some(s) => s.contains(sv)
          case None => bloomMayContain(rel, colName, scala.Right(sv)).getOrElse(
            strCmp(colName, (lo, hi) => u8cmp(lo, sv) <= 0 && u8cmp(sv, hi) <= 0))
        }
        case None => true
      }
    e match {
      case And(a, b) => mayMatch(rel, a) && mayMatch(rel, b)
      case Or(a, b)  => mayMatch(rel, a) || mayMatch(rel, b)
      case EqualTo(a: AttributeReference, Literal(v, _)) => point(a.name, v)
      case EqualTo(Literal(v, _), a: AttributeReference) => point(a.name, v)
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        cmp(a.name, v, (x, _, hi) => hi > x, (x, _, hi) => u8cmp(hi, x) > 0)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        cmp(a.name, v, (x, _, hi) => hi >= x, (x, _, hi) => u8cmp(hi, x) >= 0)
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        cmp(a.name, v, (x, lo, _) => lo < x, (x, lo, _) => u8cmp(lo, x) < 0)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        cmp(a.name, v, (x, lo, _) => lo <= x, (x, lo, _) => u8cmp(lo, x) <= 0)
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        cmp(a.name, v, (x, lo, _) => lo < x, (x, lo, _) => u8cmp(lo, x) < 0)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        cmp(a.name, v, (x, lo, _) => lo <= x, (x, lo, _) => u8cmp(lo, x) <= 0)
      case LessThan(Literal(v, _), a: AttributeReference) =>
        cmp(a.name, v, (x, _, hi) => hi > x, (x, _, hi) => u8cmp(hi, x) > 0)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        cmp(a.name, v, (x, _, hi) => hi >= x, (x, _, hi) => u8cmp(hi, x) >= 0)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, _) => point(a.name, v) }
      case _ => true
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (dataFilters.isEmpty || zoneMaps.isEmpty) statuses
      else statuses.filter(s => dataFilters.forall(f => mayMatch(relOf(s.getPath), f)))
    lastSelectedCount = selected.size
    Seq(PartitionDirectory(InternalRow.empty, selected.toArray))
  }

  /** Planning evidence for specs: files the LAST listFiles selected. */
  @volatile var lastSelectedCount: Int = -1

  override def inputFiles: Array[String] = filePaths.map(_.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def partitionSchema: StructType = StructType(Nil)
}

/** A [[FileIndex]] over an ALREADY-RESOLVED file list: no listing, no
  * per-file RPC — the statuses (path + size) came from manifest
  * metadata. This is what the catalog scan hands Spark's own
  * ParquetScan instead of an InMemoryFileIndex, which would re-list
  * every path (one RPC per file per query) just to rediscover what
  * the manifest already committed. */
final class StaticFileIndex(spark: SparkSession, root: Path,
                            statuses: Seq[FileStatus])
  extends org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex(
    spark, Map.empty, None) {
  override def rootPaths: Seq[Path] = Seq(root)
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def partitionSchema: StructType = StructType(Nil)
  override def partitionSpec(): org.apache.spark.sql.execution.datasources.PartitionSpec =
    org.apache.spark.sql.execution.datasources.PartitionSpec.emptySpec
  override protected def leafFiles:
      scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }
  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap
}

object ManifestFileIndex {

  /** Per-file getFileStatus calls taken by the LEGACY (pre-size
    * manifest) fallback — zero for any table committed since sizes
    * landed (spec evidence for the RPC-free planning contract). */
  val legacyStatusRpcs = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The manifest table as a PLAIN DataFrame with planning-time zone-map
    * skipping (see class doc). Pass `epoch` to time-travel. */
  def table(spark: SparkSession, root: String, epoch: Int = -1): DataFrame =
    tableWithIndex(spark, root, epoch)._1

  /** The skipping-capable HadoopFsRelation over a committed epoch —
    * shared by [[tableWithIndex]] and the batch `format()` path.
    * Column-mapped epochs are refused here (a bare BaseRelation cannot
    * carry the logical-alias projection); [[table]] applies it. */
  def relation(spark: SparkSession, root: String, epoch: Int): HadoopFsRelation = {
    val idx = new ManifestFileIndex(spark, root, epoch)
    val schema = ManifestSink.commitSchema(spark, root, epoch)
      .getOrElse(ManifestSink.read(spark, root, epoch).schema)
    require(!ColumnMapping.hasMapping(schema),
      "batch format() read of a column-mapped epoch would surface " +
        "physical names; use ManifestSink.read / ManifestFileIndex.table")
    HadoopFsRelation(idx, StructType(Nil), schema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
  }

  /** Same, also returning the index (specs read its selection count).
    * Mapped epochs plan the skipping relation under the PHYSICAL
    * schema and surface the logical names via one aliasing projection
    * — pushed filters rewrite through the aliases into the physical
    * attributes the committed stats are keyed by, so skipping still
    * bites after a rename. */
  def tableWithIndex(spark: SparkSession, root: String,
                     epoch: Int = -1): (DataFrame, ManifestFileIndex) = {
    val e = if (epoch >= 0) epoch else ManifestSink.currentEpoch(spark, root)
    val idx = new ManifestFileIndex(spark, root, e)
    val committed = ManifestSink.commitSchema(spark, root, e)
    val mapped = committed.filter(ColumnMapping.hasMapping)
    val schema = mapped.map(ColumnMapping.physicalSchema)
      .orElse(committed)
      .getOrElse(ManifestSink.read(spark, root, e).schema)
    val rel = HadoopFsRelation(idx, StructType(Nil), schema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    val base = spark.baseRelationToDataFrame(rel)
    // merge-on-read deletes apply above the skipping scan (data
    // filters still push through the join child into listFiles);
    // the DV key is physical — exactly the relation's pre-alias names.
    // DVs are EPOCH-SCOPED: when every live file predates every DV
    // (the common post-takedown window), one anti join over the key
    // union is exact; a mixed-scope table (a post-DV append exists)
    // cannot be expressed above this single relation, so the df falls
    // back to the scoped reader — the returned index still serves
    // skipping evidence, only this df's pushdown path is bypassed.
    val dvs = ManifestSink.commitDvs(spark, root, e)
    val maxFileEpoch = ManifestSink.manifestEntries3(spark, root, e)
      .map { case (_, _, fe) => math.max(fe, 0) }.maxOption.getOrElse(0)
    val allApply = dvs.forall { case (dvRel, _) =>
      "dv-(\\d+)\\..*".r.findFirstMatchIn(dvRel).forall(_.group(1).toInt > maxFileEpoch)
    }
    if (dvs.nonEmpty && !allApply) (ManifestSink.read(spark, root, e), idx)
    else {
      val withDv =
        if (dvs.isEmpty) base
        else {
          import org.apache.spark.sql.functions.{broadcast, col}
          val k = dvs.head._2
          val keys = dvs.map { case (dvRel, kc) =>
            spark.read.parquet(s"$root/$dvRel").select(col(kc).as(k))
          }.reduce(_ unionByName _)
          base.join(broadcast(keys), Seq(k), "left_anti")
        }
      val df = mapped match {
        case Some(p) => withDv.select(ColumnMapping.toLogicalCols(p): _*)
        case None => withDv
      }
      (df, idx)
    }
  }
}
