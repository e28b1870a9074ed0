package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sink.{ManifestSink, SnapshotCache}

/** METADATA TABLES — the Iceberg inspection surface (`db.t.files` /
  * `db.t.partitions` / `db.t.history`), spelled with the same
  * `@`-suffix convention as `@changes`:
  *
  * {{{
  *   SELECT * FROM graft.`/p@files`        -- current epoch's data files
  *   SELECT * FROM graft.`/p@files:3`      -- pinned to epoch 3
  *   SELECT * FROM graft.`/p@partitions`   -- per layout-partition rollup
  *   SELECT * FROM graft.`/p@history`      -- one row per live epoch
  * }}}
  *
  * All three are METADATA-ONLY: rows come from the snapshot-cached
  * manifest and stats tables (plus, for `@history`, the commit
  * markers) — zero data-file opens, served as a driver
  * [[org.apache.spark.sql.connector.read.LocalScan]]. The manifest is
  * already a driver-side artifact in this engine (SnapshotCache), so
  * the inspection surface costs exactly what planning a scan costs:
  * O(manifest entries), bounded and cached. Composable under any
  * SELECT — the operational questions of a 100 TB table ("how many
  * files per day partition", "is compaction due", "which epoch grew
  * the table") become one-liners instead of engine-internal API
  * calls.
  *
  * `partition` is the file's committed layout value — the bucket id
  * under `bucket(n, col)`, the time ordinal under
  * `hours/days/months/years(col)`, null for unpartitioned tables
  * (a `@partitions` read of an unpartitioned table returns its one
  * whole-table rollup row). `row_count` is the file's committed
  * `__count` zone-map row — PHYSICAL rows, before any delete-vector
  * filtering, exactly as Iceberg's `files` table reports (null for
  * files committed without stats).
  *
  * Reference: the reference operates its pipeline with shell probes
  * over Cassandra internals (`monitoring/monitor.sh:83-84`,
  * `cassandra_latency_check.py:13`); this is the Spark-native
  * spelling of that operational surface — committed metadata,
  * queryable as tables. */
final class GraftMetaTable(dir: String, ident: String, kind: String,
                           epochSpec: Option[Int])
  extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = ident

  override def schema(): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = true),
      StructField("commit_epoch", IntegerType, nullable = false),
      StructField("partition", LongType, nullable = true)))
    case "partitions" => StructType(Seq(
      StructField("partition", LongType, nullable = true),
      StructField("n_files", LongType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = true)))
    case "history" => StructType(Seq(
      StructField("epoch", IntegerType, nullable = false),
      StructField("token", StringType, nullable = false),
      StructField("txn_app_id", StringType, nullable = true),
      StructField("txn_version", LongType, nullable = true),
      StructField("n_files", IntegerType, nullable = false)))
    case "tags" => StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("epoch", IntegerType, nullable = false)))
    case "wap" => StructType(Seq(
      StructField("wap_id", StringType, nullable = false),
      StructField("staged_epoch", IntegerType, nullable = false),
      StructField("token", StringType, nullable = false)))
    case "branches" => StructType(Seq(
      StructField("branch", StringType, nullable = false),
      StructField("base_epoch", IntegerType, nullable = false),
      StructField("staged_epoch", IntegerType, nullable = false),
      StructField("token", StringType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown graft metadata table kind: $other")
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val sch = schema()
    val metaRows = GraftMetaTable.rowsOf(spark, dir, kind, epochSpec)
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = sch
        override def rows(): Array[InternalRow] = metaRows
        override def description(): String = s"GraftMetaScan($ident)"
      }
    }
  }
}

object GraftMetaTable {

  /** The `@` kinds this object serves (`@changes` routes elsewhere). */
  val Kinds: Seq[String] = Seq("files", "partitions", "history", "tags",
    "wap", "branches")

  /** Parse `<base>@<kind>[:<epoch>]` → (base, kind, epochSpec). */
  def parseIdent(name: String): (String, String, Option[Int]) = {
    val at = name.lastIndexOf('@')
    require(at > 0, s"not a metadata-table identifier: $name")
    val (base, suffix) = (name.substring(0, at), name.substring(at + 1))
    suffix.split(":", 2) match {
      case Array(kind) if Kinds.contains(kind) => (base, kind, None)
      case Array(kind, e) if Kinds.contains(kind) =>
        val epoch = e.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"metadata-table epoch pin must be an integer: @$kind:$e"))
        (base, kind, Some(epoch))
      case _ => throw new IllegalArgumentException(
        s"unknown metadata table @$suffix (want @files[:<epoch>] | " +
          "@partitions[:<epoch>] | @history)")
    }
  }

  /** Per-file layout value of `epoch`: bucket id or time ordinal,
    * None per file when the epoch carries no fully-covering layout. */
  def partitionOf(spark: SparkSession, dir: String,
                          epoch: Int): Map[String, Long] =
    ManifestSink.bucketSpec(spark, dir, epoch) match {
      case Some(bs) => bs.fileBuckets.map { case (f, b) => f -> b.toLong }
      case None => ManifestSink.ptimeSpec(spark, dir, epoch) match {
        case Some(ts) => ts.fileOrds.map { case (f, o) => f -> o.toLong }
        case None => ManifestSink.identSpec(spark, dir, epoch) match {
          // integral identity/truncate values fit the long slot;
          // string-valued layouts stay unsurfaced here (the column is
          // LongType by contract)
          case Some(is) if !is.isString => is.fileLongs
          case _ => Map.empty
        }
      }
    }

  /** Committed `__count` rows of `epoch`, keyed by rel path. */
  private def countsOf(spark: SparkSession, dir: String,
                       epoch: Int): Map[String, Long] = {
    val rows =
      try SnapshotCache.statRows(spark, dir, epoch).getOrElse(Array.empty)
      catch { case _: Throwable => Array.empty[org.apache.spark.sql.Row] }
    rows.filter(r => r.getString(1) == "__count" && !r.isNullAt(2))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  private[catalog] def rowsOf(spark: SparkSession, dir: String, kind: String,
                              epochSpec: Option[Int]): Array[InternalRow] = {
    def resolved: Int = epochSpec.getOrElse(
      ManifestSink.currentEpoch(spark, dir))
    kind match {
      case "files" =>
        val e = resolved
        val parts = partitionOf(spark, dir, e)
        val counts = countsOf(spark, dir, e)
        ManifestSink.manifestEntries3(spark, dir, e).sortBy(_._1).map {
          case (rel, size, fe) =>
            InternalRow(UTF8String.fromString(rel), size,
              counts.get(rel).map(Long.box).orNull,
              if (fe >= 0) fe else e,
              parts.get(rel).map(Long.box).orNull)
        }.toArray
      case "partitions" =>
        val e = resolved
        val parts = partitionOf(spark, dir, e)
        val counts = countsOf(spark, dir, e)
        val entries = ManifestSink.manifestEntries3(spark, dir, e)
        entries.groupBy { case (rel, _, _) => parts.get(rel) }
          .toSeq.sortBy(_._1.getOrElse(Long.MinValue))
          .map { case (part, fs) =>
            // a partition's row_count is exact only when EVERY file
            // carries a committed __count; a single stats-less file
            // makes it null rather than an undercount
            val rc =
              if (fs.forall { case (rel, _, _) => counts.contains(rel) })
                Long.box(fs.map { case (rel, _, _) => counts(rel) }.sum)
              else null
            InternalRow(part.map(Long.box).orNull, fs.size.toLong,
              fs.map { case (_, s, _) => math.max(s, 0L) }.sum, rc)
          }.toArray
      case "history" =>
        require(epochSpec.isEmpty, "@history lists all live epochs; " +
          "pin with @files:<epoch> / @partitions:<epoch> instead")
        ManifestSink.history(spark, dir).collect().map { r =>
          InternalRow(r.getInt(0), UTF8String.fromString(r.getString(1)),
            if (r.isNullAt(2)) null else UTF8String.fromString(r.getString(2)),
            if (r.isNullAt(3)) null else Long.box(r.getLong(3)),
            r.getInt(4))
        }
      case "tags" =>
        require(epochSpec.isEmpty, "@tags lists all tags; it takes no pin")
        ManifestSink.readTags(spark, dir).toSeq.sortBy(_._1).map {
          case (n, e) => InternalRow(UTF8String.fromString(n), e)
        }.toArray
      case "wap" =>
        // bare `@wap` = the PENDING-STAGE listing (the ops view of
        // write-audit-publish); `@wap:<id>` routes to the audit table
        require(epochSpec.isEmpty, "@wap lists pending stages; audit " +
          "one with @wap:<id>")
        ManifestSink.liveWapStages(spark, dir).map { case (id, e, t) =>
          InternalRow(UTF8String.fromString(id), e, UTF8String.fromString(t))
        }.toArray
      case "branches" =>
        // the writable-ref listing (the ops view of branch refs);
        // audit one's staged increment with @branch:<name>
        require(epochSpec.isEmpty, "@branches lists live branches; " +
          "audit one with @branch:<name>")
        ManifestSink.liveBranchStages(spark, dir).map { case (n, e, t, b) =>
          InternalRow(UTF8String.fromString(n), b, e, UTF8String.fromString(t))
        }.toArray
      case other => throw new IllegalArgumentException(
        s"unknown graft metadata table kind: $other")
    }
  }
}

/** The `@wap:<id>` AUDIT TABLE — read the staged increment of a
  * write-audit-publish INSERT before publishing it: exactly the fresh
  * files the stage wrote (real parquet under the table root's
  * attempt-unique dir, invisible to every ordinary read until
  * `PUBLISH WAP`), served as ordinary distributed parquet partitions.
  * This is the "audit" leg of Iceberg's WAP discipline: data-quality
  * queries run against `graft.`/p@wap:<id>`` (counts, constraint
  * probes, joins against the live table), then the write publishes or
  * drops. */
final class GraftWapTable(dir: String, ident: String, wapId: String,
                          branch: Boolean = false)
  extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  private def staged: ManifestSink.Staged =
    (if (branch) GraftTable.branchStaged(spark, dir, wapId).map(_._1)
     else GraftTable.wapStaged(spark, dir, wapId).map(_._1)).getOrElse(
      throw new IllegalArgumentException(
        s"no staged ${if (branch) "branch" else "WAP write"} '$wapId' on $dir"))

  override def name(): String = ident

  override def schema(): StructType =
    staged.schemaJson.map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(ManifestSink.read(spark, dir).schema)

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val st = staged
    val sch = schema()
    val freshMark = s"-a${st.token}/"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val freshRels = st.relFiles.filter(_.contains(freshMark))
    val statuses = freshRels
      .map(r => fsys.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$r")))
    // branch-staged DELETE vectors (token-named — base DVs carry other
    // tokens and scope only base files, which this audit never reads):
    // the NET increment is fresh rows MINUS the staged takedowns,
    // applied reader-side exactly like the live table's MoR scan.
    // Branch inserts always precede branch deletes (insertImpl refuses
    // the other ordering), so every staged delete DV applies to every
    // fresh file — one scope group, no per-file scoping needed here.
    // UPDATE-class vectors (`dv-N.u.*`) are EXCLUDED: a branch update
    // rewrites its keys' branch-file copies at stage time, so its
    // vector targets only base/racer copies — applying it here would
    // wrongly hide the update's own replacement rows.
    val branchDvs = st.dvs.filter(d =>
      d._1.endsWith(s".${st.token}") && !d._1.contains(".u."))
    new ScanBuilder {
      override def build(): Scan = {
        // column-mapped tables: the staged files hold PHYSICAL names —
        // read them physically and present the LOGICAL schema (a
        // positional rename; rows need no translation)
        val phys = graft.sink.ColumnMapping.physicalSchema(sch)
        val mapped = graft.sink.ColumnMapping.hasMapping(sch)
        val raw =
          org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
            spark,
            spark.sessionState.newHadoopConfWithOptions(Map.empty),
            new graft.sink.StaticFileIndex(spark,
              new org.apache.hadoop.fs.Path(dir), statuses),
            dataSchema = phys,
            readDataSchema = phys,
            readPartitionSchema = StructType(Nil),
            pushedFilters = Array.empty,
            options = CaseInsensitiveStringMap.empty())
        if (branchDvs.isEmpty && !mapped) raw
        else if (branchDvs.isEmpty) new Scan {
          override def readSchema(): StructType = sch
          override def description(): String =
            s"GraftWapMappedScan($dir@${st.token})"
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            raw.toBatch
        }
        else new Scan {
          override def readSchema(): StructType = sch
          override def description(): String =
            s"GraftBranchNetScan($dir@${st.token}, ${branchDvs.size} DVs)"
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            new org.apache.spark.sql.connector.read.Batch {
              private val inner = raw.toBatch
              override def planInputPartitions()
                  : Array[org.apache.spark.sql.connector.read.InputPartition] =
                inner.planInputPartitions()
              override def createReaderFactory()
                  : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
                val keyCol = branchDvs.head._2
                val keyIdx = sch.fieldNames.indexOf(keyCol)
                require(keyIdx >= 0,
                  s"branch DV key $keyCol not in ${sch.simpleString}")
                val keyType = sch(keyCol).dataType
                val keyVals = branchDvs.flatMap { case (rel, _) =>
                  spark.read.parquet(s"$dir/$rel").collect().map(_.get(0))
                }
                val (longs, strs) = keyType match {
                  case org.apache.spark.sql.types.StringType =>
                    (Array.empty[Long],
                      keyVals.map(_.asInstanceOf[String]).toArray)
                  case _ =>
                    (keyVals.map {
                      case l: Long => l
                      case i: Int => i.toLong
                      case sh: Short => sh.toLong
                      case b: Byte => b.toLong
                      case other => throw new IllegalStateException(
                        s"unsupported branch DV key value $other")
                    }.toArray, Array.empty[String])
                }
                new DvFilteringReaderFactory(inner.createReaderFactory(),
                  keyIdx, keyType,
                  Array(longs, Array.empty[Long]),
                  Array(strs, Array.empty[String]),
                  freshRels.map(_ -> 0).toMap,
                  columnarOk = false, strip = false,
                  sch.fields.map(_.dataType), sch.fields.map(_.nullable))
              }
            }
        }
      }
    }
  }
}
