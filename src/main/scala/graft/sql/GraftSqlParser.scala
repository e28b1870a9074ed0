package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

import graft.sink.ManifestSink

/** SQL MAINTENANCE COMMANDS for manifest tables — the Delta-style
  * parser extension: a delegating [[ParserInterface]] that recognizes
  * three statements the Spark grammar doesn't have and hands
  * everything else to the built-in parser unchanged:
  *
  * {{{
  *   VACUUM graft.`/path/t` [RETAIN <n> EPOCHS]
  *   OPTIMIZE graft.`/path/t` [CLUSTER BY (c1[, c2...])] [FILES <n>]
  *   DESCRIBE HISTORY graft.`/path/t`
  * }}}
  *
  * Each parses to a [[LeafRunnableCommand]] (driver-side metadata
  * work + at most one clustering rewrite job), so the ops surface of
  * the lakehouse — retention, compaction, audit — is SQL text like
  * everything else. Activate with `.withExtensions(new
  * GraftExtensions)` (injected alongside the custom functions).
  *
  * The table reference accepts `graft.`-prefixed backquoted paths
  * (the catalog spelling), bare backquoted paths, or single-quoted
  * paths. Statements are recognized ONLY by their leading keyword
  * (VACUUM / OPTIMIZE / DESCRIBE HISTORY) — no other SQL text is
  * intercepted, and a malformed maintenance statement raises a clear
  * error rather than falling through to the Spark parser's
  * unrelated-message failure.
  *
  * Reference: the reference's ops surface is shell scripts polling
  * compaction state and forcing flushes (`monitoring/
  * compaction_monitor.sh`, `cassandra_auto_flush.sh`) — maintenance
  * as first-class commands against the stored tables; this is the
  * SQL-native spelling of that contract. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // graft.`/path` | `/path` | '/path'
  private val Tbl = "(?:graft\\s*\\.\\s*)?(?:`([^`]+)`|'([^']+)')"
  private def pathOf(m: scala.util.matching.Regex.Match, g1: Int, g2: Int): String =
    Option(m.group(g1)).getOrElse(m.group(g2))

  private val VacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + Tbl + "(?:\\s+RETAIN\\s+(\\d+)\\s+EPOCHS)?\\s*;?\\s*$").r
  private val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + Tbl +
      "(?:\\s+(CLUSTER|ZORDER)\\s+BY\\s*\\(([^)]+)\\))?(?:\\s+FILES\\s+(\\d+))?\\s*;?\\s*$").r
  private val HistoryRe =
    ("(?is)^\\s*DESCRIBE\\s+HISTORY\\s+" + Tbl + "\\s*;?\\s*$").r
  private val ChangesRe =
    ("(?is)^\\s*DESCRIBE\\s+CHANGES\\s+" + Tbl +
      "\\s+KEY\\s+(\\w+)\\s+FROM\\s+(\\d+)\\s+TO\\s+(\\d+)\\s*;?\\s*$").r
  private val LeadRe =
    "(?is)^\\s*(VACUUM|OPTIMIZE|DESCRIBE\\s+HISTORY|DESCRIBE\\s+CHANGES)\\b.*".r

  private[sql] def parseMaintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case VacuumRe(bq, q, retain) =>
        Some(VacuumCommand(Option(bq).getOrElse(q),
          Option(retain).map(_.toInt).getOrElse(2)))
      case OptimizeRe(bq, q, kind, cols, files) =>
        Some(OptimizeCommand(Option(bq).getOrElse(q),
          Option(cols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
          Option(files).map(_.toInt).getOrElse(4),
          zorder = Option(kind).exists(_.equalsIgnoreCase("ZORDER"))))
      case HistoryRe(bq, q) =>
        Some(HistoryCommand(Option(bq).getOrElse(q)))
      case ChangesRe(bq, q, key, from, to) =>
        Some(ChangesCommand(Option(bq).getOrElse(q), key, from.toInt, to.toInt))
      case LeadRe(kw) => throw new IllegalArgumentException(
        s"malformed graft maintenance statement (keyword ${kw.toUpperCase}): " +
          s"$sqlText\nexpected: VACUUM <tbl> [RETAIN n EPOCHS] | OPTIMIZE <tbl> " +
          "[CLUSTER BY (cols) | ZORDER BY (c1, c2)] [FILES n] | DESCRIBE " +
          "HISTORY <tbl> | DESCRIBE CHANGES <tbl> KEY <col> FROM <e1> TO <e2> " +
          "where <tbl> = graft.`/path` | `/path` | '/path'")
      case _ => None
    }

  private def attr(n: String, t: org.apache.spark.sql.types.DataType): Attribute =
    AttributeReference(n, t, nullable = true)()

  /** `VACUUM` — the retention sweep as a command: keep the newest
    * `retain` epochs, reclaim dropped epochs' files + losing-attempt
    * and orphan debris (all bounded to at-or-below the current epoch;
    * see [[ManifestSink.vacuum]]). */
  final case class VacuumCommand(path: String, retain: Int)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("path", StringType), attr("dropped_epochs", IntegerType),
      attr("kept_epochs", IntegerType))
    override def run(spark: SparkSession): Seq[Row] = {
      val (dropped, kept) = ManifestSink.vacuum(spark, path, retain)
      Seq(Row(path, dropped.size, kept.size))
    }
  }

  /** `OPTIMIZE` — compaction as a command: rewrite the current epoch
    * range-clustered on the first cluster column into `files` files,
    * with fresh zone maps for every cluster column (defaults to the
    * table's existing stats columns, so pruning always survives the
    * rewrite). `ZORDER BY (c1, c2)` lays the rewrite out on the Morton
    * interleave of the two (integral) columns instead, so each file's
    * zone maps become a tight RECTANGLE — slab predicates on EITHER
    * column prune the file list (the multi-dimensional clustering
    * range order cannot give). */
  final case class OptimizeCommand(path: String, clusterBy: Option[Seq[String]],
                                   files: Int, zorder: Boolean = false)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("path", StringType), attr("new_epoch", IntegerType),
      attr("files_before", IntegerType), attr("files_after", IntegerType))
    override def run(spark: SparkSession): Seq[Row] = {
      val cur = ManifestSink.currentEpoch(spark, path)
      val before = ManifestSink.manifestFiles(spark, path, cur).size
      val existing = ManifestSink.statsTable(spark, path, cur)
        .select("col").distinct().collect().map(_.getString(0))
        .filterNot(_.startsWith("__")).sorted.toSeq
      val next =
        if (zorder) {
          import org.apache.spark.sql.functions.{col, lit, max, min}
          import org.apache.spark.sql.types.LongType
          val zcols = clusterBy.getOrElse(throw new IllegalArgumentException(
            "OPTIMIZE ... ZORDER BY needs exactly two columns"))
          require(zcols.length == 2,
            s"ZORDER BY takes exactly two integral columns; got $zcols")
          val df = ManifestSink.read(spark, path)
          val Seq(a, b) = zcols
          val bounds = df.agg(min(col(a)).cast(LongType), max(col(a)).cast(LongType),
            min(col(b)).cast(LongType), max(col(b)).cast(LongType)).collect().head
          def scale(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
            if (hi == lo) lit(0L)
            else (c.cast(LongType) - lit(lo)) * 255L / lit(hi - lo)
          val laid = df.withColumn("__z", graft.functions.VectorFns.zorder2(
              scale(col(a), bounds.getLong(0), bounds.getLong(1)).cast(LongType),
              scale(col(b), bounds.getLong(2), bounds.getLong(3)).cast(LongType)))
            .repartitionByRange(files, col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
          val n = cur + 1
          ManifestSink.publishWithStats(laid, path, n,
            (zcols ++ existing).distinct)
          n
        } else {
          val cols = clusterBy.getOrElse {
            require(existing.nonEmpty,
              s"OPTIMIZE $path: no stats columns committed and no CLUSTER BY given")
            existing
          }
          ManifestSink.compact(spark, path, cols, files)
        }
      val after = ManifestSink.manifestFiles(spark, path, next).size
      Seq(Row(path, next, before, after))
    }
  }

  /** `DESCRIBE CHANGES` — the change data feed as a command
    * (Delta's `table_changes`): row-level insert/delete/update-pair
    * changes of epochs (from, to], computed from the manifest delta
    * (see [[ManifestSink.tableChanges]] — only removed/added files of
    * each epoch are read). Output = the table's columns plus
    * `_change_type` and `_commit_epoch`. */
  final case class ChangesCommand(path: String, keyCol: String,
                                  fromEpoch: Int, toEpoch: Int)
    extends LeafRunnableCommand {
    override lazy val output: Seq[Attribute] = {
      val spark = SparkSession.active
      val base = ManifestSink.commitSchema(spark, path,
        ManifestSink.currentEpoch(spark, path))
        .getOrElse(ManifestSink.read(spark, path).schema)
      base.fields.toSeq.map(f => attr(f.name, f.dataType)) ++ Seq(
        attr("_change_type", StringType), attr("_commit_epoch", IntegerType))
    }
    override def run(spark: SparkSession): Seq[Row] =
      ManifestSink.tableChanges(spark, path, keyCol, fromEpoch, toEpoch)
        .collect().toSeq
  }

  /** `DESCRIBE HISTORY` — the commit audit log (one row per live
    * epoch, metadata-only; see [[ManifestSink.history]]). */
  final case class HistoryCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("epoch", IntegerType), attr("token", StringType),
      attr("txn_app_id", StringType), attr("txn_version", LongType),
      attr("n_files", IntegerType))
    override def run(spark: SparkSession): Seq[Row] =
      ManifestSink.history(spark, path).collect().toSeq
  }
}
