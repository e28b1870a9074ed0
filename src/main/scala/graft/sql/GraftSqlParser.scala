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
      "(?:\\s+CLUSTER\\s+BY\\s*\\(([^)]+)\\))?(?:\\s+FILES\\s+(\\d+))?\\s*;?\\s*$").r
  private val HistoryRe =
    ("(?is)^\\s*DESCRIBE\\s+HISTORY\\s+" + Tbl + "\\s*;?\\s*$").r
  private val LeadRe = "(?is)^\\s*(VACUUM|OPTIMIZE|DESCRIBE\\s+HISTORY)\\b.*".r

  private[sql] def parseMaintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case VacuumRe(bq, q, retain) =>
        Some(VacuumCommand(Option(bq).getOrElse(q),
          Option(retain).map(_.toInt).getOrElse(2)))
      case OptimizeRe(bq, q, cols, files) =>
        Some(OptimizeCommand(Option(bq).getOrElse(q),
          Option(cols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
          Option(files).map(_.toInt).getOrElse(4)))
      case HistoryRe(bq, q) =>
        Some(HistoryCommand(Option(bq).getOrElse(q)))
      case LeadRe(kw) => throw new IllegalArgumentException(
        s"malformed graft maintenance statement (keyword ${kw.toUpperCase}): " +
          s"$sqlText\nexpected: VACUUM <tbl> [RETAIN n EPOCHS] | OPTIMIZE <tbl> " +
          "[CLUSTER BY (cols)] [FILES n] | DESCRIBE HISTORY <tbl> " +
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
    * rewrite). */
  final case class OptimizeCommand(path: String, clusterBy: Option[Seq[String]],
                                   files: Int) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("path", StringType), attr("new_epoch", IntegerType),
      attr("files_before", IntegerType), attr("files_after", IntegerType))
    override def run(spark: SparkSession): Seq[Row] = {
      val cur = ManifestSink.currentEpoch(spark, path)
      val before = ManifestSink.manifestFiles(spark, path, cur).size
      val cols = clusterBy.getOrElse {
        val existing = ManifestSink.statsTable(spark, path, cur)
          .select("col").distinct().collect().map(_.getString(0))
          .filterNot(_.startsWith("__")).sorted.toSeq
        require(existing.nonEmpty,
          s"OPTIMIZE $path: no stats columns committed and no CLUSTER BY given")
        existing
      }
      val next = ManifestSink.compact(spark, path, cols, files)
      val after = ManifestSink.manifestFiles(spark, path, next).size
      Seq(Row(path, next, before, after))
    }
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
