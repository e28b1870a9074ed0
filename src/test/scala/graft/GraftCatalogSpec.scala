package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, GraftTable}
import graft.sink.ManifestSink

/** The DSv2 SQL catalog over manifest tables: planning-time skipping
  * through SQL predicates, column pruning into the V2 scan, VERSION AS
  * OF, atomic INSERT epochs, CoW DELETE lowering + refusals, and the
  * warehouse-rooted DDL surface. */
class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def mkTable(prefix: String, n: Int = 200): String = {
    ensureCatalog()
    val root = tmpDir(prefix) + "/t"
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("event_id") < n)
      .repartitionByRange(8, col("event_id"))
      .sortWithinPartitions("event_id")
      .createOrReplaceTempView("cat_spec_src")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM cat_spec_src")
    root
  }

  test("SQL range predicate prunes the planned file list; unfiltered reads all") {
    val root = mkTable("gcat_skip_")
    val total = ManifestSink.manifestFiles(spark, root, 1).size
    assert(total > 1, "fixture must split across files for skipping to show")

    spark.sql(s"SELECT * FROM graft.`$root` WHERE event_id BETWEEN 10 AND 29").collect()
    val planned = GraftTable.lastPlannedFiles
    assert(planned >= 1 && planned < total, s"expected pruning: $planned of $total")

    spark.sql(s"SELECT * FROM graft.`$root`").collect()
    assert(GraftTable.lastPlannedFiles == total)
  }

  test("impossible predicate plans ZERO files and returns empty, schema intact") {
    val root = mkTable("gcat_zero_")
    val out = spark.sql(s"SELECT * FROM graft.`$root` WHERE event_id = -5")
    assert(out.collect().isEmpty)
    assert(GraftTable.lastPlannedFiles == 0)
    assert(out.schema.fieldNames.toSeq == Seq("event_id", "user_id", "value"))
  }

  test("skipping is advisory: catalog read equals ManifestSink.read under any filter") {
    val root = mkTable("gcat_par_")
    val viaSql = spark.sql(
      s"SELECT event_id, user_id FROM graft.`$root` WHERE event_id >= 150")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaApi = ManifestSink.read(spark, root)
      .filter(col("event_id") >= 150)
      .select("event_id", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("column pruning reaches the V2 scan's read schema") {
    val root = mkTable("gcat_prune_")
    val df = spark.sql(s"SELECT user_id FROM graft.`$root`")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("user_id")), s"read schema not pruned: $scans")
  }

  test("INSERT INTO appends an atomic stats-carrying epoch; pruning persists") {
    val root = mkTable("gcat_ins_")
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("event_id").between(200, 399))
      .repartitionByRange(4, col("event_id"))
      .sortWithinPartitions("event_id")
      .createOrReplaceTempView("cat_spec_ins")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM cat_spec_ins")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    val n = spark.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .collect()(0).getLong(0)
    assert(n == 400)
    // the appended epoch's files carry zone maps too: a range inside
    // the appended half still prunes
    val total = ManifestSink.manifestFiles(spark, root, 2).size
    spark.sql(s"SELECT * FROM graft.`$root` WHERE event_id BETWEEN 250 AND 269").collect()
    assert(GraftTable.lastPlannedFiles < total)
  }

  test("INSERT OVERWRITE commits a fresh snapshot epoch; history survives") {
    val root = mkTable("gcat_ovr_", n = 50)
    spark.sql(s"INSERT OVERWRITE graft.`$root` " +
      "SELECT event_id + 500 AS event_id, user_id, value FROM cat_spec_src")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    val mins = spark.sql(s"SELECT min(event_id) AS m FROM graft.`$root`")
      .collect()(0).getLong(0)
    assert(mins >= 500)
    val old = spark.sql(s"SELECT max(event_id) AS m FROM graft.`$root` VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(old < 500)
  }

  test("VERSION AS OF pins reads; writes to a pinned table are refused") {
    val root = mkTable("gcat_trav_", n = 50)
    spark.sql(s"INSERT INTO graft.`$root` " +
      "SELECT event_id + 1000 AS event_id, user_id, value FROM cat_spec_src")
    val v1 = spark.sql(s"SELECT count(*) AS c FROM graft.`$root` VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(v1 == 50)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VERSION AS OF 1 SELECT * FROM cat_spec_src")
    }
    assert(e.getMessage != null)
  }

  test("DELETE WHERE key IN (...) lowers onto CoW: bounded rewrite, audit epoch pinned") {
    val root = mkTable("gcat_del_")
    val filesBefore = ManifestSink.manifestFiles(spark, root, 1)
    spark.sql(s"DELETE FROM graft.`$root` WHERE event_id IN (3, 77)")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    val after = spark.sql(
      s"SELECT count(*) AS c FROM graft.`$root` WHERE event_id IN (3, 77)")
      .collect()(0).getLong(0)
    assert(after == 0)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .collect()(0).getLong(0) == 198)
    // bounded rewrite: untouched files carry by name into epoch 2
    val filesAfter = ManifestSink.manifestFiles(spark, root, 2)
    val carried = filesAfter.map(f => f.split("/").last)
      .intersect(filesBefore.map(f => f.split("/").last))
    assert(carried.nonEmpty, "CoW delete should carry untouched files")
    // audit: the pre-delete epoch still answers
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$root` VERSION AS OF 1 " +
        "WHERE event_id IN (3, 77)").collect()(0).getLong(0) == 2)
  }

  test("DELETE with an unsupported predicate shape is refused, not mis-applied") {
    val root = mkTable("gcat_delrange_", n = 50)
    // range deletes don't lower (only point/IN); Spark surfaces the
    // unsupported delete instead of silently doing nothing
    val e = intercept[AnalysisException] {
      spark.sql(s"DELETE FROM graft.`$root` WHERE event_id < 10")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .collect()(0).getLong(0) == 50)
  }

  test("warehouse-rooted DDL: CREATE/SHOW/RENAME/DROP against a root catalog") {
    val wh = tmpDir("gcat_wh_")
    spark.conf.set("spark.sql.catalog.graft_wh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_wh.root", wh)
    spark.sql("CREATE TABLE graft_wh.t1 (id BIGINT, name STRING)")
    // a created-but-empty table answers its declared schema
    assert(spark.table("graft_wh.t1").schema.fieldNames.toSeq == Seq("id", "name"))
    intercept[TableAlreadyExistsException] {
      spark.sql("CREATE TABLE graft_wh.t1 (id BIGINT)")
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").createOrReplaceTempView("wh_src")
    spark.sql("INSERT INTO graft_wh.t1 SELECT * FROM wh_src")
    assert(spark.sql("SELECT count(*) AS c FROM graft_wh.t1").collect()(0).getLong(0) == 2)
    val listed = spark.sql("SHOW TABLES IN graft_wh").collect().map(_.getString(1)).toSet
    assert(listed.contains("t1"))
    spark.sql("ALTER TABLE graft_wh.t1 RENAME TO t2")
    assert(spark.sql("SELECT count(*) AS c FROM graft_wh.t2").collect()(0).getLong(0) == 2)
    spark.sql("DROP TABLE graft_wh.t2")
    // the analyzer wraps the catalog's NoSuchTableException into
    // TABLE_OR_VIEW_NOT_FOUND
    intercept[AnalysisException] {
      spark.table("graft_wh.t2").collect()
    }
  }

  test("catalog scan refuses a merge-on-read DV epoch rather than resurrecting deletes") {
    ensureCatalog()
    val root = tmpDir("gcat_mor_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("event_id") < 60)
    ManifestSink.publishWithStats(
      ev.repartitionByRange(4, col("event_id")).sortWithinPartitions("event_id"),
      root, 1, Seq("event_id"))
    ManifestSink.deleteMor(spark, root,
      ev.filter(col("event_id") < 5).select(col("event_id")), "event_id")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root`").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("delete")), s"got: ${chain(e)}")
  }
}
