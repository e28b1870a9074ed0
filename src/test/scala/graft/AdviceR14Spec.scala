package graft

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, GraftChangesScan}
import graft.sink.ManifestSink

/** Round-14 ADVICE pins (the rebase read-set guard itself is pinned in
  * ConflictSpec):
  *
  *  - batch `@changes` stages under the TABLE ROOT (`_changes/`) —
  *    shared storage on a real cluster — never `java.io.tmpdir`; aged
  *    staging debris is reclaimed by vacuum;
  *  - the `@changes` scan prunes columns and pre-applies pushed
  *    filters at the staging write (VERDICT r14 #6);
  *  - vacuum's orphan sweep is AGE-GRACED: a fresh unreferenced file
  *    (a rebasing writer's live stage) survives the default window
  *    (also pinned from the sweep side in SinkOpsSpec);
  *  - an over-cap DELETE on a DV-carrying table routes through the
  *    row-level rewrite instead of dead-ending in deleteMor's cap. */
class AdviceR14Spec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def mkTable(prefix: String, n: Long = 100L): String = {
    val root = tmpDir(prefix) + "/t"
    (0L until n).map(i => (i, i * 2L)).toDF("k", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView(s"a14_src_$prefix")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM a14_src_$prefix")
    root
  }

  test("batch @changes stages under the table root, never java.io.tmpdir") {
    ensureCatalog()
    val root = mkTable("a14_chg_")
    spark.sql(s"INSERT INTO graft.`$root` VALUES (500, 500)")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = GraftChangesScan.stageRootOf(root)
    val tmpBefore = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().map(_.getName).toSet
    val n = spark.sql(
      s"SELECT count(*) AS c FROM graft.`$root@changes:k:1-2`")
      .head().getLong(0)
    assert(n == 1L)
    // the staged diff landed beside the table's own metadata
    assert(fs.exists(stage), s"no $stage staging dir")
    val staged = fs.listStatus(stage).toSeq
      .filter(_.getPath.getName.matches("^\\d+-\\d+\\.[0-9a-f]+$"))
    assert(staged.nonEmpty, "no range-keyed staging dir under _changes")
    // and nothing landed in the JVM temp dir
    val tmpAfter = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().map(_.getName).toSet
    assert((tmpAfter -- tmpBefore).forall(d => !d.contains("cdf")),
      s"driver-local staging leaked: ${tmpAfter -- tmpBefore}")
    // vacuum reclaims AGED staging debris (crashed sessions) but
    // leaves a fresh dir (a possibly-live scan) alone
    ManifestSink.vacuum(spark, root, keep = 10)
    assert(fs.listStatus(stage).nonEmpty,
      "a fresh staging dir must survive the grace window")
    staged.foreach(s => fs.setTimes(s.getPath, 1000L, 1000L))
    ManifestSink.vacuum(spark, root, keep = 10)
    assert(fs.listStatus(stage).toSeq.filter(
        _.getPath.getName.matches("^\\d+-\\d+\\.[0-9a-f]+$")).isEmpty,
      "aged staging debris must sweep")
  }

  test("@changes column pruning and filter pushdown reach the staged write") {
    ensureCatalog()
    val root = mkTable("a14_push_")
    spark.sql(s"INSERT INTO graft.`$root` VALUES (600, 600), (601, 601)")
    spark.sql(s"UPDATE graft.`$root` SET v = -1 WHERE k = 600")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = GraftChangesScan.stageRootOf(root)
    def stagedDirs() =
      if (!fs.exists(stage)) Set.empty[String]
      else fs.listStatus(stage).map(_.getPath.getName).toSet
    val before = stagedDirs()
    // narrow projection + a _change_type filter, pure SQL
    val rows = spark.sql(
      s"""SELECT k, _change_type FROM graft.`$root@changes:k:2-3`
         |WHERE _change_type = 'update_postimage'""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((600L, "update_postimage")))
    val fresh = (stagedDirs() -- before).toSeq
    assert(fresh.size == 1, s"expected one fresh staged dir, got $fresh")
    val stagedDf = spark.read.parquet(
      new org.apache.hadoop.fs.Path(stage, fresh.head).toString)
    // the staged files carry ONLY the projected columns...
    assert(stagedDf.columns.toSet == Set("k", "_change_type"),
      s"staged columns: ${stagedDf.columns.mkString(",")}")
    // ...and only the pre-filtered rows (one update pair member)
    assert(stagedDf.count() == 1L,
      "the pushed filter must reach the staging write")
    // the full unfiltered diff for the same range is larger
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$root@changes:k:2-3`")
      .head().getLong(0) == 2L)
  }

  test("over-cap DELETE on a DV-carrying table routes through the row-level rewrite") {
    ensureCatalog()
    val root = mkTable("a14_dvcap_", n = 60L)
    // epoch 2: a small MoR takedown puts a live DV on the table
    spark.conf.set("spark.graft.delete.mode", "mor")
    try spark.sql(s"DELETE FROM graft.`$root` WHERE k = 10")
    finally spark.conf.unset("spark.graft.delete.mode")
    assert(ManifestSink.commitDv(spark, root, 2).isDefined)
    // an IN-list past the cap used to dead-end: deleteMor refused and
    // pointed at deleteCow, which refuses DV bases. It must now fall
    // back to the DSv2 row-level DELETE (DV-aware group rewrite).
    spark.conf.set("spark.graft.dv.maxKeys", "4")
    try {
      val keys = (20L until 30L).mkString(", ")
      spark.sql(s"DELETE FROM graft.`$root` WHERE k IN ($keys)")
    } finally spark.conf.unset("spark.graft.dv.maxKeys")
    val left = spark.sql(s"SELECT k FROM graft.`$root` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(left == ((0L until 60L).filterNot(_ == 10L)
      .filterNot(k => k >= 20L && k < 30L)),
      s"over-cap delete must still apply: $left")
    // the row-level path rewrote groups — it must NOT have added a DV
    val cur = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.commitDvs(spark, root, cur).size == 1,
      "the fallback is a rewrite, not a second (over-cap) vector")
    // and the original takedown still holds through the rewrite
    assert(!left.contains(10L))
  }
}
