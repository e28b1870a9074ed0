package graft

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.sink.ManifestSink

/** VERDICT r14 #2 — merge-on-read UPDATE/MERGE/DELETE through Spark's
  * delta-based row-level API: a table that declares
  * `TBLPROPERTIES('graft.mergeKey' = <col>)` commits row-level DML as
  * ONE epoch of [carried files byte-identical] + [delete vector of the
  * pre-image keys] + [delta files of the new rows]; an over-cap change
  * materializes as copy-on-write inside the same statement. */
class MorDmlSpec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def mkTable(prefix: String, n: Long = 100L): String = {
    ensureCatalog()
    val root = tmpDir(prefix) + "/t"
    (0L until n).map(i => (i, i * 2L)).toDF("k", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView(s"mor_src_$prefix")
    spark.sql(s"CREATE TABLE graft.`$root` " +
      "TBLPROPERTIES ('graft.mergeKey' = 'k') " +
      s"AS SELECT * FROM mor_src_$prefix")
    root
  }

  private def dataState(root: String): Map[String, (Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestSink.manifestFiles(spark, root,
        ManifestSink.currentEpoch(spark, root)).map { f =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
      f -> (st.getLen, st.getModificationTime)
    }.toMap
  }

  test("MoR UPDATE: untouched files byte-identical, one epoch = DV + delta") {
    val root = mkTable("mor_upd_")
    val before = dataState(root)
    spark.sql(s"UPDATE graft.`$root` SET v = -1 WHERE k < 30")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    // every pre-update file carried BYTE-IDENTICAL (the MoR point)
    val after = dataState(root)
    assert(before.forall { case (f, st) => after.get(f).contains(st) },
      "pre-update files must carry byte-identical")
    // the epoch carries exactly one vector + the delta files
    val dvs = ManifestSink.commitDvs(spark, root, 2)
    assert(dvs.size == 1 && dvs.head._2 == "k", s"dvs: $dvs")
    val delta = (after.keySet -- before.keySet).toSeq
    assert(delta.nonEmpty, "the updated rows must land as delta files")
    // the result is the update
    val rows = spark.sql(s"SELECT k, v FROM graft.`$root` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (0L until 100L).map(k => (k, if (k < 30) -1L else k * 2)))
    // time travel still reads the pre-update snapshot
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "VERSION AS OF 1 WHERE v = -1").head().getLong(0) == 0L)
    // the CDF reports the change as UPDATE PAIRS, not delete+insert
    val feed = ManifestSink.tableChanges(spark, root, "k", 1, 2)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 30L, "update_postimage" -> 30L),
      s"feed: $byType")
  }

  test("MoR MERGE: matched update + unmatched insert in one epoch") {
    val root = mkTable("mor_mrg_")
    val before = dataState(root)
    Seq((5L, -5L), (7L, -7L), (900L, 900L)).toDF("k", "v")
      .createOrReplaceTempView("mor_mrg_src")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING mor_mrg_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    val after = dataState(root)
    assert(before.forall { case (f, st) => after.get(f).contains(st) })
    assert(ManifestSink.commitDvs(spark, root, 2).size == 1)
    val rows = spark.sql(
      s"SELECT k, v FROM graft.`$root` WHERE k IN (5, 7, 900) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((5L, -5L), (7L, -7L), (900L, 900L)))
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .head().getLong(0) == 101L)
    // feed: 2 update pairs + 1 insert
    val byType = ManifestSink.tableChanges(spark, root, "k", 1, 2)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "insert" -> 1L), s"feed: $byType")
  }

  test("MoR DELETE by predicate: pure-metadata epoch, no delta files") {
    val root = mkTable("mor_del_")
    val before = dataState(root)
    // a range predicate can't take the canDeleteWhere fast path — it
    // routes through the row-level op, which is delta on this table
    spark.sql(s"DELETE FROM graft.`$root` WHERE k >= 40 AND k < 45")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    val after = dataState(root)
    assert(after == before, "a MoR delete adds no data files")
    assert(ManifestSink.commitDvs(spark, root, 2).size == 1)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .head().getLong(0) == 95L)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$root` WHERE k BETWEEN 40 AND 44")
      .head().getLong(0) == 0L)
  }

  test("over-cap MoR falls back to CoW materialization in-statement") {
    val root = mkTable("mor_cap_")
    val before = dataState(root)
    spark.conf.set("spark.graft.dv.maxKeys", "5")
    try spark.sql(s"UPDATE graft.`$root` SET v = -1 WHERE k < 50")
    finally spark.conf.unset("spark.graft.dv.maxKeys")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    // CoW shape: scanned groups replaced, no vector committed
    assert(ManifestSink.commitDvs(spark, root, 2).isEmpty,
      "an over-cap change must not commit a vector")
    val after = dataState(root)
    assert((before.keySet -- after.keySet).nonEmpty,
      "the over-cap fallback must REWRITE the scanned groups")
    val rows = spark.sql(s"SELECT k, v FROM graft.`$root` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (0L until 100L).map(k => (k, if (k < 50) -1L else k * 2)))
  }

  test("MoR over a standing DV: scopes stack; compact materializes identically") {
    val root = mkTable("mor_dv_")
    // epoch 2: a MoR delete vectors k=10
    spark.sql(s"DELETE FROM graft.`$root` WHERE k >= 10 AND k < 11")
    // epoch 3: a MoR update over the DV-carrying base
    spark.sql(s"UPDATE graft.`$root` SET v = -2 WHERE k < 5")
    assert(ManifestSink.commitDvs(spark, root, 3).size == 2)
    val viewBefore = spark.sql(s"SELECT k, v FROM graft.`$root` ORDER BY k")
      .collect().toSeq
    assert(!viewBefore.exists(_.getLong(0) == 10L))
    assert(viewBefore.count(_.getLong(1) == -2L) == 5)
    // a MoR update of a vectored key RE-INSERTS it (epoch scoping):
    Seq((10L, 1010L)).toDF("k", "v").createOrReplaceTempView("mor_dv_re")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING mor_dv_re s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT v FROM graft.`$root` WHERE k = 10")
      .head().getLong(0) == 1010L)
    // compaction materializes vectors; the view is row-identical
    val pre = spark.sql(s"SELECT k, v FROM graft.`$root` ORDER BY k").collect().toSeq
    ManifestSink.compact(spark, root, Seq("k"))
    val post = spark.sql(s"SELECT k, v FROM graft.`$root` ORDER BY k").collect().toSeq
    assert(post == pre)
    assert(ManifestSink.commitDvs(spark, root,
      ManifestSink.currentEpoch(spark, root)).isEmpty)
  }

  test("spark.graft.dml.mode=cow forces the group rewrite on a keyed table") {
    val root = mkTable("mor_cow_")
    val before = dataState(root)
    spark.conf.set("spark.graft.dml.mode", "cow")
    try spark.sql(s"UPDATE graft.`$root` SET v = -1 WHERE k < 30")
    finally spark.conf.unset("spark.graft.dml.mode")
    assert(ManifestSink.commitDvs(spark, root, 2).isEmpty)
    assert((before.keySet --
      dataState(root).keySet).nonEmpty, "cow mode must rewrite groups")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root` WHERE v = -1")
      .head().getLong(0) == 30L)
  }
}
