package graft

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.sink.ManifestSink

/** `@files` / `@partitions` / `@history` — the Iceberg
  * inspection-surface metadata tables, addressed by name like
  * `@changes`. All metadata-only (manifest + stats + markers; zero
  * data-file opens), served as a driver LocalScan, composable under
  * any SELECT. */
class MetaTablesSpec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  test("@files lists the manifest with sizes, counts, commit epochs, partitions") {
    ensureCatalog()
    val root = tmpDir("meta_f_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-08"))
    ev.createOrReplaceTempView("meta_f_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM meta_f_src")
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-10"))
      .createOrReplaceTempView("meta_f_b2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM meta_f_b2")

    val files = spark.sql(s"SELECT * FROM graft.`$root@files`")
    val rows = files.collect()
    val spec = ManifestSink.ptimeSpec(spark, root, 2).get
    assert(rows.length == spec.fileOrds.size)
    // every file: positive size, a committed __count, its commit epoch,
    // and its day ordinal
    assert(rows.forall(_.getLong(1) > 0L))
    val total = rows.map(_.getLong(2)).sum
    assert(total == spark.table(s"graft.`$root`").count())
    assert(rows.map(_.getInt(3)).toSet == Set(1, 2))
    rows.foreach { r =>
      assert(r.getLong(4) == spec.fileOrds(r.getString(0)).toLong) }
    // epoch pin: @files:1 sees only the CTAS files
    val e1 = spark.sql(s"SELECT count(*) AS c FROM graft.`$root@files:1`")
      .collect()(0).getLong(0)
    assert(e1 < rows.length.toLong && e1 > 0)
    // composable: the ops one-liner "files per epoch"
    val byEpoch = spark.sql(
      s"""SELECT commit_epoch, count(*) AS files
         |FROM graft.`$root@files` GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byEpoch(2) == rows.length - byEpoch(1))
  }

  test("@partitions rolls up per layout value; unpartitioned = one row; bucket ids") {
    ensureCatalog()
    val root = tmpDir("meta_p_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-05"))
    ev.createOrReplaceTempView("meta_p_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM meta_p_src")
    val parts = spark.sql(
      s"SELECT * FROM graft.`$root@partitions` ORDER BY partition").collect()
    val perDay = ev.groupBy(((unix_timestamp(col("ts")) / 86400L)
      .cast("long")).as("d")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(parts.map(_.getLong(0)).toSet == perDay.keySet)
    parts.foreach { r =>
      assert(r.getLong(1) == 1L, "one file per day ordinal")
      assert(r.getLong(3) == perDay(r.getLong(0)))
    }
    // bucket layout: partition = bucket id
    val rootB = tmpDir("meta_pb_") + "/t"
    ev.select(col("event_id"), col("value")).createOrReplaceTempView("meta_pb_src")
    spark.sql(s"CREATE TABLE graft.`$rootB` PARTITIONED BY (bucket(4, event_id)) " +
      "AS SELECT * FROM meta_pb_src")
    val bparts = spark.sql(
      s"SELECT partition FROM graft.`$rootB@partitions` ORDER BY 1")
      .collect().map(_.getLong(0))
    assert(bparts.toSet.subsetOf(Set(0L, 1L, 2L, 3L)) && bparts.nonEmpty)
    // unpartitioned: one whole-table row with null partition
    val rootU = tmpDir("meta_pu_") + "/t"
    spark.sql(s"CREATE TABLE graft.`$rootU` AS SELECT * FROM meta_pb_src")
    val uparts = spark.sql(s"SELECT * FROM graft.`$rootU@partitions`").collect()
    assert(uparts.length == 1 && uparts(0).isNullAt(0))
    assert(uparts(0).getLong(3) == ev.count())
  }

  test("@history is the composable audit log; refusals are shaped") {
    ensureCatalog()
    val root = tmpDir("meta_h_") + "/t"
    (0 until 40).map(i => (i.toLong, i.toString)).toDF("k", "v")
      .createOrReplaceTempView("meta_h_src")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM meta_h_src")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k + 100, v FROM meta_h_src")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k + 200, v FROM meta_h_src")
    val h = spark.sql(s"SELECT * FROM graft.`$root@history` ORDER BY epoch")
      .collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(h.map(_.getInt(4)).toSeq.sliding(2).forall(p => p(0) <= p(1)),
      "appends never shrink the file count")
    // composable: epochs that grew the table by >30 files (ops query)
    val grown = spark.sql(
      s"""SELECT epoch FROM graft.`$root@history`
         |WHERE n_files > 0 ORDER BY epoch""".stripMargin).count()
    assert(grown == 3L)
    // @history takes no epoch pin; unknown kinds are refused
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root@history:2`").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root@snapshots`").collect()
    }
  }

  test("snapshot tags: travel by name, vacuum keeps the pinned epoch, drop releases") {
    ensureCatalog()
    val root = tmpDir("meta_t_") + "/t"
    (0 until 30).map(i => (i.toLong, i.toString)).toDF("k", "v")
      .createOrReplaceTempView("meta_t_src")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM meta_t_src")
    spark.sql(s"CREATE TAG release_v1 ON graft.`$root`")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k + 100, v FROM meta_t_src")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k + 200, v FROM meta_t_src")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k + 300, v FROM meta_t_src")
    // travel by tag name = travel to the pinned epoch
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "VERSION AS OF 'release_v1'").collect()(0).getLong(0) == 30L)
    // @tags lists the pin
    val tags = spark.sql(s"SELECT * FROM graft.`$root@tags`").collect()
    assert(tags.map(r => r.getString(0) -> r.getInt(1)).toSeq ==
      Seq("release_v1" -> 1))
    // vacuum keep-2 would drop epochs 1 and 2; the TAG keeps 1 alive
    spark.sql(s"VACUUM graft.`$root` RETAIN 2 EPOCHS")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "VERSION AS OF 'release_v1'").collect()(0).getLong(0) == 30L,
      "a tagged epoch must survive retention")
    intercept[Exception] { // epoch 2 (untagged, outside keep-2) is gone
      spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 2").collect()
    }
    // refusals: duplicate tag, unknown tag travel, dead-epoch tag
    intercept[Exception] {
      spark.sql(s"CREATE TAG release_v1 ON graft.`$root` AS OF VERSION 3")
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 'nope'").collect()
    }
    intercept[Exception] {
      spark.sql(s"CREATE TAG dead ON graft.`$root` AS OF VERSION 2")
    }
    intercept[Exception] { // all-digit names would shadow epoch travel
      spark.sql(s"CREATE TAG 7 ON graft.`$root`")
    }
    // RESTORE travels by tag too (the same named-ref resolution)
    val restored = spark.sql(
      s"RESTORE graft.`$root` VERSION AS OF 'release_v1'").collect()(0)
    assert(restored.getInt(1) == 1)
    assert(spark.table(s"graft.`$root`").count() == 30L,
      "the restore re-pins the tagged epoch's content")
    // drop the tag -> the epoch rejoins the retention window
    spark.sql(s"DROP TAG release_v1 ON graft.`$root`")
    spark.sql(s"VACUUM graft.`$root` RETAIN 2 EPOCHS")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 1").collect()
    }
    assert(spark.sql(s"SELECT * FROM graft.`$root@tags`").count() == 0L)
  }

  test("metadata tables open ZERO data files") {
    ensureCatalog()
    val root = tmpDir("meta_z_") + "/t"
    (0 until 50).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .createOrReplaceTempView("meta_z_src")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM meta_z_src")
    // poison every data file: a scan that opened one would throw
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestSink.manifestFiles(spark, root, 1).foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      fsys.rename(p, new org.apache.hadoop.fs.Path(f + ".hidden"))
    }
    graft.sink.SnapshotCache.invalidateAll()
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root@files`")
      .collect()(0).getLong(0) > 0)
    assert(spark.sql(s"SELECT sum(n_files) AS c FROM graft.`$root@history`")
      .collect()(0).getLong(0) > 0)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root@partitions`")
      .collect()(0).getLong(0) == 1)
  }
}
