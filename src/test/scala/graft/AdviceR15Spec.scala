package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.catalog.{GraftCatalog, GraftTable}
import graft.sink.ManifestSink

/** Round-15 ADVICE pins:
  *  - months/years write ordinals stay UTC under a non-UTC session
  *    (that pin lives in TimePartitionSpec, next to the layout ones);
  *  - tag mutations serialize against vacuum / each other under the
  *    maintenance lease;
  *  - a PUBLISH WAP that loses its commit CAS must NOT delete the
  *    stage's durable stats parquet — the stage stays auditable and
  *    droppable even when the rebase then fails;
  *  - metadata-table routing is end-anchored: a table whose PATH
  *    merely contains `@wapp`/`@changesy` loads as a plain table;
  *  - a second INSERT under the same spark.graft.wap.id is refused
  *    (the createTag immutable-pin discipline), never a silent
  *    overwrite orphaning the first stage.
  * Plus the r15 VERDICT #2: DESCRIBE CHANGES plans the distributed
  * `@changes` DSv2 scan, never a driver-collecting command. */
class AdviceR15Spec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def mkTable(prefix: String, n: Int = 40): String = {
    ensureCatalog()
    val root = tmpDir(prefix) + "/t"
    (0 until n).map(i => (i.toLong, i * 1.5)).toDF("k", "v")
      .createOrReplaceTempView(s"a15_src_$n")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM a15_src_$n")
    root
  }

  test("tag mutations run under the maintenance lease " +
    "(a CREATE TAG cannot thread a live vacuum's sweep window)") {
    val root = mkTable("a15_tag_")
    // while the lease is held (a vacuum in flight), tag writes refuse
    // instead of racing the sweep's tag read
    ManifestSink.withMaintLease(spark, root) {
      intercept[ManifestSink.MaintenanceLeaseException] {
        ManifestSink.createTag(spark, root, "pinned")
      }
      ()
    }
    // released -> the same mutation serializes cleanly
    assert(ManifestSink.createTag(spark, root, "pinned") == 1)
    ManifestSink.withMaintLease(spark, root) {
      intercept[ManifestSink.MaintenanceLeaseException] {
        ManifestSink.dropTag(spark, root, "pinned")
      }
      ()
    }
    ManifestSink.dropTag(spark, root, "pinned")
    assert(ManifestSink.readTags(spark, root).isEmpty)
  }

  test("a PUBLISH WAP that loses its CAS keeps the durable stats; " +
    "a then-failing rebase leaves the stage auditable and droppable") {
    val root = mkTable("a15_wapcas_")
    spark.conf.set("spark.graft.wap.id", "w2")
    try {
      (100L until 120L).map(i => (i, i * 1.5)).toDF("k", "v")
        .createOrReplaceTempView("a15_wap_batch")
      spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM a15_wap_batch")
    } finally spark.conf.unset("spark.graft.wap.id")
    val Seq((_, stagedEpoch, token)) = ManifestSink.liveWapStages(spark, root)
    val statsPath = new org.apache.hadoop.fs.Path(s"$root/stats-$stagedEpoch.$token")
    val f = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(statsPath), "the stage writes its durable stats parquet")
    // land a SCHEMA-MOVING racing commit exactly inside the publish's
    // CAS window: the publish loses, and its rebase must then fail
    ManifestSink.commitCasRaceHook = Some(() => {
      ManifestSink.evolveSchema(spark, root,
        StructType(Seq(StructField("w", DoubleType))))
      ()
    })
    val e = intercept[IllegalStateException] {
      spark.sql(s"PUBLISH WAP w2 ON graft.`$root`")
    }
    assert(e.getMessage.contains("cannot be rebased"), e.getMessage)
    // the loser cleanup EXEMPTED the live stage's stats parquet -> the
    // descriptor's stats=true contract still holds: the stage remains
    // readable from any session and cleanly droppable
    assert(f.exists(statsPath),
      "lost-CAS cleanup must not delete a live WAP stage's stats parquet")
    assert(spark.table(s"graft.`$root@wap:w2`").count() == 20)
    spark.sql(s"DROP WAP w2 ON graft.`$root`")
    assert(ManifestSink.liveWapStages(spark, root).isEmpty)
    // the table itself took only the racing evolve: data unchanged
    assert(spark.table(s"graft.`$root`").count() == 40)
  }

  test("metadata-table routing is end-anchored: a path containing " +
    "@wapp/@changesy loads as a plain table") {
    ensureCatalog()
    val base = tmpDir("a15_route_")
    for (dirName <- Seq("x@wapp", "a@changesy", "b@filesish")) {
      val root = s"$base/$dirName/t"
      (0 until 10).map(i => (i.toLong, i.toString)).toDF("k", "s")
        .createOrReplaceTempView("a15_route_src")
      spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM a15_route_src")
      assert(spark.table(s"graft.`$root`").count() == 10,
        s"$dirName must route to the plain-table path")
      // and the REAL metadata suffix still routes on the same table
      assert(spark.table(s"graft.`$root@files`").count() >= 1)
    }
  }

  test("a second INSERT under the same wap id is refused, not a " +
    "silent overwrite orphaning the first stage") {
    val root = mkTable("a15_wapdup_")
    spark.conf.set("spark.graft.wap.id", "dup")
    try {
      (100L until 110L).map(i => (i, 0.0)).toDF("k", "v")
        .createOrReplaceTempView("a15_dup_a")
      spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM a15_dup_a")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM a15_dup_a")
      }
      assert(e.getMessage.contains("already has a staged write"), e.getMessage)
    } finally spark.conf.unset("spark.graft.wap.id")
    // publish consumes the stage; the id becomes reusable
    spark.sql(s"PUBLISH WAP dup ON graft.`$root`")
    assert(spark.table(s"graft.`$root`").count() == 50)
    spark.conf.set("spark.graft.wap.id", "dup")
    try {
      (200L until 205L).map(i => (i, 0.0)).toDF("k", "v")
        .createOrReplaceTempView("a15_dup_b")
      spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM a15_dup_b")
    } finally spark.conf.unset("spark.graft.wap.id")
    spark.sql(s"PUBLISH WAP dup ON graft.`$root`")
    assert(spark.table(s"graft.`$root`").count() == 55)
  }

  test("DESCRIBE CHANGES plans the distributed @changes scan, " +
    "never a driver-collecting command") {
    val root = mkTable("a15_chg_")
    (100L until 110L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("a15_chg_b")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM a15_chg_b")
    val df = spark.sql(s"DESCRIBE CHANGES graft.`$root` KEY k FROM 1 TO 2")
    // a LeafRunnableCommand materializes the whole diff as driver rows;
    // the relation form must plan a V2 batch scan instead
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty,
      s"expected a BatchScanExec plan:\n${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getString(2) == "insert"))
    assert(rows.forall(_.getInt(3) == 2))
    // and the relation composes: pruned projection + filter still work
    val only = spark.sql(s"SELECT k FROM (SELECT * FROM (" +
      s"SELECT * FROM graft.`$root@changes:k:1-2`)) WHERE k >= 105")
    assert(only.count() == 5)
  }
}
