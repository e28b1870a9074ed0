package graft

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, GraftTable}
import graft.sink.ManifestSink

/** BRANCH REFS — the multi-epoch write-audit-publish generalization
  * (Iceberg's writable branch refs): `CREATE BRANCH` opens a ref at
  * the current snapshot, INSERTs under `spark.graft.branch` stage
  * CUMULATIVELY (an audit pipeline of N epochs, reader-invisible),
  * `@branch:<name>` audits the cumulative increment, and
  * `PUBLISH BRANCH` fast-forwards the whole pipeline onto the live
  * table in ONE commit CAS through the rebase ladder — atomically
  * above any racing live write. `DROP BRANCH` discards to
  * vacuum-sweepable debris; a LIVE branch is retention-exempt and
  * pins its base epoch. */
class BranchSpec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def mkTable(prefix: String, n: Int = 40): String = {
    ensureCatalog()
    val root = tmpDir(prefix) + "/t"
    (0 until n).map(i => (i.toLong, i * 1.5)).toDF("k", "v")
      .createOrReplaceTempView(s"br_src_$n")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM br_src_$n")
    root
  }

  private def branchWrite(root: String, name: String, view: String): Unit = {
    spark.conf.set("spark.graft.branch", name)
    try spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM $view")
    finally spark.conf.unset("spark.graft.branch")
  }

  test("two staged inserts publish atomically ABOVE a racing live insert") {
    val root = mkTable("br_pub_")
    spark.sql(s"CREATE BRANCH audit ON graft.`$root`")
    (100L until 110L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_b1")
    (200L until 215L).map(i => (i, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("br_b2")
    branchWrite(root, "audit", "br_b1")
    branchWrite(root, "audit", "br_b2")
    // nothing is reader-visible; the cumulative increment audits as
    // the @branch table and the ref lists under @branches
    assert(spark.table(s"graft.`$root`").count() == 40)
    assert(spark.table(s"graft.`$root@branch:audit`").count() == 25)
    val listing = spark.table(s"graft.`$root@branches`").collect()
    assert(listing.length == 1 && listing(0).getString(0) == "audit" &&
      listing(0).getInt(1) == 1 && listing(0).getInt(2) == 3)
    // a LIVE insert races in below the publish
    (300L until 305L).map(i => (i, 3.0)).toDF("k", "v")
      .createOrReplaceTempView("br_race")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_race")
    assert(spark.table(s"graft.`$root`").count() == 45)
    val pub = spark.sql(s"PUBLISH BRANCH audit ON graft.`$root`").collect()(0)
    assert(pub.getInt(4) == 2, "stage count surfaces at publish")
    // the pipeline landed as ONE epoch above the racer: all rows live
    val e = ManifestSink.currentEpoch(spark, root)
    assert(pub.getInt(2) == e)
    assert(spark.table(s"graft.`$root`").count() == 70)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "WHERE k >= 300").collect()(0).getLong(0) == 5,
      "the racing live insert's rows survive the fast-forward")
    // travel: the pre-publish epoch still shows 45 (racer, no branch)
    assert(spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF ${e - 1}")
      .count() == 45)
    // the ref is consumed
    assert(ManifestSink.liveBranchStages(spark, root).isEmpty)
    assert(spark.table(s"graft.`$root@branches`").collect().isEmpty)
  }

  test("a live branch is vacuum-exempt and pins its base; DROP leaves " +
    "sweepable debris") {
    val root = mkTable("br_vac_")
    spark.sql(s"CREATE BRANCH pipe ON graft.`$root`")
    (100L until 120L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_v1")
    branchWrite(root, "pipe", "br_v1")
    val Seq((_, _, token, base)) =
      ManifestSink.liveBranchStages(spark, root).map(t => (t._1, t._2, t._3, t._4))
    // advance the live table well past the base
    for (i <- 0 until 3) {
      (1000L + i until 1001L + i).map(j => (j, 9.0)).toDF("k", "v")
        .createOrReplaceTempView("br_adv")
      spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_adv")
    }
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stagedFiles(): Seq[String] =
      f.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
        .map(_.getPath.getName).filter(_.contains(s"-a$token"))
    assert(stagedFiles().nonEmpty)
    // vacuum with ZERO orphan grace (the age window must not be what
    // saves the stage): the LIVE branch's stage dirs, stats chain,
    // AND base epoch all survive
    ManifestSink.vacuum(spark, root, keep = 1, orphanGraceMs = 0L)
    assert(stagedFiles().nonEmpty,
      "a live branch's staged files must be retention-exempt")
    assert(spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF $base")
      .count() == 40, "a live branch pins its base epoch past retention")
    // the branch still audits and publishes after the sweep
    assert(spark.table(s"graft.`$root@branch:pipe`").count() == 20)
    spark.sql(s"PUBLISH BRANCH pipe ON graft.`$root`")
    assert(spark.table(s"graft.`$root`").count() == 63)
    // now DROP-style debris: a fresh branch, staged then dropped,
    // sweeps once the table advances past its staged epochs
    spark.sql(s"CREATE BRANCH dead ON graft.`$root`")
    branchWrite(root, "dead", "br_v1")
    val Seq((_, _, t2, _)) =
      ManifestSink.liveBranchStages(spark, root).map(t => (t._1, t._2, t._3, t._4))
    spark.sql(s"DROP BRANCH dead ON graft.`$root`")
    intercept[Exception] {
      spark.sql(s"PUBLISH BRANCH dead ON graft.`$root`").collect()
    }
    (2000L until 2002L).map(j => (j, 9.0)).toDF("k", "v")
      .createOrReplaceTempView("br_adv2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_adv2")
    ManifestSink.vacuum(spark, root, keep = 1, orphanGraceMs = 0L)
    // the dropped branch's stats chain and staged parquet are gone
    // (the emptied attempt dir itself may linger — harmless debris)
    val after = f.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
    assert(!after.exists(s => s.getPath.getName.startsWith("stats-") &&
      s.getPath.getName.endsWith(t2)),
      "a dropped branch's stats chain is vacuum debris")
    after.filter(_.getPath.getName.contains(s"-a$t2")).foreach { d =>
      assert(!f.listStatus(d.getPath)
        .exists(_.getPath.getName.endsWith(".parquet")),
        s"a dropped branch's staged files are vacuum debris: ${d.getPath}")
    }
  }

  test("refusals: no branch, duplicate branch, empty publish, schema " +
    "drift, schema moved under the publish") {
    val root = mkTable("br_ref_")
    // write without CREATE BRANCH
    (0L until 3L).map(i => (i, 0.0)).toDF("k", "v")
      .createOrReplaceTempView("br_r1")
    val e1 = intercept[Exception] { branchWrite(root, "ghost", "br_r1") }
    assert(e1.getMessage.contains("CREATE BRANCH first"), e1.getMessage)
    // duplicate
    spark.sql(s"CREATE BRANCH b ON graft.`$root`")
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE BRANCH b ON graft.`$root`").collect()
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // empty publish refused (nothing staged)
    val e3 = intercept[Exception] {
      spark.sql(s"PUBLISH BRANCH b ON graft.`$root`").collect()
    }
    assert(e3.getMessage.contains("no staged writes"), e3.getMessage)
    // schema drift refused at the branch write (Spark's own V2
    // by-name validation catches a renamed/retyped column first; the
    // branch's drift require is the backstop for the direct API
    // path) — and a refused write stages NOTHING
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("br_bad")
    intercept[Exception] { branchWrite(root, "b", "br_bad") }
    assert(GraftTable.branchStaged(spark, root, "b").exists(_._4 == 0),
      "a refused branch write must leave the branch unstaged")
    // stage, then MOVE the live schema: the publish rebase refuses
    branchWrite(root, "b", "br_r1")
    ManifestSink.evolveSchema(spark, root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.DoubleType))))
    val e5 = intercept[Exception] {
      spark.sql(s"PUBLISH BRANCH b ON graft.`$root`").collect()
    }
    assert(e5.getMessage.contains("cannot be rebased"), e5.getMessage)
    // the stage is intact: droppable, auditable
    assert(spark.table(s"graft.`$root@branch:b`").count() == 3)
    spark.sql(s"DROP BRANCH b ON graft.`$root`")
  }

  test("branch DML: stage insert -> stage MoR delete -> audit shows the " +
    "NET state -> publish lands both above a racing live write") {
    val root = mkTable("br_dml_")
    spark.sql(s"CREATE BRANCH fix ON graft.`$root`")
    // stage 1: ingest 20 rows (keys 100..119)
    (100L until 120L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_d1")
    branchWrite(root, "fix", "br_d1")
    // stage 2: the fix-up DELETE — keys 5 (base) and 100..104 (staged)
    spark.conf.set("spark.graft.branch", "fix")
    try spark.sql(s"DELETE FROM graft.`$root` " +
      "WHERE k IN (5, 100, 101, 102, 103, 104)")
    finally spark.conf.unset("spark.graft.branch")
    // the live table saw NOTHING: base row 5 still visible, no DV
    assert(spark.table(s"graft.`$root`").count() == 40)
    assert(ManifestSink.commitDvs(spark, root,
      ManifestSink.currentEpoch(spark, root)).isEmpty,
      "a branch delete must not touch the live table's DV state")
    // the audit shows the NET increment: 20 inserts minus the 5
    // staged-key takedowns (the base-key takedown applies at publish)
    val audit = spark.table(s"graft.`$root@branch:fix`")
    assert(audit.count() == 15, s"net audit state, got ${audit.count()}")
    assert(audit.filter(col("k") < 105).count() == 0,
      "deleted staged keys must not audit")
    val listing = spark.table(s"graft.`$root@branches`").collect()
    assert(listing(0).getInt(2) == 3,
      "the delete advances the branch tip epoch (base 1 + insert + delete)")
    // INSERT after a branch delete is refused (scope ordering)
    val eIns = intercept[Exception] { branchWrite(root, "fix", "br_d1") }
    assert(eIns.getMessage.contains("INSERT after a branch delete"),
      eIns.getMessage)
    // UPDATE under a branch on a table WITHOUT a declared merge key is
    // refused loudly (branch UPDATE is merge-on-read — it needs key
    // identity), never silently applied to the live table
    spark.conf.set("spark.graft.branch", "fix")
    val eUpd =
      try intercept[Exception] {
        spark.sql(s"UPDATE graft.`$root` SET v = 0.0 WHERE k > 1000")
      } finally spark.conf.unset("spark.graft.branch")
    assert(eUpd.getMessage.contains("unique merge key"), eUpd.getMessage)
    // a LIVE insert races in below the publish — including a row whose
    // key the branch deletes (the takedown must apply to it too)
    Seq((300L, 3.0), (5L, 5.5)).toDF("k", "v")
      .createOrReplaceTempView("br_drace")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_drace")
    val pub = spark.sql(s"PUBLISH BRANCH fix ON graft.`$root`").collect()(0)
    assert(pub.getInt(4) == 2)
    // net state: 40 base - key 5 (both copies: base row AND the racing
    // re-insert — the takedown scopes over everything pre-publish)
    // + 20 staged - 5 staged-deleted + 1 racer(300)
    val live = spark.table(s"graft.`$root`")
    assert(live.filter(col("k") === 5).count() == 0,
      "the branch takedown hides base AND racing copies of the key")
    assert(live.filter(col("k") === 300).count() == 1,
      "the racer's other row survives")
    assert(live.filter(col("k").between(100, 104)).count() == 0)
    assert(live.filter(col("k").between(105, 119)).count() == 15)
    assert(live.count() == 40 - 1 + 20 - 5 + 1)
    assert(ManifestSink.liveBranchStages(spark, root).isEmpty)
    // the published DV is live table state: a fresh insert of a
    // deleted key is VISIBLE again (epoch-scoped, not cumulative)
    Seq((5L, 7.0)).toDF("k", "v").createOrReplaceTempView("br_dre")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_dre")
    assert(spark.table(s"graft.`$root`")
      .filter(col("k") === 5).count() == 1,
      "a post-publish re-insert sits above the DV's scope")
  }

  test("branch MoR delete refusals: over-cap keys, key mismatch across " +
    "deletes; delete-only branch publishes") {
    val root = mkTable("br_dref_")
    spark.sql(s"CREATE BRANCH d ON graft.`$root`")
    // two deletes on DIFFERENT key columns: the second is refused
    spark.conf.set("spark.graft.branch", "d")
    try {
      spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (1, 2)")
      val eKey = intercept[Exception] {
        spark.sql(s"DELETE FROM graft.`$root` WHERE v = 1.5")
      }
      assert(eKey.getMessage != null)
      // over-cap refusal
      spark.conf.set("spark.graft.dv.maxKeys", "1")
      val eCap = intercept[Exception] {
        spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (10, 11, 12)")
      }
      def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(eCap).exists(_.contains("dv.maxKeys")), msgs(eCap))
      spark.conf.unset("spark.graft.dv.maxKeys")
    } finally spark.conf.unset("spark.graft.branch")
    // a delete-only branch publishes: keys 1, 2 vanish from the base
    val pub = spark.sql(s"PUBLISH BRANCH d ON graft.`$root`").collect()(0)
    assert(pub.getInt(4) == 1)
    assert(spark.table(s"graft.`$root`").count() == 38)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "WHERE k IN (1, 2)").collect()(0).getLong(0) == 0)
  }

  test("TWO branch deletes publish intact through a racing live write " +
    "(DV re-scope must never clobber a later takedown's keys)") {
    val root = mkTable("br_dv2_")
    spark.sql(s"CREATE BRANCH fix2 ON graft.`$root`")
    (100L until 110L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_dv2_ins")
    branchWrite(root, "fix2", "br_dv2_ins")
    spark.conf.set("spark.graft.branch", "fix2")
    try {
      spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (1, 100)")
      spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (2, 101)")
    } finally spark.conf.unset("spark.graft.branch")
    // a racing live insert forces the publish through the rebase
    // ladder, which re-scopes BOTH branch DVs above the rebased epoch
    // — the re-scope targets must clear every ORIGINAL dv name, or
    // the first copy would overwrite the second delete's keys before
    // they were read (the round-17 review finding)
    Seq((300L, 3.0)).toDF("k", "v").createOrReplaceTempView("br_dv2_race")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_dv2_race")
    spark.sql(s"PUBLISH BRANCH fix2 ON graft.`$root`")
    val live = spark.table(s"graft.`$root`")
    assert(live.filter(col("k").isin(1L, 2L, 100L, 101L)).count() == 0,
      "BOTH branch deletes' keys must stay deleted through the rebase")
    assert(live.filter(col("k").between(102, 109)).count() == 8)
    assert(live.filter(col("k") === 300).count() == 1)
    assert(live.count() == 40 - 2 + 10 - 2 + 1)
    // the published DVs are epoch-scoped, NOT cumulative: a
    // post-publish re-insert of a taken-down key is visible — the
    // publish must merge the staged deletes into ONE vector scoped at
    // publishedEpoch+1, never carry stage-epoch scopes that exceed it
    // (the r17-advice scope-stacking bug)
    Seq((101L, 9.0)).toDF("k", "v").createOrReplaceTempView("br_dv2_re")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_dv2_re")
    assert(spark.table(s"graft.`$root`")
      .filter(col("k") === 101).count() == 1,
      "a post-publish re-insert must sit above the merged DV's scope")
  }

  test("multi-delete branch FAST-FORWARD publish: post-publish " +
    "re-inserts of taken-down keys are visible (scopes never stack " +
    "above publishedEpoch+1)") {
    val root = mkTable("br_dvff_")
    spark.sql(s"CREATE BRANCH ff ON graft.`$root`")
    (100L until 110L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_dvff_ins")
    branchWrite(root, "ff", "br_dvff_ins")
    spark.conf.set("spark.graft.branch", "ff")
    try {
      spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (1, 100)")
      spark.sql(s"DELETE FROM graft.`$root` WHERE k IN (2, 101)")
    } finally spark.conf.unset("spark.graft.branch")
    // NO racing write: the fast-forward path commits the staged state
    // directly — stage-epoch DV names kept verbatim (dv-3, dv-4 on
    // base 1) would hide post-publish inserts at epochs 2..3
    spark.sql(s"PUBLISH BRANCH ff ON graft.`$root`")
    val live = spark.table(s"graft.`$root`")
    assert(live.filter(col("k").isin(1L, 2L, 100L, 101L)).count() == 0)
    assert(live.count() == 40 - 2 + 10 - 2)
    // immediate post-publish re-inserts land at publishedEpoch+1 —
    // the exact epoch the stacked stage scopes used to swallow
    Seq((2L, 8.0), (100L, 9.0)).toDF("k", "v")
      .createOrReplaceTempView("br_dvff_re")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_dvff_re")
    assert(spark.table(s"graft.`$root`")
      .filter(col("k").isin(2L, 100L)).count() == 2,
      "post-publish re-inserts must be visible (epoch-scoped DVs)")
    // and one epoch later still
    Seq((1L, 7.0)).toDF("k", "v").createOrReplaceTempView("br_dvff_re2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_dvff_re2")
    assert(spark.table(s"graft.`$root`")
      .filter(col("k") === 1).count() == 1)
  }

  test("branch UPDATE stages merge-on-read onto the branch; publish " +
    "lands the correction above a racing write; re-inserts stay visible") {
    val root = mkTable("br_upd_")
    spark.sql(s"ALTER TABLE graft.`$root` " +
      "SET TBLPROPERTIES ('graft.mergeKey' = 'k')")
    spark.sql(s"CREATE BRANCH fixu ON graft.`$root`")
    (100L until 110L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_upd_ins")
    branchWrite(root, "fixu", "br_upd_ins")
    // the fix-up: one base key (5) and one branch-staged key (100)
    spark.conf.set("spark.graft.branch", "fixu")
    try spark.sql(s"UPDATE graft.`$root` SET v = v * 10 WHERE k IN (5, 100)")
    finally spark.conf.unset("spark.graft.branch")
    // the LIVE table saw NOTHING
    assert(spark.table(s"graft.`$root`").count() == 40)
    assert(spark.table(s"graft.`$root`")
      .filter(col("k") === 5).collect()(0).getDouble(1) == 7.5)
    assert(ManifestSink.commitDvs(spark, root,
      ManifestSink.currentEpoch(spark, root)).isEmpty)
    // the audit shows the CORRECTED increment: 9 untouched staged
    // rows + the rewritten k=100 + the base-row correction k=5
    val audit = spark.table(s"graft.`$root@branch:fixu`")
    assert(audit.count() == 11, s"corrected increment, got ${audit.count()}")
    assert(audit.filter(col("k") === 100).collect()(0).getDouble(1) == 10.0,
      "the branch-staged copy audits CORRECTED")
    assert(audit.filter(col("k") === 5).collect()(0).getDouble(1) == 75.0,
      "the base-row correction audits on the branch")
    // an INSERT after an UPDATE is allowed (updates don't scope above
    // the publish epoch the way deletes do)
    Seq((200L, 2.0)).toDF("k", "v").createOrReplaceTempView("br_upd_more")
    branchWrite(root, "fixu", "br_upd_more")
    // a LIVE insert races in below the publish, including a copy of
    // an updated key — the correction must take it down too
    Seq((300L, 3.0), (5L, 5.5)).toDF("k", "v")
      .createOrReplaceTempView("br_upd_race")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_upd_race")
    spark.sql(s"PUBLISH BRANCH fixu ON graft.`$root`")
    val live = spark.table(s"graft.`$root`")
    // 40 base - hidden base copy of 5 + 11 branch increment + insert
    // 200 + racer 300 (racing copy of 5 hidden)
    assert(live.count() == 40 - 1 + 11 + 1 + 1, s"got ${live.count()}")
    val k5 = live.filter(col("k") === 5).collect()
    assert(k5.length == 1 && k5(0).getDouble(1) == 75.0,
      "exactly ONE corrected row for the updated base key")
    assert(live.filter(col("k") === 100).collect()(0).getDouble(1) == 10.0)
    assert(live.filter(col("k") === 300).count() == 1)
    // the published update vector is epoch-scoped: a post-publish
    // re-insert of an updated key is visible next to the correction
    Seq((5L, 9.9)).toDF("k", "v").createOrReplaceTempView("br_upd_re")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_upd_re")
    assert(spark.table(s"graft.`$root`")
      .filter(col("k") === 5).count() == 2)
  }

  test("branch MERGE: matched update + not-matched insert stage onto " +
    "the branch and publish as one epoch") {
    val root = mkTable("br_mrg_")
    spark.sql(s"ALTER TABLE graft.`$root` " +
      "SET TBLPROPERTIES ('graft.mergeKey' = 'k')")
    spark.sql(s"CREATE BRANCH m ON graft.`$root`")
    (100L until 105L).map(i => (i, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("br_mrg_ins")
    branchWrite(root, "m", "br_mrg_ins")
    // source: corrects base key 3 and staged key 102, inserts 500
    Seq((3L, 30.0), (102L, 12.0), (500L, 5.0)).toDF("sk", "sv")
      .createOrReplaceTempView("br_mrg_src")
    spark.conf.set("spark.graft.branch", "m")
    try spark.sql(
      s"""MERGE INTO graft.`$root` t USING br_mrg_src s ON t.k = s.sk
         |WHEN MATCHED THEN UPDATE SET v = s.sv
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.sk, s.sv)
         |""".stripMargin)
    finally spark.conf.unset("spark.graft.branch")
    assert(spark.table(s"graft.`$root`").count() == 40, "live untouched")
    val audit = spark.table(s"graft.`$root@branch:m`")
    // 4 untouched staged + rewritten 102 + base-correction 3 + insert 500
    assert(audit.count() == 7, s"got ${audit.count()}")
    assert(audit.filter(col("k") === 102).collect()(0).getDouble(1) == 12.0)
    assert(audit.filter(col("k") === 3).collect()(0).getDouble(1) == 30.0)
    assert(audit.filter(col("k") === 500).count() == 1)
    spark.sql(s"PUBLISH BRANCH m ON graft.`$root`")
    val live = spark.table(s"graft.`$root`")
    assert(live.count() == 40 - 1 + 7, s"got ${live.count()}")
    assert(live.filter(col("k") === 3).collect()(0).getDouble(1) == 30.0)
    assert(live.filter(col("k") === 102).collect()(0).getDouble(1) == 12.0)
    assert(live.filter(col("k") === 500).count() == 1)
    // a PURE matched-DELETE merge is the takedown shape — no UPDATE or
    // INSERT action, an empty replacement set, a delete-class vector
    spark.sql(s"CREATE BRANCH m2 ON graft.`$root`")
    Seq((500L, 0.0), (3L, 0.0)).toDF("sk", "sv")
      .createOrReplaceTempView("br_mrg_del")
    spark.conf.set("spark.graft.branch", "m2")
    try spark.sql(
      s"""MERGE INTO graft.`$root` t USING br_mrg_del s ON t.k = s.sk
         |WHEN MATCHED THEN DELETE""".stripMargin)
    finally spark.conf.unset("spark.graft.branch")
    assert(spark.table(s"graft.`$root`").count() == 46, "live untouched")
    spark.sql(s"PUBLISH BRANCH m2 ON graft.`$root`")
    val live2 = spark.table(s"graft.`$root`")
    assert(live2.count() == 44)
    assert(live2.filter(col("k").isin(3L, 500L)).count() == 0)
    // delete-class publish scope: a post-publish re-insert is visible
    Seq((500L, 1.0)).toDF("k", "v").createOrReplaceTempView("br_mrg_re")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM br_mrg_re")
    assert(spark.table(s"graft.`$root`")
      .filter(col("k") === 500).count() == 1)
  }

  test("branch writes keep the declared layout; publish lands it") {
    ensureCatalog()
    val root = tmpDir("br_lay_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    ev.filter(col("ts") < lit("2024-01-04")).createOrReplaceTempView("br_l1")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM br_l1")
    spark.sql(s"CREATE BRANCH lay ON graft.`$root`")
    ev.filter(col("ts") >= lit("2024-01-04") && col("ts") < lit("2024-01-06"))
      .createOrReplaceTempView("br_l2")
    branchWrite(root, "lay", "br_l2")
    spark.sql(s"PUBLISH BRANCH lay ON graft.`$root`")
    val e = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.ptimeSpec(spark, root, e).isDefined,
      "published branch epochs keep the committed time layout")
    assert(spark.table(s"graft.`$root`").count() ==
      ev.filter(col("ts") < lit("2024-01-06")).count())
  }
}
