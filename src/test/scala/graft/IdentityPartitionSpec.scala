package graft

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, GraftTable}
import graft.sink.ManifestSink

/** Identity and truncate partition transforms (`PARTITIONED BY (lang)`
  * / `(truncate(w, col))` — the Iceberg transforms; the reference's
  * own `location` secondary-index access pattern,
  * `cassandra/init.cql:81-82`, re-expressed as a layout): every
  * committed file holds exactly one transform value, recorded as
  * `__ident`/`__trunc` stats rows. Single-value files make the
  * ordinary zone maps EXACT pruning for `WHERE col = ?`, and the
  * committed layout reports as `KeyGroupedPartitioning(identity(col))`
  * (or the V2 `truncate` function) so same-layout tables
  * storage-partition-join with zero shuffles. */
class IdentityPartitionSpec extends SparkTestBase {
  import spark.implicits._

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  // AQE-unwrapped (see PlanProbe: a naive executedPlan.collect finds
  // nothing under AdaptiveSparkPlanExec and shuffle asserts go vacuous)
  private def shuffles(df: org.apache.spark.sql.DataFrame) =
    graft.plans.PlanProbe.shuffles(df)

  private def withSpjConfs[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CTAS PARTITIONED BY (lang): single-value files, exact value " +
    "pruning, append keeps the layout, identity SPJ plans zero shuffles") {
    ensureCatalog()
    val base = tmpDir("ident_s_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.filter(col("doc_id") < 400).createOrReplaceTempView("id_src")
    spark.sql(s"CREATE TABLE graft.`$r1` PARTITIONED BY (lang) " +
      "AS SELECT * FROM id_src")
    val spec = ManifestSink.identSpec(spark, r1, 1)
    assert(spec.exists(s => s.col == "lang" && s.width.isEmpty && s.isString),
      s"expected a committed identity(lang) layout, got $spec")
    val vals = spec.get.fileStrs
    assert(vals.values.toSet == docs.filter(col("doc_id") < 400)
      .select("lang").distinct().collect().map(_.getString(0)).toSet)
    // one file per value at this scale (each under the target size)
    assert(vals.values.toSet.size == vals.size, s"one file per value: $vals")
    assert(spark.table(s"graft.`$r1`").count() == 400)
    // WHERE lang = ? plans exactly that value's files
    val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` " +
      "WHERE lang = 'fr'").collect()(0).getLong(0)
    val frFiles = vals.count(_._2 == "fr")
    assert(GraftTable.lastPlannedFiles == frFiles,
      s"lang='fr' must plan exactly $frFiles files, planned " +
        s"${GraftTable.lastPlannedFiles}")
    assert(c == docs.filter(col("doc_id") < 400 && col("lang") === "fr").count())
    // INSERT INTO lays out only the batch; the layout survives
    docs.filter(col("doc_id") >= 400).createOrReplaceTempView("id_b2")
    spark.sql(s"INSERT INTO graft.`$r1` SELECT * FROM id_b2")
    val spec2 = ManifestSink.identSpec(spark, r1, 2)
    assert(spec2.isDefined, "append must keep the identity layout")
    assert(vals.forall { case (f, v) => spec2.get.fileStrs.get(f).contains(v) },
      "prior files carry verbatim")
    assert(spark.table(s"graft.`$r1`").count() == docs.count())
    // same-layout identity join: zero shuffles
    docs.createOrReplaceTempView("id_ball")
    spark.sql(s"CREATE TABLE graft.`$r2` PARTITIONED BY (lang) " +
      "AS SELECT * FROM id_ball")
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.lang, count(*) AS pairs
           |FROM graft.`$r1` a JOIN graft.`$r2` b ON a.lang = b.lang
           |GROUP BY a.lang""".stripMargin)
      assert(out.count() == 5)
      assert(shuffles(out).isEmpty,
        s"same-layout identity join must drop both shuffles:\n" +
          out.queryExecution.executedPlan)
    }
    // DESCRIBE DETAIL reports the layout slot as the bare column
    assert(spark.sql(s"DESCRIBE DETAIL graft.`$r1`")
      .collect()(0).getString(6) == "lang")
  }

  test("identity on an integral column: long-typed spec, pruning, SPJ") {
    ensureCatalog()
    val base = tmpDir("ident_i_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), (col("n_chars") % 4).as("grp"), col("n_chars"))
    docs.createOrReplaceTempView("idi_src")
    spark.sql(s"CREATE TABLE graft.`$r1` PARTITIONED BY (grp) " +
      "AS SELECT * FROM idi_src")
    val spec = ManifestSink.identSpec(spark, r1, 1)
    assert(spec.exists(s => s.col == "grp" && !s.isString && s.width.isEmpty),
      s"got $spec")
    assert(spec.get.fileLongs.values.toSet == Set(0L, 1L, 2L, 3L))
    assert(spark.table(s"graft.`$r1`").count() == docs.count())
    val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` WHERE grp = 2")
      .collect()(0).getLong(0)
    assert(GraftTable.lastPlannedFiles == spec.get.fileLongs.count(_._2 == 2L))
    assert(c == docs.filter(col("grp") === 2).count())
    spark.sql(s"CREATE TABLE graft.`$r2` PARTITIONED BY (grp) " +
      "AS SELECT * FROM idi_src")
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.grp, count(*) AS pairs
           |FROM graft.`$r1` a JOIN graft.`$r2` b ON a.grp = b.grp
           |GROUP BY a.grp""".stripMargin)
      assert(out.count() == 4)
      assert(shuffles(out).isEmpty,
        s"integral identity SPJ must drop both shuffles:\n" +
          out.queryExecution.executedPlan)
    }
  }

  test("truncate(4, source): single-prefix files; join on the full key " +
    "rides the V2 truncate function shuffle-free") {
    ensureCatalog()
    val base = tmpDir("ident_t_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.createOrReplaceTempView("idt_src")
    spark.sql(s"CREATE TABLE graft.`$r1` PARTITIONED BY (truncate(4, source)) " +
      "AS SELECT * FROM idt_src")
    val spec = ManifestSink.identSpec(spark, r1, 1)
    assert(spec.exists(s => s.col == "source" && s.width.contains(4) && s.isString),
      s"expected a committed truncate(4, source) layout, got $spec")
    // every committed value is a 4-char-or-shorter prefix
    assert(spec.get.fileStrs.values.forall(_.length <= 4))
    assert(spark.table(s"graft.`$r1`").count() == docs.count())
    // an equality predicate on source prunes via the ordinary zone
    // maps (single-prefix files keep them tight on the prefix)
    val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` " +
      "WHERE source = 'src7'").collect()(0).getLong(0)
    assert(c == docs.filter(col("source") === "src7").count())
    assert(GraftTable.lastPlannedFiles < spec.get.fileStrs.size,
      "a source point-lookup must prune below the full file list")
    spark.sql(s"CREATE TABLE graft.`$r2` PARTITIONED BY (truncate(4, source)) " +
      "AS SELECT * FROM idt_src")
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.source, count(*) AS pairs
           |FROM graft.`$r1` a JOIN graft.`$r2` b ON a.source = b.source
           |GROUP BY a.source""".stripMargin)
      assert(out.count() == docs.select("source").distinct().count())
      assert(graft.plans.PlanProbe.joins(out).nonEmpty)
      assert(graft.plans.PlanProbe.joinInputShuffles(out).isEmpty,
        s"same-truncate-layout join must drop both input shuffles:\n" +
          out.queryExecution.executedPlan)
    }
    // DESCRIBE DETAIL layout slot
    assert(spark.sql(s"DESCRIBE DETAIL graft.`$r1`")
      .collect()(0).getString(6) == "truncate(4,source)")
  }

  test("integral truncate floors to the width's multiple (negatives floor)") {
    ensureCatalog()
    val root = tmpDir("ident_ti_") + "/t"
    Seq(-5L, -1L, 0L, 3L, 10L, 19L).toDF("v").createOrReplaceTempView("iti_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (truncate(10, v)) " +
      "AS SELECT * FROM iti_src")
    val spec = ManifestSink.identSpec(spark, root, 1).get
    assert(!spec.isString && spec.width.contains(10))
    // Iceberg truncate: -5 -> -10, -1 -> -10, 0/3 -> 0, 10/19 -> 10
    assert(spec.fileLongs.values.toSet == Set(-10L, 0L, 10L),
      s"got ${spec.fileLongs}")
    assert(spark.table(s"graft.`$root`").count() == 6)
    // the V2 truncate function agrees with the committed placement
    val fn = new graft.catalog.GraftTruncBound(
      org.apache.spark.sql.types.LongType)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](10, -5L))
    assert(fn.produceResult(row) == -10L)
  }

  test("identity composes with bucket: dual spec, intersected pruning, " +
    "pair SPJ on (lang, doc_id) plans zero shuffles") {
    ensureCatalog()
    val base = tmpDir("ident_cb_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.createOrReplaceTempView("icb_src")
    spark.sql(s"CREATE TABLE graft.`$r1` " +
      "PARTITIONED BY (lang, bucket(2, doc_id)) AS SELECT * FROM icb_src")
    val is = ManifestSink.identSpec(spark, r1, 1)
    val bs = ManifestSink.bucketSpec(spark, r1, 1)
    assert(is.exists(_.col == "lang") && bs.exists(_.numBuckets == 2),
      s"both specs must commit, got $is / $bs")
    assert(is.get.fileStrs.keySet == bs.get.fileBuckets.keySet)
    assert(spark.table(s"graft.`$r1`").count() == docs.count())
    // a (lang, key) point query plans within the INTERSECTION
    val dev = docs.filter(col("lang") === "fr").select("doc_id").head.getLong(0)
    val want = is.get.fileStrs.count { case (f, v) =>
      v == "fr" && bs.get.fileBuckets(f) == (dev % 2).toInt }
    val frFiles = is.get.fileStrs.count(_._2 == "fr")
    val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` " +
      s"WHERE lang = 'fr' AND doc_id = $dev").collect()(0).getLong(0)
    assert(c == 1)
    assert(GraftTable.lastPlannedFiles <= want && want <= frFiles,
      s"intersected lookup must plan <= $want files (fr has $frFiles), " +
        s"planned ${GraftTable.lastPlannedFiles}")
    // INSERT keeps both specs
    spark.sql(s"INSERT INTO graft.`$r1` SELECT doc_id + 100000, lang, " +
      "n_chars FROM icb_src WHERE doc_id < 20")
    assert(ManifestSink.identSpec(spark, r1, 2).isDefined &&
      ManifestSink.bucketSpec(spark, r1, 2).isDefined,
      "the append must carry both specs")
    // pair SPJ: same-layout tables join on (lang, doc_id) shuffle-free
    spark.sql(s"CREATE TABLE graft.`$r2` " +
      "PARTITIONED BY (lang, bucket(2, doc_id)) AS SELECT * FROM icb_src")
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.lang, count(*) AS pairs
           |FROM graft.`$r2` a JOIN graft.`$r2` b
           |ON a.lang = b.lang AND a.doc_id = b.doc_id
           |GROUP BY a.lang""".stripMargin)
      assert(out.count() == 5)
      // the post-join GROUP BY on ONE axis of the pair legitimately
      // reshuffles; the SPJ claim is about the JOIN's inputs
      assert(graft.plans.PlanProbe.joins(out).nonEmpty)
      assert(graft.plans.PlanProbe.joinInputShuffles(out).isEmpty,
        s"identity x bucket pair SPJ must drop both input shuffles:\n" +
          out.queryExecution.executedPlan)
    }
  }

  test("identity composes with days(ts): dual spec, intersected pruning, " +
    "pair SPJ on (event_type, ts)") {
    ensureCatalog()
    val base = tmpDir("ident_ct_")
    val r1 = s"$base/a"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-05"))
    ev.createOrReplaceTempView("ict_src")
    spark.sql(s"CREATE TABLE graft.`$r1` " +
      "PARTITIONED BY (event_type, days(ts)) AS SELECT * FROM ict_src")
    val is = ManifestSink.identSpec(spark, r1, 1)
    val ts = ManifestSink.ptimeSpec(spark, r1, 1)
    assert(is.exists(_.col == "event_type") && ts.exists(_.unit == "days"),
      s"both specs must commit, got $is / $ts")
    assert(spark.table(s"graft.`$r1`").count() == ev.count())
    // a (type, day) point query plans the intersection, never the day
    val day0 = ts.get.fileOrds.values.min
    val lo = java.time.LocalDate.ofEpochDay(day0.toLong).toString
    val hi = java.time.LocalDate.ofEpochDay(day0.toLong + 1).toString
    val ty = ev.select("event_type").head.getString(0)
    val want = is.get.fileStrs.count { case (f, v) =>
      v == ty && ts.get.fileOrds(f) == day0 }
    val dayFiles = ts.get.fileOrds.count(_._2 == day0)
    val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` " +
      s"WHERE event_type = '$ty' AND ts >= TIMESTAMP '$lo 00:00:00' " +
      s"AND ts < TIMESTAMP '$hi 00:00:00'").collect()(0).getLong(0)
    assert(c > 0)
    assert(GraftTable.lastPlannedFiles <= want && want < dayFiles,
      s"(type, day) lookup must plan within the intersected $want files " +
        s"(day has $dayFiles), planned ${GraftTable.lastPlannedFiles}")
    // pair SPJ on (event_type, ts) — both axes data-dependent; same
    // table both sides so the pair sets align exactly
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.event_type, count(*) AS pairs
           |FROM graft.`$r1` a JOIN graft.`$r1` b
           |ON a.event_type = b.event_type AND a.ts = b.ts
           |GROUP BY a.event_type""".stripMargin)
      assert(out.count() > 0)
      assert(graft.plans.PlanProbe.joins(out).nonEmpty)
      assert(graft.plans.PlanProbe.joinInputShuffles(out).isEmpty,
        s"identity x time pair SPJ must drop both input shuffles:\n" +
          out.queryExecution.executedPlan)
    }
  }

  test("CoW UPDATE keeps the identity layout; refusals: null values, " +
    "maxKeys cap, identity+bucket mix, layout-column rename") {
    ensureCatalog()
    val root = tmpDir("ident_u_") + "/t"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.createOrReplaceTempView("idu_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (lang) " +
      "AS SELECT * FROM idu_src")
    spark.sql(s"UPDATE graft.`$root` SET n_chars = 0 WHERE doc_id < 10")
    val e = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.identSpec(spark, root, e).exists(_.col == "lang"),
      "a CoW UPDATE must keep the identity layout")
    assert(spark.table(s"graft.`$root`")
      .filter(col("n_chars") === 0).count() == 10)
    assert(spark.table(s"graft.`$root`").count() == docs.count())
    // null identity values are rejected
    val rootN = tmpDir("ident_n_") + "/t"
    Seq(Some("en"), None).toDF("lang").createOrReplaceTempView("idn_src")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$rootN` PARTITIONED BY (lang) " +
        "AS SELECT * FROM idn_src")
    }
    // a too-fine identity layout refuses at the cap
    spark.conf.set("spark.graft.layout.maxKeys", "2")
    try {
      val rootC = tmpDir("ident_c_") + "/t"
      val eCap = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$rootC` PARTITIONED BY (lang) " +
          "AS SELECT * FROM idu_src")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(eCap).exists(_.contains("layout.maxKeys")))
    } finally spark.conf.unset("spark.graft.layout.maxKeys")
    // layout column refuses rename (the spec is declared by name)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN lang TO language")
    }
  }
}
