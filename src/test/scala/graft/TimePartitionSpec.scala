package graft

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, GraftTable}
import graft.sink.ManifestSink

/** Time-transform partitioning (`PARTITIONED BY (hours(ts))` /
  * `days(ts)` / `months(ts)` / `years(ts)` — the Iceberg transform
  * surface; the reference's own layout is hour-bucketed,
  * `cassandra/init.cql:41-54`): every committed file holds exactly
  * one time-partition ordinal, recorded as `__ptime` stats rows.
  * Unit-aligned files make the ordinary ts zone maps EXACT partition
  * pruning, and the committed layout reports as
  * `KeyGroupedPartitioning(days(ts))` so same-layout tables
  * storage-partition-join with zero shuffles. */
class TimePartitionSpec extends SparkTestBase {
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
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CTAS hours(ts): every file single-hour; time-range scan prunes to the hour") {
    ensureCatalog()
    val root = tmpDir("tpart_h_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-02"))
    ev.createOrReplaceTempView("tp_hours_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (hours(ts)) " +
      "AS SELECT * FROM tp_hours_src")
    val spec = ManifestSink.ptimeSpec(spark, root, 1)
    assert(spec.exists(s => s.col == "ts" && s.unit == "hours"),
      s"expected a committed hours(ts) layout, got $spec")
    val ords = spec.get.fileOrds
    // one file per hour: the layout places each ordinal in exactly
    // one output partition
    assert(ords.values.toSet.size == ords.size,
      s"expected one file per hour ordinal, got $ords")
    // ordinal values ARE floorDiv(epochMicros, hourMicros): day one of
    // 2024 spans hours 473352..473375
    val day0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) / 3600
    assert(ords.values.forall(o => o >= day0 && o < day0 + 24),
      s"hour ordinals out of 2024-01-01 range: ${ords.values.toSeq.sorted}")
    // read-back parity
    assert(spark.table(s"graft.`$root`").count() == ev.count())
    // a one-hour range predicate plans exactly that hour's file
    val hr = spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "WHERE ts >= TIMESTAMP '2024-01-01 05:00:00' " +
      "AND ts < TIMESTAMP '2024-01-01 06:00:00'")
    val c = hr.collect()(0).getLong(0)
    assert(GraftTable.lastPlannedFiles <= 1,
      s"hour-aligned files must prune to <=1 file, planned ${GraftTable.lastPlannedFiles}")
    val exp = ev.filter(col("ts") >= lit("2024-01-01 05:00:00") &&
      col("ts") < lit("2024-01-01 06:00:00")).count()
    assert(c == exp)
  }

  test("INSERT INTO preserves the layout; a CoW UPDATE re-lays its " +
    "replacement files and KEEPS it") {
    ensureCatalog()
    val root = tmpDir("tpart_a_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    ev.filter(col("ts") < lit("2024-01-08")).createOrReplaceTempView("tp_app_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM tp_app_src")
    val before = ManifestSink.ptimeSpec(spark, root, 1).get
    ev.filter(col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-12"))
      .createOrReplaceTempView("tp_app_b2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM tp_app_b2")
    val after = ManifestSink.ptimeSpec(spark, root, 2)
    assert(after.isDefined, "append must keep the committed layout")
    assert(after.get.fileOrds.size > before.fileOrds.size)
    // prior files carry verbatim (append lays out only the batch)
    assert(before.fileOrds.forall { case (f, o) => after.get.fileOrds.get(f).contains(o) })
    assert(spark.table(s"graft.`$root`").count() ==
      ev.filter(col("ts") < lit("2024-01-12")).count())
    // a CoW UPDATE re-lays its replacement batch under the SAME spec
    // and commits fresh __ptime rows for the relaid files (VERDICT
    // r16): the layout survives row-level DML — no full-table re-lay
    spark.sql(s"UPDATE graft.`$root` SET value = 0.0 WHERE event_id < 20")
    val e = ManifestSink.currentEpoch(spark, root)
    val kept = ManifestSink.ptimeSpec(spark, root, e)
    assert(kept.exists(s => s.col == "ts" && s.unit == "days"),
      s"a CoW UPDATE must keep the days(ts) layout, got $kept")
    // SINGLE-WRITE evidence (round 18): the replacement files were
    // staged directly into layout-partition subdirectories by the
    // declared-distribution write — never read back and re-laid
    // through a second attempt dir (the r17 relay wrote every CoW
    // replacement batch twice)
    val replaced = ManifestSink.manifestEntries(spark, root, e).map(_._1)
      .filter(_.startsWith(s"data-epoch=$e-"))
    assert(replaced.nonEmpty && replaced.forall(_.contains("/__p0=")),
      s"replacement files must stage partitioned in ONE write, got $replaced")
    assert(replaced.map(_.split("/").head).distinct.size == 1,
      "exactly one staged attempt dir — no relay rewrite")
    assert(spark.table(s"graft.`$root`").filter(col("value") === 0.0).count() >= 20 - 1)
    assert(spark.table(s"graft.`$root`").count() ==
      ev.filter(col("ts") < lit("2024-01-12")).count(),
      "the rewrite must preserve every row")
    // the preserved layout still storage-partition-joins shuffle-free
    // against an untouched same-spec table
    val root2 = tmpDir("tpart_a2_") + "/t"
    spark.sql(s"CREATE TABLE graft.`$root2` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM tp_app_src")
    withSpjConfs {
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      try {
        val out = spark.sql(
          s"""SELECT a.ts, a.value + b.value AS v
             |FROM graft.`$root` a JOIN graft.`$root2` b ON a.ts = b.ts""".stripMargin)
        assert(out.count() > 0)
        assert(shuffles(out).isEmpty,
          s"post-UPDATE same-layout join must stay shuffle-free:\n" +
            out.queryExecution.executedPlan)
      } finally
        spark.conf.unset("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    }
    // an UPDATE that NULLS the layout column is refused (placeByKey's
    // null contract — the key-grouping promise cannot hold a null)
    val eNull = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$root` SET ts = NULL WHERE event_id = 30")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(eNull).exists(_.contains("null partition value")),
      s"null layout-column UPDATE must be refused, got: ${msgs(eNull)}")
  }

  test("SPJ: two days(ts) tables join on ts with zero shuffles") {
    ensureCatalog()
    val base = tmpDir("tpart_spj_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-15"))
    // same ts population on both sides -> identical ordinal sets
    ev.createOrReplaceTempView("tp_spj_a")
    ev.withColumn("value", col("value") * 2).createOrReplaceTempView("tp_spj_b")
    spark.sql(s"CREATE TABLE graft.`$r1` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM tp_spj_a")
    spark.sql(s"CREATE TABLE graft.`$r2` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM tp_spj_b")
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.ts, a.value + b.value AS v
           |FROM graft.`$r1` a JOIN graft.`$r2` b ON a.ts = b.ts""".stripMargin)
      assert(out.count() >= ev.count())
      assert(shuffles(out).isEmpty,
        s"same-layout time-partitioned join must drop both shuffles:\n" +
          out.queryExecution.executedPlan)
    }
  }

  test("months/years ordinals follow the Iceberg arithmetic, pre-1970 floors") {
    ensureCatalog()
    val root = tmpDir("tpart_m_") + "/t"
    Seq("1969-12-31 23:30:00", "1970-01-01 00:30:00", "2024-03-15 10:30:00")
      .map(java.sql.Timestamp.valueOf)
      .toDF("ts").createOrReplaceTempView("tp_m_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (months(ts)) " +
      "AS SELECT * FROM tp_m_src")
    val m = ManifestSink.ptimeSpec(spark, root, 1).get
    assert(m.unit == "months")
    // (year-1970)*12 + month-1: Dec 1969 = -1, Jan 1970 = 0, Mar 2024 = 650
    assert(m.fileOrds.values.toSet == Set(-1, 0, (2024 - 1970) * 12 + 2),
      s"got ${m.fileOrds}")
    val rootY = tmpDir("tpart_y_") + "/t"
    spark.sql(s"CREATE TABLE graft.`$rootY` PARTITIONED BY (years(ts)) " +
      "AS SELECT * FROM tp_m_src")
    val y = ManifestSink.ptimeSpec(spark, rootY, 1).get
    assert(y.fileOrds.values.toSet == Set(-1, 0, 54), s"got ${y.fileOrds}")
    // hours of a pre-1970 instant floor DOWNWARD (floorDiv, not
    // truncation): 1969-12-31T23:30 is hour -1
    val rootH = tmpDir("tpart_ph_") + "/t"
    spark.sql(s"CREATE TABLE graft.`$rootH` PARTITIONED BY (hours(ts)) " +
      "AS SELECT * FROM tp_m_src WHERE ts < TIMESTAMP '1970-01-01 01:00:00'")
    val h = ManifestSink.ptimeSpec(spark, rootH, 1).get
    assert(h.fileOrds.values.toSet == Set(-1, 0), s"got ${h.fileOrds}")
  }

  test("OPTIMIZE PARTITION BY re-lays a plain table; layouts swap, never stack") {
    ensureCatalog()
    val root = tmpDir("tpart_o_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-10"))
    ev.createOrReplaceTempView("tp_opt_src")
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM tp_opt_src")
    assert(ManifestSink.ptimeSpec(spark, root, 1).isEmpty)
    val row = spark.sql(s"OPTIMIZE graft.`$root` PARTITION BY days(ts)")
      .collect()(0)
    val e2 = row.getInt(1)
    val spec = ManifestSink.ptimeSpec(spark, root, e2)
    assert(spec.exists(s => s.col == "ts" && s.unit == "days"))
    assert(spark.table(s"graft.`$root`").count() == ev.count())
    // DESCRIBE DETAIL reports the layout slot as unit(col)
    assert(spark.sql(s"DESCRIBE DETAIL graft.`$root`")
      .collect()(0).getString(6) == "days(ts)")
    // the sidecar pins the layout: a future INSERT lays out the batch
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") >= lit("2024-01-10") && col("ts") < lit("2024-01-12"))
      .createOrReplaceTempView("tp_opt_b2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM tp_opt_b2")
    val e3 = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.ptimeSpec(spark, root, e3).isDefined,
      "INSERT after OPTIMIZE PARTITION BY must keep the layout")
    // re-bucketing hands the one layout slot over (no stacked sidecars)
    spark.sql(s"OPTIMIZE graft.`$root` BUCKET BY (event_id) BUCKETS 4")
    val e4 = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.bucketSpec(spark, root, e4).isDefined)
    assert(ManifestSink.ptimeSpec(spark, root, e4).isEmpty)
    // and the next insert must not trip the one-layout require
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM tp_opt_b2")
  }

  test("an over-target day fans out into MULTIPLE single-ordinal files; " +
    "pruning and SPJ survive") {
    ensureCatalog()
    val base = tmpDir("tpart_fan_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-04"))
    ev.createOrReplaceTempView("tp_fan_src")
    // a tiny target forces every day past ceil(bytes/target) = 1:
    // one task per FILE, never one straggler task per day
    spark.conf.set("spark.graft.write.targetFileSize", "512")
    try {
      spark.sql(s"CREATE TABLE graft.`$r1` PARTITIONED BY (days(ts)) " +
        "AS SELECT * FROM tp_fan_src")
      // ptimeSpec defined == every file verified single-ordinal
      val spec = ManifestSink.ptimeSpec(spark, r1, 1).get
      val perDay = spec.fileOrds.groupBy(_._2).map { case (o, fs) => o -> fs.size }
      assert(perDay.values.exists(_ > 1),
        s"an over-target day must commit multiple files, got $perDay")
      assert(spark.table(s"graft.`$r1`").count() == ev.count())
      // a one-day range scan plans exactly that day's files — no more
      val day0 = perDay.keys.min
      val dayFiles = perDay(day0)
      val lo = java.time.LocalDate.ofEpochDay(day0.toLong).toString
      val hi = java.time.LocalDate.ofEpochDay(day0.toLong + 1).toString
      val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` " +
        s"WHERE ts >= TIMESTAMP '$lo 00:00:00' AND ts < TIMESTAMP '$hi 00:00:00'")
        .collect()(0).getLong(0)
      assert(GraftTable.lastPlannedFiles == dayFiles,
        s"one-day scan must plan exactly the day's $dayFiles files, " +
          s"planned ${GraftTable.lastPlannedFiles}")
      assert(c == ev.filter(col("ts") >= lit(s"$lo 00:00:00") &&
        col("ts") < lit(s"$hi 00:00:00")).count())
      // SPJ still plans zero shuffles over the fanned-out layout
      ev.withColumn("value", col("value") * 2)
        .createOrReplaceTempView("tp_fan_b")
      spark.sql(s"CREATE TABLE graft.`$r2` PARTITIONED BY (days(ts)) " +
        "AS SELECT * FROM tp_fan_b")
      withSpjConfs {
        val out = spark.sql(
          s"""SELECT a.ts, a.value + b.value AS v
             |FROM graft.`$r1` a JOIN graft.`$r2` b ON a.ts = b.ts""".stripMargin)
        assert(out.count() >= ev.count())
        assert(shuffles(out).isEmpty,
          s"fanned-out same-layout join must stay shuffle-free:\n" +
            out.queryExecution.executedPlan)
      }
      // the bucket layout fans out under the same contract
      val r3 = s"$base/c"
      spark.sql(s"CREATE TABLE graft.`$r3` PARTITIONED BY (bucket(2, event_id)) " +
        "AS SELECT * FROM tp_fan_src")
      val bs = ManifestSink.bucketSpec(spark, r3, 1).get
      val perBucket = bs.fileBuckets.groupBy(_._2).map { case (b, fs) => b -> fs.size }
      assert(perBucket.values.exists(_ > 1),
        s"an over-target bucket must commit multiple files, got $perBucket")
      assert(spark.table(s"graft.`$r3`").count() == ev.count())
    } finally spark.conf.unset("spark.graft.write.targetFileSize")
  }

  test("var-width sizing: long strings drive the fanout estimate, not " +
    "the 20-byte schema default") {
    ensureCatalog()
    val root = tmpDir("tpart_vw_") + "/t"
    // 30 rows of ~2 KB text in one day = ~61 KB actual; the schema
    // default would call it ~840 bytes and plan ONE file at a 4 KB
    // target — the data-driven estimate must fan out
    val base = java.time.Instant.parse("2024-01-01T01:00:00Z").toEpochMilli
    (0 until 30).map(i => (("x" * 2048) + i.toString,
      new java.sql.Timestamp(base + i * 1000L)))
      .toDF("txt", "ts").createOrReplaceTempView("tp_vw_src")
    spark.conf.set("spark.graft.write.targetFileSize", "4096")
    try {
      spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(ts)) " +
        "AS SELECT * FROM tp_vw_src")
      val sp = ManifestSink.ptimeSpec(spark, root, 1).get
      assert(sp.fileOrds.size > 1,
        s"2 KB-string rows must fan out past a 4 KB target, got ${sp.fileOrds}")
      assert(sp.fileOrds.values.toSet.size == 1, "all files one ordinal")
      assert(spark.table(s"graft.`$root`").count() == 30)
    } finally spark.conf.unset("spark.graft.write.targetFileSize")
  }

  test("months/years ordinals stay UTC under a non-UTC session timezone " +
    "(write-side agrees with the V2 function SPJ compares with)") {
    ensureCatalog()
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      // 2024-03-01T00:30Z is 2024-02-29 16:30 in LA: a session-tz
      // year()/month() would commit ordinal 649 (Feb) while the UTC
      // V2 function says 650 (Mar) — a silent SPJ mismatch
      val instants = Seq("2024-03-01T00:30:00Z", "2024-01-01T00:30:00Z")
        .map(s => new java.sql.Timestamp(
          java.time.Instant.parse(s).toEpochMilli))
      instants.toDF("ts").createOrReplaceTempView("tp_tz_src")
      val root = tmpDir("tpart_tz_") + "/t"
      spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (months(ts)) " +
        "AS SELECT * FROM tp_tz_src")
      val m = ManifestSink.ptimeSpec(spark, root, 1).get
      assert(m.fileOrds.values.toSet == Set(650, 648),
        s"months ordinals must be UTC-derived, got ${m.fileOrds}")
      // and they equal what the catalog's bound function evaluates
      val fn = new graft.catalog.GraftTimeBound("months",
        org.apache.spark.sql.types.TimestampType)
      val expected = instants.map { t =>
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](t.getTime * 1000L))
        fn.produceResult(row).toInt
      }.toSet
      assert(m.fileOrds.values.toSet == expected)
      val rootY = tmpDir("tpart_tzy_") + "/t"
      spark.sql(s"CREATE TABLE graft.`$rootY` PARTITIONED BY (years(ts)) " +
        "AS SELECT * FROM tp_tz_src")
      assert(ManifestSink.ptimeSpec(spark, rootY, 1).get
        .fileOrds.values.toSet == Set(54),
        "years ordinal must be UTC-derived (2024 - 1970)")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("days(date_col) partitions DateType; refusals: null ts, layout-column DDL") {
    ensureCatalog()
    val root = tmpDir("tpart_d_") + "/t"
    Seq("2024-01-01", "2024-01-02", "2024-01-02", "2024-02-01")
      .map(java.sql.Date.valueOf)
      .toDF("d").createOrReplaceTempView("tp_d_src")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(d)) " +
      "AS SELECT * FROM tp_d_src")
    val spec = ManifestSink.ptimeSpec(spark, root, 1).get
    val epoch0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt
    assert(spec.fileOrds.values.toSet == Set(epoch0, epoch0 + 1, epoch0 + 31))
    // null partition values are rejected (the key-grouping contract)
    val rootN = tmpDir("tpart_n_") + "/t"
    Seq(Some("2024-01-01"), None).map(_.map(java.sql.Date.valueOf))
      .toDF("d").createOrReplaceTempView("tp_null_src")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$rootN` PARTITIONED BY (days(d)) " +
        "AS SELECT * FROM tp_null_src")
    }
    // the layout column refuses rename (the spec is declared by name)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN d TO d2")
    }
    // refused transform combinations: two buckets, two time
    // transforms, the THREE-way composition (any two transforms
    // compose — bucket+time, identity+bucket, identity+time — three
    // do not)
    val rootT = tmpDir("tpart_t_") + "/t"
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$rootT` (k BIGINT, j BIGINT, ts TIMESTAMP) " +
        "USING parquet PARTITIONED BY (bucket(4, k), bucket(4, j))")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$rootT` (k BIGINT, ts TIMESTAMP, t2 TIMESTAMP) " +
        "USING parquet PARTITIONED BY (days(ts), hours(t2))")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$rootT` (k BIGINT, j BIGINT, ts TIMESTAMP) " +
        "USING parquet PARTITIONED BY (k, days(ts), bucket(4, j))")
    }
  }

  test("composed spec days(ts) + bucket(n, id): intersected pruning, " +
    "pair SPJ, subset-key SPJ under a time filter") {
    ensureCatalog()
    val base = tmpDir("tpart_mx_")
    val (r1, r2) = (s"$base/a", s"$base/b")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-05"))
    ev.createOrReplaceTempView("tp_mx_src")
    spark.sql(s"CREATE TABLE graft.`$r1` " +
      "PARTITIONED BY (days(ts), bucket(4, user_id)) " +
      "AS SELECT * FROM tp_mx_src")
    // BOTH layouts committed and fully covering
    val bs = ManifestSink.bucketSpec(spark, r1, 1).get
    val ts = ManifestSink.ptimeSpec(spark, r1, 1).get
    assert(bs.keyCol == "user_id" && bs.numBuckets == 4)
    assert(ts.col == "ts" && ts.unit == "days")
    assert(bs.fileBuckets.keySet == ts.fileOrds.keySet)
    assert(spark.table(s"graft.`$r1`").count() == ev.count())
    // a (day, bucket) point query reads at most the INTERSECTED files
    // (day ordinal files ∩ the key's bucket files; user_id zone maps
    // may prune further within that set), never the whole day
    val day0 = ts.fileOrds.values.min
    val lo = java.time.LocalDate.ofEpochDay(day0.toLong).toString
    val hi = java.time.LocalDate.ofEpochDay(day0.toLong + 1).toString
    val dev = ev.filter(col("ts") < lit(s"$hi 00:00:00"))
      .select("user_id").head.getLong(0)
    val want = bs.fileBuckets.count { case (f, b) =>
      b == (dev % 4).toInt && ts.fileOrds(f) == day0 }
    val dayFiles = ts.fileOrds.count(_._2 == day0)
    val c = spark.sql(s"SELECT count(*) AS c FROM graft.`$r1` " +
      s"WHERE user_id = $dev AND ts >= TIMESTAMP '$lo 00:00:00' " +
      s"AND ts < TIMESTAMP '$hi 00:00:00'").collect()(0).getLong(0)
    assert(GraftTable.lastPlannedFiles >= 1 &&
      GraftTable.lastPlannedFiles <= want && want < dayFiles,
      s"(day, bucket) lookup must plan within the intersected $want files " +
        s"(day has $dayFiles), planned ${GraftTable.lastPlannedFiles}")
    assert(c == ev.filter(col("user_id") === dev &&
      col("ts") >= lit(s"$lo 00:00:00") && col("ts") < lit(s"$hi 00:00:00")).count())
    // INSERT INTO keeps the composed layout
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .filter(col("ts") >= lit("2024-01-05") && col("ts") < lit("2024-01-07"))
      .createOrReplaceTempView("tp_mx_b2")
    spark.sql(s"INSERT INTO graft.`$r1` SELECT * FROM tp_mx_b2")
    assert(ManifestSink.bucketSpec(spark, r1, 2).isDefined)
    assert(ManifestSink.ptimeSpec(spark, r1, 2).isDefined)
    // same-layout pair join (ts AND user_id) plans zero shuffles
    spark.sql(s"CREATE TABLE graft.`$r2` " +
      "PARTITIONED BY (days(ts), bucket(4, user_id)) " +
      "AS SELECT * FROM tp_mx_src")
    withSpjConfs {
      val out = spark.sql(
        s"""SELECT a.ts, a.value + b.value AS v
           |FROM graft.`$r2` a JOIN graft.`$r2` b
           |ON a.ts = b.ts AND a.user_id = b.user_id""".stripMargin)
      assert(out.count() >= ev.count())
      assert(shuffles(out).isEmpty,
        s"composed same-layout pair join must drop both shuffles:\n" +
          out.queryExecution.executedPlan)
      // subset-key SPJ: join on the bucket key alone under a time
      // filter still plans zero shuffles when Spark is allowed to
      // group on the join-key subset
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled",
        "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      try {
        // the partition column must SURVIVE into the join output:
        // column pruning that drops ts invalidates the days(ts)
        // expression at the projection and the grouping report dies
        // with it — selecting a.ts/b.ts keeps the subset-key SPJ alive
        val sub = spark.sql(
          s"""SELECT a.user_id, a.ts, b.ts AS ts2, a.value + b.value AS v
             |FROM graft.`$r2` a JOIN graft.`$r2` b
             |ON a.user_id = b.user_id
             |WHERE a.ts < TIMESTAMP '$hi 00:00:00'
             |  AND b.ts < TIMESTAMP '$hi 00:00:00'""".stripMargin)
        assert(sub.count() > 0)
        assert(shuffles(sub).isEmpty,
          s"subset-key SPJ must drop both shuffles:\n" +
            sub.queryExecution.executedPlan)
      } finally {
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled")
        spark.conf.unset("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      }
    }
    // OPTIMIZE ... PARTITION BY days(ts) BUCKET BY (k) BUCKETS n
    // re-lays a PLAIN table into the composed spec as one maintenance
    // epoch; subsequent INSERTs keep both transforms
    val r3 = s"$base/c"
    spark.sql(s"CREATE TABLE graft.`$r3` AS SELECT * FROM tp_mx_src")
    assert(ManifestSink.ptimeSpec(spark, r3, 1).isEmpty)
    val row = spark.sql(s"OPTIMIZE graft.`$r3` PARTITION BY days(ts) " +
      "BUCKET BY (user_id) BUCKETS 4").collect()(0)
    val e2 = row.getInt(1)
    assert(ManifestSink.ptimeSpec(spark, r3, e2).exists(_.unit == "days"))
    assert(ManifestSink.bucketSpec(spark, r3, e2).exists(_.numBuckets == 4))
    assert(spark.table(s"graft.`$r3`").count() == ev.count())
    assert(spark.sql(s"DESCRIBE DETAIL graft.`$r3`")
      .collect()(0).getString(6) == "days(ts),user_id:4")
    spark.sql(s"INSERT INTO graft.`$r3` SELECT * FROM tp_mx_b2")
    val e3 = ManifestSink.currentEpoch(spark, r3)
    assert(ManifestSink.ptimeSpec(spark, r3, e3).isDefined &&
      ManifestSink.bucketSpec(spark, r3, e3).isDefined,
      "an INSERT after the composed OPTIMIZE must keep both transforms")
    // COMPOSED single-write CoW (round 18): an UPDATE on the two-axis
    // table stages its replacement files through the declared-
    // distribution write — files nest TWO partition levels deep
    // (__p0=<ordinal>/__p1=<bucket>) in ONE attempt dir — and BOTH
    // specs survive with row parity
    val totalBefore = spark.table(s"graft.`$r3`").count()
    spark.sql(s"UPDATE graft.`$r3` SET value = -1.0 WHERE event_id < 15")
    val e4 = ManifestSink.currentEpoch(spark, r3)
    assert(ManifestSink.ptimeSpec(spark, r3, e4).isDefined &&
      ManifestSink.bucketSpec(spark, r3, e4).isDefined,
      "a CoW UPDATE must keep BOTH composed transforms")
    val repl = ManifestSink.manifestEntries(spark, r3, e4).map(_._1)
      .filter(_.startsWith(s"data-epoch=$e4-"))
    assert(repl.nonEmpty && repl.forall(r =>
      r.contains("/__p0=") && r.contains("/__p1=")),
      s"composed replacements must nest both partition levels, got $repl")
    assert(repl.map(_.split("/").head).distinct.size == 1,
      "exactly one staged attempt dir — no relay rewrite")
    assert(spark.table(s"graft.`$r3`").count() == totalBefore)
    assert(spark.table(s"graft.`$r3`")
      .filter(col("value") === -1.0).count() >= 14)
  }

  test("SET PARTITION SPEC evolves the spec METADATA-ONLY: old files " +
    "keep serving, new inserts lay out under the new spec, both " +
    "populations prune, zero rewrite epochs") {
    ensureCatalog()
    val root = tmpDir("tpart_ev_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    ev.filter(col("ts") < lit("2024-01-04")).createOrReplaceTempView("tp_ev1")
    spark.sql(s"CREATE TABLE graft.`$root` PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM tp_ev1")
    val days = ManifestSink.ptimeSpec(spark, root, 1).get
    // the evolution is PURE METADATA: the epoch does not move
    val out = spark.sql(
      s"ALTER TABLE graft.`$root` SET PARTITION SPEC (hours(ts))").collect()(0)
    assert(out.getString(1) == "hours(ts)")
    assert(ManifestSink.currentEpoch(spark, root) == 1,
      "spec evolution must commit zero epochs")
    assert(ManifestSink.ptimeSpec(spark, root, 1).contains(days),
      "committed files keep their own spec rows")
    // a new INSERT lays out under the NEW spec (hour-aligned files)
    ev.filter(col("ts") >= lit("2024-01-04") && col("ts") < lit("2024-01-04 06:00:00"))
      .createOrReplaceTempView("tp_ev2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM tp_ev2")
    assert(ManifestSink.currentEpoch(spark, root) == 2)
    // mixed specs: the whole-table layout report honestly degrades ...
    assert(ManifestSink.ptimeSpec(spark, root, 2).isEmpty,
      "mixed specs must not report a single layout")
    // ... but the per-file rows identify BOTH populations
    val specs = graft.sink.SnapshotCache.statRows(spark, root, 2).get
      .filter(_.getString(1).startsWith("__ptime:")).map(_.getString(1)).distinct
    assert(specs.toSet == Set("__ptime:ts:days", "__ptime:ts:hours"),
      s"got $specs")
    assert(spark.table(s"graft.`$root`").count() ==
      ev.filter(col("ts") < lit("2024-01-04 06:00:00")).count())
    // pruning bites on BOTH populations: an old-population day scan
    // plans ~that day's files; a new-population hour scan plans ~1
    spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' " +
      "AND ts < TIMESTAMP '2024-01-03 00:00:00'").collect()
    val total = ManifestSink.manifestFiles(spark, root, 2).size
    assert(GraftTable.lastPlannedFiles < total &&
      GraftTable.lastPlannedFiles <= days.fileOrds.count(_._2 ==
        java.time.LocalDate.of(2024, 1, 2).toEpochDay.toInt) + 1,
      s"old-population day scan must prune, planned " +
        s"${GraftTable.lastPlannedFiles} of $total")
    spark.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "WHERE ts >= TIMESTAMP '2024-01-04 02:00:00' " +
      "AND ts < TIMESTAMP '2024-01-04 03:00:00'").collect()
    assert(GraftTable.lastPlannedFiles <= 2,
      s"new-population hour scan must prune to the hour, planned " +
        s"${GraftTable.lastPlannedFiles}")
    // appends-only convergence: once every file carries ONE spec the
    // report returns — prove it with an OPTIMIZE re-lay
    spark.sql(s"OPTIMIZE graft.`$root` PARTITION BY hours(ts)")
    val e3 = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.ptimeSpec(spark, root, e3).exists(_.unit == "hours"))
    // refusals: unknown column, wrong type, identity+bucket mix
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` SET PARTITION SPEC (days(nope))")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` SET PARTITION SPEC (days(value))")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` " +
        "SET PARTITION SPEC (event_id, bucket(4, event_id))")
    }
    // the empty spec declares future writes unpartitioned
    assert(spark.sql(s"ALTER TABLE graft.`$root` SET PARTITION SPEC ()")
      .collect()(0).getString(1) == "unpartitioned")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM tp_ev2")
    assert(spark.table(s"graft.`$root`").count() ==
      ev.filter(col("ts") < lit("2024-01-04 06:00:00")).count() +
        ev.filter(col("ts") >= lit("2024-01-04") &&
          col("ts") < lit("2024-01-04 06:00:00")).count())
  }

  test("OPTIMIZE CONVERGE PARTITION SPEC re-lays ONLY the stale " +
    "population; the whole-table report returns at stale-fraction cost") {
    ensureCatalog()
    val root = tmpDir("tpart_cv_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    ev.filter(col("ts") < lit("2024-01-04")).createOrReplaceTempView("tp_cv1")
    // UNPARTITIONED CTAS — the population that will go stale
    spark.sql(s"CREATE TABLE graft.`$root` AS SELECT * FROM tp_cv1")
    spark.sql(s"ALTER TABLE graft.`$root` SET PARTITION SPEC (days(ts))")
    ev.filter(col("ts") >= lit("2024-01-04") && col("ts") < lit("2024-01-06"))
      .createOrReplaceTempView("tp_cv2")
    spark.sql(s"INSERT INTO graft.`$root` SELECT * FROM tp_cv2")
    val eMix = ManifestSink.currentEpoch(spark, root)
    assert(ManifestSink.ptimeSpec(spark, root, eMix).isEmpty,
      "a mixed-spec table honestly reports no whole-table layout")
    val entries = ManifestSink.manifestEntries(spark, root, eMix).map(_._1)
    val newPop = entries.filter(_.startsWith(s"data-epoch=$eMix-")).toSet
    val oldPop = entries.toSet -- newPop
    assert(oldPop.nonEmpty && newPop.nonEmpty)
    // converge: rewrite cost proportional to the STALE fraction only
    val res = spark.sql(s"OPTIMIZE graft.`$root` CONVERGE PARTITION SPEC")
      .collect()(0)
    assert(res.getInt(2) == oldPop.size,
      s"stale set must be exactly the old population, got $res")
    assert(res.getInt(3) == newPop.size)
    val eConv = ManifestSink.currentEpoch(spark, root)
    val after = ManifestSink.manifestEntries(spark, root, eConv)
      .map(_._1).toSet
    assert(newPop.subsetOf(after),
      "already-converged files must carry VERBATIM (pure metadata)")
    assert((after & oldPop).isEmpty, "the stale population fully rewrote")
    assert(ManifestSink.ptimeSpec(spark, root, eConv).isDefined,
      "one spec covers the manifest again — KeyGroupedPartitioning returns")
    assert(spark.table(s"graft.`$root`").count() ==
      ev.filter(col("ts") < lit("2024-01-06")).count(),
      "convergence preserves every row")
    // idempotent: a second converge is a ZERO-EPOCH no-op
    val res2 = spark.sql(s"OPTIMIZE graft.`$root` CONVERGE PARTITION SPEC")
      .collect()(0)
    assert(res2.getInt(2) == 0 && res2.getInt(1) == eConv)
    assert(ManifestSink.currentEpoch(spark, root) == eConv,
      "no-op convergence must not commit an epoch")
    // refusal: no declared spec to converge to
    val root2 = tmpDir("tpart_cv2_") + "/t"
    spark.sql(s"CREATE TABLE graft.`$root2` AS SELECT * FROM tp_cv1")
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE graft.`$root2` CONVERGE PARTITION SPEC").collect()
    }
    assert(e.getMessage.contains("SET PARTITION SPEC first"), e.getMessage)
  }

  test("mixed-spec tables: a scan pruned to the converged population " +
    "reports its layout, and two such scans join shuffle-free") {
    ensureCatalog()
    val base = tmpDir("tpart_mx_")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val old = ev.filter(col("ts") < lit("2024-01-04"))
    val neu = ev.filter(col("ts") >= lit("2024-01-04") &&
      col("ts") < lit("2024-01-07"))
    val roots = Seq(s"$base/a", s"$base/b").zipWithIndex.map { case (r, i) =>
      old.createOrReplaceTempView(s"tp_mx_o$i")
      neu.createOrReplaceTempView(s"tp_mx_n$i")
      // old population UNPARTITIONED, then evolve, then laid appends
      spark.sql(s"CREATE TABLE graft.`$r` AS SELECT * FROM tp_mx_o$i")
      spark.sql(s"ALTER TABLE graft.`$r` SET PARTITION SPEC (days(ts))")
      spark.sql(s"INSERT INTO graft.`$r` SELECT * FROM tp_mx_n$i")
      assert(ManifestSink.ptimeSpec(spark, r,
        ManifestSink.currentEpoch(spark, r)).isEmpty,
        "half-converged: no whole-table spec")
      r
    }
    withSpjConfs {
      // both sides prune to the CONVERGED population — the scans
      // report KeyGroupedPartitioning over exactly the planned files
      // and the join drops both shuffles without full convergence
      val out = spark.sql(
        s"""SELECT a.ts, a.value + b.value AS v
           |FROM graft.`${roots(0)}` a JOIN graft.`${roots(1)}` b
           |ON a.ts = b.ts
           |WHERE a.ts >= TIMESTAMP '2024-01-04 00:00:00'
           |AND b.ts >= TIMESTAMP '2024-01-04 00:00:00'""".stripMargin)
      assert(out.count() >= neu.count())
      assert(shuffles(out).isEmpty,
        "converged-population join on a mixed-spec table must drop " +
          s"both shuffles:\n${out.queryExecution.executedPlan}")
      // a scan that TOUCHES the stale population keeps the honest
      // no-layout report (shuffles stay)
      val across = spark.sql(
        s"""SELECT a.ts, a.value + b.value AS v
           |FROM graft.`${roots(0)}` a JOIN graft.`${roots(1)}` b
           |ON a.ts = b.ts""".stripMargin)
      assert(across.count() >= old.count() + neu.count())
      assert(shuffles(across).nonEmpty,
        "an unpruned mixed-spec scan must NOT claim key grouping")
    }
  }

  test("layout.maxKeys guard: a too-fine spec is refused loudly at the " +
    "sizing aggregate, never collected") {
    ensureCatalog()
    val root = tmpDir("tpart_cap_") + "/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
      .filter(col("ts") < lit("2024-01-03"))
    ev.createOrReplaceTempView("tp_cap_src")
    // 2 days x bucket(64) = up to 128 pairs; a cap of 16 must refuse
    spark.conf.set("spark.graft.layout.maxKeys", "16")
    try {
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$root` " +
          "PARTITIONED BY (hours(ts), bucket(64, event_id)) " +
          "AS SELECT * FROM tp_cap_src")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("layout.maxKeys")),
        s"refusal must name the cap, got: ${msgs(e)}")
      // under the default cap the same spec commits fine
      spark.conf.unset("spark.graft.layout.maxKeys")
      val root2 = tmpDir("tpart_cap2_") + "/t"
      spark.sql(s"CREATE TABLE graft.`$root2` " +
        "PARTITIONED BY (hours(ts), bucket(64, event_id)) " +
        "AS SELECT * FROM tp_cap_src")
      assert(spark.table(s"graft.`$root2`").count() == ev.count())
    } finally spark.conf.unset("spark.graft.layout.maxKeys")
  }
}
