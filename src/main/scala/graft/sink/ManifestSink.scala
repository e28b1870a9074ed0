package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish table commits — the manifest discipline the
  * lakehouse formats (Iceberg/Delta — public designs) use to make a
  * multi-file batch write ATOMIC on a store whose directory listings
  * are not transactional. The reference's sink writes rely on
  * Cassandra's per-row atomicity; a file-based 100 TB sink has no such
  * luxury: a writer that dies after 500 of 800 task files leaves a
  * directory that LISTS as half a table. The fix is indirection:
  *
  *   1. WRITE   — data files land under an epoch directory
  *                (`data-epoch=N/`, or an attempt-unique
  *                `data-epoch=N-aTOKEN/` on the concurrent-safe path);
  *                files are immutable once written.
  *   2. AUDIT   — the publisher lists exactly the files the Spark
  *                write produced (post-write listing of the staged
  *                dir: the committed task outputs) and, when zone maps
  *                are requested, computes per-file per-column min/max
  *                into a parquet stats table.
  *   3. PUBLISH — `manifest-N.TOKEN` (the file list) and
  *                `stats-N.TOKEN/` (the zone maps) are written FIRST,
  *                under an attempt-unique token so no concurrent
  *                attempt can clobber them; then ONE commit marker
  *                `commit-N` is created via rename-WITHOUT-overwrite —
  *                a compare-and-swap: the rename fails if the marker
  *                already exists, so exactly one attempt wins an epoch
  *                and the loser gets a retryable
  *                [[ManifestConflictException]], never a clobber.
  *
  * Readers resolve max(`commit-*`) -> winning token -> `manifest-N.T`
  * -> file list and read ONLY listed files: a crashed writer's
  * orphans, a concurrent in-flight epoch, a losing attempt's metadata,
  * or a stray temporary are all INVISIBLE until some later commit
  * lists them. Because the commit marker is created strictly AFTER the
  * manifest and stats of its token exist, there is no window in which
  * a reader can resolve an epoch whose metadata is missing (the
  * round-10 stats-after-flip hole is closed structurally, not by
  * ordering convention). Old epochs stay readable by pinning their
  * commit (time travel) until a retention sweep drops them — the same
  * lifecycle as the dedup epoch chain and the artifact cache.
  *
  * Exactly-once under replay: a commit may carry a [[Txn]]
  * (appId, version) — the Delta `txnAppId/txnVersion` discipline. A
  * foreachBatch sink records its batchId as the version;
  * [[commitIdempotentAppend]] no-ops when the version is already
  * committed, so Spark's at-least-once batch replay (crash between
  * sink commit and checkpoint commit) publishes each batch ONCE.
  * `vacuum` rolls dropped epochs' txn records into a `TXNS` file so
  * the idempotence memory survives retention.
  *
  * All I/O goes through the session's Hadoop conf, so the scheme
  * ports to HDFS/S3a stores unchanged. The CAS rename is atomic on
  * HDFS (server-side); on a raw local FS the existence check and
  * rename are two steps inside FileContext — adequate for the local
  * harness, and on object stores the marker creation swaps for a
  * conditional put (if-none-match), exactly as Iceberg's catalog
  * commit does.
  */
object ManifestSink {

  /** Transaction identity for idempotent commits (Delta's
    * txnAppId/txnVersion): a replayed (appId, version) is a no-op. */
  final case class Txn(appId: String, version: Long)

  /** A staged-but-uncommitted epoch attempt: data files written,
    * manifest lines audited, zone-map stats planned, table schema
    * captured (nullable-normalized, committed into the marker so
    * reads plan from metadata — see [[read]]). Invisible to readers
    * until [[commitStaged]] wins the epoch's commit marker.
    *
    * `sizes` (rel -> bytes, captured from the staging listStatus and
    * CARRIED verbatim for inherited files — files are immutable)
    * commit into the manifest lines (`rel\tsize`, the Delta
    * `add.size` discipline) so planning never pays a per-file
    * getFileStatus RPC: FileIndex construction, split planning, and
    * `sizeInBytes` all answer from metadata. */
  /** `dvs` is the ordered list of live delete-vector files
    * (relPath, keyColumn) — EPOCH-SCOPED (the Iceberg data-sequence-
    * number discipline): `dv-N.TOKEN` hides its keys only in data
    * files committed at epochs < N, so a key re-inserted AFTER its
    * deleteMor is visible again (no single-key-space contract).
    * `fileEpochs` (rel -> commit epoch, carried verbatim for inherited
    * files) is what scopes them; fresh files default to this staged
    * epoch. */
  final case class Staged(root: String, epoch: Int, token: String,
                          relFiles: Seq[String], stats: Option[DataFrame],
                          schemaJson: Option[String] = None,
                          dvs: Seq[(String, String)] = Nil,
                          sizes: Map[String, Long] = Map.empty,
                          fileEpochs: Map[String, Int] = Map.empty)

  /** Retryable: another attempt won this epoch's commit marker (or the
    * epoch is not above the current one). Re-read the current epoch
    * and retry against the next. */
  final class ManifestConflictException(root: String, epoch: Int, detail: String)
    extends RuntimeException(
      s"epoch $epoch at $root already committed or not ahead of current ($detail)")

  /** Another maintenance process holds the table's lease — retry after
    * it finishes (or after the stale-break TTL if it crashed). */
  final class MaintenanceLeaseException(root: String, detail: String)
    extends RuntimeException(s"maintenance lease at $root is held: $detail")

  /** MAINTENANCE LEASE — the commit discipline for operations that
    * DELETE rather than commit (vacuum): writers are already safe via
    * the per-epoch marker CAS, but two concurrent vacuums would race
    * each other's sweeps (double-delete, or one sweeping metadata the
    * other just decided to keep). The lease is the same CAS primitive
    * as the commit marker — rename-WITHOUT-overwrite of a token file —
    * held for the duration and released on exit. The holder HEARTBEATS
    * the lease (rewrites it every ttl/4), so `ttlMs` (default 1 h)
    * measures LIVENESS, not total runtime — a sweep longer than the
    * TTL keeps its lease. A crashed holder stops heartbeating; anyone
    * arriving after `ttlMs` of silence breaks the lease, retries once,
    * and re-verifies its own token afterwards (two breakers threading
    * the delete+recreate window resolve to exactly one verified
    * holder). SQL `VACUUM` runs under this automatically. */
  def withMaintLease[T](spark: SparkSession, root: String,
                        ttlMs: Long = 3600000L)(body: => T): T = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val lease = new org.apache.hadoop.fs.Path(rootPath, "maint-lease")
    val token = newToken()
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s"maint-lease.tmp.$token")
    writeFile(spark, tmp, s"token=$token\nts=${System.currentTimeMillis()}\n")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    def tryAcquire(): Boolean =
      try { fc.rename(tmp, lease); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.PathExistsException => false
      }
    var ok = tryAcquire()
    if (!ok) {
      val stale =
        try System.currentTimeMillis() -
          f.getFileStatus(lease).getModificationTime > ttlMs
        catch { case _: java.io.FileNotFoundException => true } // just released
      if (stale) { f.delete(lease, false); ok = tryAcquire() }
      if (ok) {
        // post-break verification (ADVICE r13): two breakers can
        // thread the delete+recreate window — breaker B may delete
        // OUR just-renamed lease and rename its own. Re-read the
        // lease: if it no longer carries our token, we lost.
        val held =
          try readLines(spark, lease).contains(s"token=$token")
          catch { case _: java.io.IOException => false }
        if (!held) ok = false
      }
    }
    if (!ok) {
      f.delete(tmp, false)
      throw new MaintenanceLeaseException(root,
        s"another maintenance process is live (stale-break after ${ttlMs} ms)")
    }
    // HEARTBEAT (ADVICE r13): the TTL must measure LIVENESS, not total
    // runtime — a legitimately long sweep (> ttl) refreshes the lease
    // mtime every ttl/4 so no breaker ever sees a live holder as
    // stale. The check-then-rewrite pair is NOT atomic (ADVICE r14): a
    // TTL-expired breaker can delete+recreate the lease between them,
    // after which our rewrite would stomp the new holder — so the
    // heartbeat RE-VERIFIES ownership AFTER the rewrite (the same
    // post-break discipline as acquire) and, on loss, flags the sweep
    // as no-longer-exclusive so it aborts loudly instead of returning
    // a result that raced another holder's deletes.
    val hbStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hb = new Thread(() => {
      val interval = math.max(1000L, ttlMs / 4)
      var live = true
      while (live && !hbStop.get()) {
        try Thread.sleep(interval) catch { case _: InterruptedException => live = false }
        if (live && !hbStop.get()) {
          val ours =
            try readLines(spark, lease).contains(s"token=$token")
            catch { case _: java.io.IOException => false }
          if (ours) {
            writeFile(spark, lease,
              s"token=$token\nts=${System.currentTimeMillis()}\n")
            // post-rewrite verification: if a breaker threaded the
            // check→rewrite window, whoever's token is now in the
            // lease wins; losing means BOTH were running — abort ours
            val still =
              try readLines(spark, lease).contains(s"token=$token")
              catch { case _: java.io.IOException => false }
            if (!still) { lost.set(true); live = false }
          } else { lost.set(true); live = false } // lost: stop touching it
        }
      }
    }, s"graft-maint-lease-heartbeat-$token")
    hb.setDaemon(true)
    hb.start()
    val result =
      try body finally {
        hbStop.set(true)
        hb.interrupt()
        // delete only OUR lease — after a loss the file is the new
        // holder's and must stay
        if (!lost.get()) {
          val stillOurs =
            try readLines(spark, lease).contains(s"token=$token")
            catch { case _: java.io.IOException => false }
          if (stillOurs) f.delete(lease, false)
        }
      }
    if (lost.get())
      throw new MaintenanceLeaseException(root,
        "lease ownership was lost to a stale-break during the sweep; " +
          "its results may have raced the new holder — re-run maintenance")
    result
  }

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def newToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Committed (rel -> size) pairs of known size (legacy -1 entries
    * drop out and stay RPC-resolved on read). */
  private def knownSizes(entries: Seq[(String, Long, Int)]): Map[String, Long] =
    entries.collect { case (r, s, _) if s >= 0 => r -> s }.toMap

  /** Committed (rel -> commit epoch) pairs (legacy -1 entries drop
    * out; readers treat an unknown epoch as 0 — every DV applies, the
    * pre-scoping conservative semantics). */
  private def knownEpochs(entries: Seq[(String, Long, Int)]): Map[String, Int] =
    entries.collect { case (r, _, e) if e >= 0 => r -> e }.toMap

  private def writeFile(spark: SparkSession, p: org.apache.hadoop.fs.Path,
                        content: String): Unit = {
    val out = fs(spark, p).create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readLines(spark: SparkSession, p: org.apache.hadoop.fs.Path): List[String] = {
    val in = fs(spark, p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  // ------------------------------------------------- snapshot-cache raw reads
  // (the ONLY uncached metadata reads — SnapshotCache loads through
  // these once per (root, epoch, token) and every planning path serves
  // from memory; see graft.sink.SnapshotCache)

  private[sink] def readCommitMarker(spark: SparkSession, root: String,
                                     epoch: Int): List[String] =
    readLines(spark, new org.apache.hadoop.fs.Path(s"$root/commit-$epoch"))

  /** Manifest lines parsed to (rel, size, commitEpoch); size/epoch -1
    * for manifests written before each field landed (readers fall back
    * to one getFileStatus for missing sizes, and treat a missing epoch
    * as 0 — every DV applies). */
  private[sink] def readManifestLines(spark: SparkSession, root: String,
                                      epoch: Int, token: String): Seq[(String, Long, Int)] =
    readLines(spark,
      new org.apache.hadoop.fs.Path(s"$root/manifest-$epoch.$token")).map { l =>
      l.split('\t') match {
        case Array(r) => (r, -1L, -1)
        case Array(r, s) => (r, s.toLong, -1)
        case Array(r, s, e) => (r, s.toLong, e.toInt)
        case other => throw new IllegalStateException(
          s"malformed manifest line (${other.length} fields): $l")
      }
    }

  private[sink] def statsExistsFor(spark: SparkSession, root: String,
                                   epoch: Int, token: String): Boolean =
    fs(spark, new org.apache.hadoop.fs.Path(root))
      .exists(new org.apache.hadoop.fs.Path(s"$root/stats-$epoch.$token"))

  // ---------------------------------------------------------------- write path

  /** Stage `df` as epoch `epoch`: write the data files, audit the file
    * list, plan the zone-map stats. Nothing is visible to readers.
    * `unique = true` stages into an attempt-unique directory
    * (`data-epoch=N-aTOKEN/`) so two concurrent publishers racing for
    * the same epoch cannot clobber each other's DATA either — the
    * loser's directory becomes vacuum-swept dead weight. The default
    * shared directory (`data-epoch=N/`) is the single-writer
    * convenience every registered row uses. */
  def stage(df: DataFrame, root: String, epoch: Int,
            statsCols: Seq[String] = Nil, unique: Boolean = false,
            dictCols: Seq[String] = Nil, dictCap: Int = 256,
            bloomCols: Seq[String] = Nil, bloomBits: Int = 16384,
            bloomHashes: Int = 5, bucket: Option[(String, Int)] = None,
            hllCols: Seq[String] = Nil,
            ptime: Option[(String, String)] = None,
            tokenOpt: Option[String] = None,
            ident: Option[(String, Option[Int])] = None): Staged = {
    val spark = df.sparkSession
    // a caller-supplied token makes a SERIES of stages one sweepable /
    // exemptable unit (branch refs: every stage dir carries the
    // branch's token); only meaningful with unique = true
    val token = tokenOpt.getOrElse(newToken())
    val dirName = if (unique) s"data-epoch=$epoch-a$token" else s"data-epoch=$epoch"
    val epochDir = s"$root/$dirName"
    require(ident.isEmpty || bucket.isEmpty || ptime.isEmpty,
      "a partition spec composes at most TWO transforms; identity + " +
        "bucket + time is not supported")
    val laid = (bucket, ptime, ident) match {
      case (Some((k, n)), Some((c, u)), None) => composedLayout(df, c, u, k, n)
      case (Some((k, n)), None, None) => bucketLayout(df, k, n)
      case (None, Some((c, u)), None) => timeLayout(df, c, u)
      case (None, None, Some((c, w))) => identLayout(df, c, w)
      case (Some((k, n)), None, Some((c, w))) =>
        identPairLayout(df, c, w, bucketIdCol(k, n), k, sortIdentFirst = true)
      case (None, Some((tc, u)), Some((c, w))) =>
        identPairLayout(df, c, w,
          timeOrdCol(org.apache.spark.sql.functions.col(tc),
            df.schema(tc).dataType, u), tc, sortIdentFirst = false)
      case _ => df
    }
    laid.write.mode("overwrite").parquet(epochDir)
    val dirPath = new org.apache.hadoop.fs.Path(epochDir)
    // the staging listStatus already holds each file's size — capture
    // it here (the only place it is free) and commit it in the
    // manifest lines
    val listed = fs(spark, dirPath).listStatus(dirPath).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    val sizes = listed.map(s => s"$dirName/${s.getPath.getName}" -> s.getLen).toMap
    val relFiles = sizes.keys.toSeq.sorted
    val zoneOnly = dictCols.isEmpty && bloomCols.isEmpty && bucket.isEmpty &&
      hllCols.isEmpty && ptime.isEmpty && ident.isEmpty
    val stats =
      if (statsCols.isEmpty && zoneOnly) None
      else if (relFiles.isEmpty) Some(emptyStats(spark))
      // zone-only commits keep the LAZY builder (zero extra jobs — the
      // rows compute inside the commit's stats write); anything with a
      // second flavor fuses every flavor into one pass
      else if (zoneOnly) Some(zoneStats(spark, root, relFiles, statsCols))
      else fusedStats(spark, root, relFiles, statsCols, dictCols, dictCap,
        bloomCols, bloomBits, bloomHashes, bucket, ptime, ident, hllCols)
    Staged(root, epoch, token, relFiles, stats,
      Some(asNullable(df.schema).json), sizes = sizes)
  }

  /** Stage an APPEND: epoch N's file list = epoch N-1's PLUS the new
    * batch's — the snapshot-append every lakehouse format builds on.
    * Data files are written ONCE and shared across all later
    * manifests; a batch append costs O(batch) data I/O + O(table
    * files) metadata, never a table rewrite. Zone-map stats compose
    * the same way: prior epoch's rows union the fresh files' rows, so
    * a streamed table keeps its data-skipping property at O(batch)
    * stats work per commit. */
  def stageAppend(df: DataFrame, root: String, epoch: Int,
                  statsCols: Seq[String] = Nil, unique: Boolean = false,
                  evolve: Boolean = false,
                  bucket: Option[(String, Int)] = None,
                  hllCols: Seq[String] = Nil,
                  ptime: Option[(String, String)] = None,
                  ident: Option[(String, Option[Int])] = None): Staged = {
    val spark = df.sparkSession
    // mapped tables: the logical batch renames to the files' PHYSICAL
    // shape before the write; stats/hll columns follow (they key the
    // committed metadata, which is physical throughout)
    val priorSchemaOpt =
      if (epoch <= 1) None else commitSchema(spark, root, epoch - 1)
    val mapping = priorSchemaOpt.filter(ColumnMapping.hasMapping)
    val (dfW, statsW, hllW) = mapping match {
      case Some(p) =>
        require(!evolve, "schema-evolving appends on a column-mapped " +
          "table are not supported; ALTER TABLE ADD COLUMNS first, " +
          "then append the full shape")
        val phys = ColumnMapping.physOf(p)
        (ColumnMapping.toPhysicalDf(df, p),
          statsCols.map(c => phys.getOrElse(c, c)),
          hllCols.map(c => phys.getOrElse(c, c)))
      case None => (df, statsCols, hllCols)
    }
    val fresh = stage(dfW, root, epoch, statsW, unique, bucket = bucket,
      hllCols = hllW, ptime = ptime, ident = ident)
    if (epoch <= 1) fresh
    else {
      val priorEntries = manifestEntries3(spark, root, epoch - 1)
      val prior = priorEntries.map(_._1)
      val stats =
        if (statsCols.isEmpty && bucket.isEmpty && hllCols.isEmpty &&
          ptime.isEmpty && ident.isEmpty) None
        else Some(statsTable(spark, root, epoch - 1)
          .unionByName(fresh.stats.get))
      // schema discipline (Delta's): a plain append REJECTS drift — a
      // producer silently widening a 100 TB table is a contract
      // breach, not a convenience; `evolve` merges (add-column only,
      // same-name type conflicts rejected) and commits the union
      val schemaJson = priorSchemaOpt match {
        case None => fresh.schemaJson // pre-schema-metadata table
        case Some(p) =>
          val cmp = mapping.map(ColumnMapping.physicalSchema).getOrElse(p)
          val n = asNullable(dfW.schema)
          if (evolve) Some(mergeSchemas(p, n).json)
          else {
            require(cmp.fields.map(f => (f.name, f.dataType)).toSet ==
                    n.fields.map(f => (f.name, f.dataType)).toSet,
              s"append schema drift (use evolve): table ${cmp.simpleString} " +
                s"vs batch ${n.simpleString}")
            Some(p.json)
          }
      }
      fresh.copy(relFiles = (prior ++ fresh.relFiles).sorted, stats = stats,
        schemaJson = schemaJson,
        // live DVs keep applying to the carried files (their scopes
        // predate this epoch, so the APPENDED files are exempt — a
        // re-inserted key is visible, the epoch-scoping contract)
        dvs = commitDvs(spark, root, epoch - 1),
        // carried files keep their committed sizes and epochs (files
        // are immutable); unknown (-1) legacy entries stay unknown
        sizes = fresh.sizes ++
          priorEntries.collect { case (r, s, _) if s >= 0 => r -> s },
        fileEpochs = knownEpochs(priorEntries))
    }
  }

  /** Add-column schema merge: prior fields keep their order and types
    * (same-name type conflicts are rejected — this is evolution, not
    * migration); genuinely new fields append after them. */
  private def mergeSchemas(prior: org.apache.spark.sql.types.StructType,
                           next: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val byName = next.fields.map(f => f.name -> f).toMap
    prior.fields.foreach { f =>
      byName.get(f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"schema evolution type conflict on ${f.name}: ${f.dataType} vs ${g.dataType}")
      }
    }
    org.apache.spark.sql.types.StructType(
      prior.fields ++ next.fields.filterNot(f => prior.fieldNames.contains(f.name)))
  }

  /** Nullable-normalize for the committed schema: evolved reads fill
    * absent columns of old files with null, so every field must admit
    * it (the Delta normalization). */
  private[graft] def asNullable(dt: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def loop(t: DataType): DataType = t match {
      case s: StructType =>
        StructType(s.fields.map(f =>
          f.copy(dataType = loop(f.dataType), nullable = true)))
      case a: ArrayType => a.copy(elementType = loop(a.elementType), containsNull = true)
      case m: MapType => m.copy(valueType = loop(m.valueType), valueContainsNull = true)
      case other => other
    }
    loop(dt).asInstanceOf[StructType]
  }

  /** PUBLISH a staged epoch: write the attempt's manifest and stats
    * (token-unique — un-clobberable), then compare-and-swap the commit
    * marker. Epochs are monotonic: committing at or below the current
    * epoch conflicts, which keeps max(commit-*) == newest table state
    * and makes vacuum's epoch-bounded orphan sweep sound (an
    * uncommitted staging at or below the current epoch can never
    * commit later). Returns the manifest's file count. */
  def commitStaged(spark: SparkSession, staged: Staged,
                   txn: Option[Txn] = None): Int = {
    val rootPath = new org.apache.hadoop.fs.Path(staged.root)
    val f = fs(spark, rootPath)
    if (currentEpochOpt(spark, staged.root).exists(_ >= staged.epoch))
      throw new ManifestConflictException(staged.root, staged.epoch,
        "current epoch is not below the staged epoch")
    val manifest = new org.apache.hadoop.fs.Path(rootPath,
      s"manifest-${staged.epoch}.${staged.token}")
    // manifest lines carry the file SIZE (`rel\tsize\tepoch`, Delta's
    // add.size + Iceberg's data sequence number): planning builds
    // FileStatuses from metadata — zero per-file RPCs — and the commit
    // epoch scopes delete vectors (a DV hides keys only in OLDER
    // files). Carried files keep their epochs; fresh ones get this one.
    writeFile(spark, manifest, staged.relFiles.map { r =>
      val e = staged.fileEpochs.getOrElse(r, staged.epoch)
      staged.sizes.get(r).map(s => s"$r\t$s\t$e").getOrElse(r)
    }.mkString("\n") + "\n")
    staged.stats.foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(s"${staged.root}/stats-${staged.epoch}.${staged.token}"))
    // CAS: rename WITHOUT overwrite — fails iff another attempt won
    val content = s"token=${staged.token}\n" +
      txn.map(t => s"txn=${t.appId}:${t.version}\n").getOrElse("") +
      staged.schemaJson.map(s => s"schema=$s\n").getOrElse("") +
      staged.dvs.map { case (rel, k) => s"dv=$rel:$k\n" }.mkString
    val tmp = new org.apache.hadoop.fs.Path(rootPath,
      s"commit-${staged.epoch}.tmp.${staged.token}")
    writeFile(spark, tmp, content)
    val marker = new org.apache.hadoop.fs.Path(rootPath, s"commit-${staged.epoch}")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    // deterministic-race seam (the GraftTable raceHook discipline):
    // fired ONCE, self-clearing, between the attempt's metadata writes
    // and its CAS — a spec can land a racing epoch exactly inside the
    // loser-cleanup window
    commitCasRaceHook.foreach { h => commitCasRaceHook = None; h() }
    try fc.rename(tmp, marker)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.PathExistsException =>
        // loser cleanup: this attempt's metadata can never be read.
        // EXEMPT a live WAP stage's stats parquet (ADVICE r15, the
        // vacuum exemption mirrored): stats-<e>.<token> here may BE
        // the durable stats a `_WAP/<id>` descriptor references — a
        // publish that loses this CAS and then fails its rebase must
        // leave the stage re-publishable from any session, not
        // permanently voided (stats=true but the parquet gone)
        f.delete(tmp, false)
        f.delete(manifest, false)
        val wapLive = liveWapStages(spark, staged.root).exists { case (_, e, t) =>
          e == staged.epoch && t == staged.token } ||
          liveBranchStages(spark, staged.root).exists(_._3 == staged.token)
        if (!wapLive)
          f.delete(new org.apache.hadoop.fs.Path(rootPath,
            s"stats-${staged.epoch}.${staged.token}"), true)
        throw new ManifestConflictException(staged.root, staged.epoch,
          s"commit marker exists; losing token ${staged.token}")
    }
    staged.relFiles.size
  }

  /** Publish `df` as epoch `epoch` of the table at `root`. Returns the
    * number of data files committed to the manifest. */
  def publish(df: DataFrame, root: String, epoch: Int,
              txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession, stage(df, root, epoch), txn)

  /** APPEND-publish (see [[stageAppend]] for the economics). */
  def publishAppend(df: DataFrame, root: String, epoch: Int,
                    txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession, stageAppend(df, root, epoch), txn)

  /** SCHEMA-EVOLVING append (Delta's mergeSchema): the batch may ADD
    * columns; the committed table schema becomes the union, and reads
    * of any epoch plan under that epoch's committed schema, filling
    * the added columns of pre-evolution files with null — a pure
    * metadata change, no file is rewritten. Time travel to a
    * pre-evolution epoch still reads the old shape: each commit pins
    * its own schema. */
  def publishAppendEvolve(df: DataFrame, root: String, epoch: Int,
                          statsCols: Seq[String] = Nil,
                          txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stageAppend(df, root, epoch, statsCols, evolve = true), txn)

  /** Publish with per-file ZONE MAPS (the Iceberg/Delta data-skipping
    * core): alongside the manifest, a parquet stats table records each
    * data file's (min, max) for EVERY column in `statsCols` (integral
    * or string), computed in ONE pass over the just-written epoch
    * (grouped by `input_file_name`). A range read then prunes the file
    * LIST before any scan is planned — the manifest is a coarse
    * secondary index, complementing row-group stats (which prune only
    * after a file is opened). Callers cluster the write on the primary
    * stats column (`repartitionByRange` + sort) so file ranges are
    * disjoint and pruning actually bites. The stats live as parquet —
    * itself prunable and mergeable — not a driver-parsed text sidecar,
    * so planning stays sub-linear as the file count grows. */
  def publishWithStats(df: DataFrame, root: String, epoch: Int,
                       statsCols: Seq[String], txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession, stage(df, root, epoch, statsCols), txn)

  /** APPEND-publish with zone maps (see [[stageAppend]]). */
  def publishAppendWithStats(df: DataFrame, root: String, epoch: Int,
                             statsCols: Seq[String], txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession, stageAppend(df, root, epoch, statsCols), txn)

  /** Publish with zone maps AND file dictionaries (see [[dictStats]]):
    * `dictCols` get per-file complete distinct-value sets for
    * point-lookup skipping, alongside `statsCols`' min/max ranges. */
  def publishWithDict(df: DataFrame, root: String, epoch: Int,
                      statsCols: Seq[String], dictCols: Seq[String],
                      dictCap: Int = 256, txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stage(df, root, epoch, statsCols, unique = false, dictCols, dictCap), txn)

  // ------------------------------------------------------------- bucketed layout

  /** A committed BUCKETED layout (the Iceberg `bucket(n, col)`
    * partition-transform analog): every data file holds exactly one
    * bucket of `floorMod(key, numBuckets)`, recorded per file in the
    * stats table (`__bucket:<col>:<n>` rows, lo == hi == the file's
    * bucket id). `fileBuckets` maps each manifest rel path to its
    * bucket. The spec is what lets the catalog scan report
    * `KeyGroupedPartitioning` and plan STORAGE-PARTITIONED JOINS —
    * two graft tables bucketed the same way join with ZERO shuffle
    * on either side (see [[graft.catalog.GraftFileScan]]). */
  final case class BucketSpec(keyCol: String, numBuckets: Int,
                              fileBuckets: Map[String, Int])

  /** floorMod(key, n) — the bucket id expression. Kept in exact
    * agreement with [[graft.catalog.GraftBucketBound.produceResult]]
    * (the V2 function form Spark compares join sides with): the
    * write-side placement and the declared transform MUST be the
    * same function or co-partitioning would silently lie. */
  private def bucketIdCol(keyCol: String, n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    pmod(col(keyCol).cast(LongType), lit(n.toLong)).cast(IntegerType)
  }

  /** Lay `df` out so each output FILE holds exactly one bucket of
    * floorMod(key, n), fanning an over-[[targetFileSize]] bucket out
    * across several salted single-bucket files (see [[placeByKey]]
    * for the whole placement discipline — the identity partitioner,
    * the null rejection, the salt). */
  private def bucketLayout(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(n > 0, s"numBuckets must be positive; got $n")
    val kt = df.schema(keyCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(kt),
      s"bucketed layout needs an integral key; $keyCol is $kt")
    val withK = df
      .withColumn("__k", bucketIdCol(keyCol, n).cast(LongType))
      .withColumn("__s", xxhash64(col(keyCol)))
    placeByKey(withK, Seq(keyCol), s"bucketed layout: null bucket key $keyCol")
  }

  /** Target data-file size for layout writes (Iceberg's
    * `write.target-file-size-bytes`): a layout partition whose
    * estimated bytes exceed this is SPLIT across that many salted
    * sub-files instead of funneling through one task. */
  def targetFileSize(spark: SparkSession): Long =
    spark.sessionState.conf
      .getConfString("spark.graft.write.targetFileSize",
        (128L * 1024 * 1024).toString).toLong

  /** Distinct-key cap for layout writes
    * (`spark.graft.layout.maxKeys`, default 100k): the placement index
    * is DRIVER-RESIDENT — one (key, bytes) row per distinct layout key,
    * the same enumeration an Iceberg manifest makes — so a pathological
    * composed spec (`hours(ts), bucket(4096)` over years) must fail
    * loudly at the sizing aggregate instead of silently collecting
    * millions of rows and broadcasting a matching index to every task.
    * The refusal names the spec knobs to coarsen (a wider time unit,
    * fewer buckets). */
  def layoutMaxKeys(spark: SparkSession): Int =
    spark.sessionState.conf
      .getConfString("spark.graft.layout.maxKeys", "100000").toInt

  /** The layout placer shared by [[bucketLayout]]/[[timeLayout]] (and
    * their composition): `withK`'s last two columns are `__k` (the
    * LongType layout key — bucket id, time ordinal, or a packed pair)
    * and `__s` (a LongType row salt). Every output partition holds
    * exactly ONE layout key — the single-key-per-file contract the
    * stats rows verify — but a key whose estimated bytes exceed
    * [[targetFileSize]] fans out into `ceil(bytes/target)` salted
    * sub-partitions, so one task writes one BOUNDED file: a 100×
    * `CREATE TABLE ... PARTITIONED BY (days(ts)) AS SELECT` over a
    * year never plans 365 straggler tasks each sorting a whole day
    * into a single 300 GB parquet (the manifest has always supported
    * many files per key — appends produce them). The key set is
    * collected with its SIZES in ONE bounded aggregate (result rows =
    * distinct keys, never data-sized — Iceberg manifests enumerate
    * partition values the same way); the byte estimate is data-driven
    * for var-width columns (actual string/binary octet lengths,
    * actual array element counts) and schema-width for fixed ones —
    * see the inline note. The salt hashes the layout
    * column's VALUE — it spreads volume across a partition's many
    * values; a single pathologically hot value still co-locates (as
    * it must: sorting keeps zone maps tight). Placement itself uses
    * an explicit identity [[org.apache.spark.Partitioner]] (Spark's
    * `repartition(n, expr)` re-hashes and can fold two keys into one
    * partition; `repartitionByRange` boundaries are sample-estimated)
    * — the one case where dropping to the RDD layer is the correct
    * tool: a deterministic partition-index contract the declarative
    * API cannot state. Rows sort by `sortCols` within each partition
    * so zone maps stay tight. Null keys are rejected: a null's
    * transform value is null, and a row placed in any numbered
    * partition would break the key-grouping contract SPJ plans
    * against. */
  private def placeByKey(withK: DataFrame, sortCols: Seq[String],
                         nullMsg: => String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit,
      octet_length, size, sum}
    import org.apache.spark.sql.types._
    val spark = withK.sparkSession
    val schema = withK.schema
    val kIdx = schema.length - 2
    val sIdx = schema.length - 1
    // per-key byte estimate, DATA-DRIVEN for var-width columns (one
    // sizing aggregate either way): strings/binaries sum their actual
    // octet lengths and primitive arrays their actual element counts —
    // schema default widths alone would count a 5 KB document as 20
    // bytes and under-split a text corpus ~250×, exactly the workload
    // the fanout exists for. Fixed-width columns ride the schema
    // width (an overestimate vs parquet encoding — sizing errs toward
    // more, smaller files rather than stragglers).
    val dataFields = schema.fields.dropRight(2)
    def varWidth(f: StructField): Option[org.apache.spark.sql.Column] =
      f.dataType match {
        case StringType | BinaryType =>
          Some(coalesce(octet_length(col(f.name)).cast(LongType), lit(0L)))
        case ArrayType(e, _) if e.defaultSize > 0 && (e match {
          case _: NumericType | BooleanType => true; case _ => false }) =>
          Some(coalesce(size(col(f.name)).cast(LongType), lit(0L)) *
            lit(e.defaultSize.toLong))
        case _ => None
      }
    val varExprs = dataFields.toSeq.flatMap(varWidth)
    val fixedWidth = math.max(1L, dataFields.filter(varWidth(_).isEmpty)
      .map(_.dataType.defaultSize.toLong).sum)
    val bytesExpr =
      (count(lit(1)) * lit(fixedWidth) +: varExprs.map(sum))
        .reduce(_ + _).as("__bytes")
    // guarded collect: the aggregate runs distributed either way, but
    // only maxKeys+1 rows may reach the driver — one row past the cap
    // proves the spec is too fine without materializing the rest
    val maxKeys = layoutMaxKeys(spark)
    val counts = withK.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), bytesExpr)
      .limit(maxKeys + 1).collect()
    require(counts.length <= maxKeys,
      s"layout would exceed spark.graft.layout.maxKeys=$maxKeys distinct " +
        "partition keys (the placement index and the manifest's layout " +
        "rows are per-key); coarsen the spec — a wider time unit, fewer " +
        "buckets — or raise the cap")
    counts.foreach(r => require(!r.isNullAt(0), nullMsg))
    if (counts.isEmpty) return withK.drop("__k", "__s")
    val target = math.max(1L, targetFileSize(spark))
    val keys = counts.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val splits = keys.map { case (_, bytes) =>
      math.max(1L, (bytes + target - 1) / target).toInt }
    val offsets = splits.scanLeft(0)(_ + _)
    val index: Map[Long, (Int, Int)] =
      keys.map(_._1).zipWithIndex.map { case (k, i) =>
        k -> ((offsets(i), splits(i))) }.toMap
    val bIndex = spark.sparkContext.broadcast(index)
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = offsets.last
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    val placed = withK.rdd.map { r =>
      if (r.isNullAt(kIdx)) throw new IllegalArgumentException(nullMsg)
      val (off, ns) = bIndex.value(r.getLong(kIdx))
      (off + java.lang.Math.floorMod(r.getLong(sIdx), ns.toLong).toInt, r)
    }.partitionBy(part).values
    spark.createDataFrame(placed, schema)
      .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .drop("__k", "__s")
  }


  /** Per-file HLL NDV SKETCHES (the Iceberg puffin-file ndv idea at
    * the manifest level): one `__hll:<col>` row per (file, column)
    * carrying the hex-serialized datasketches HLL of the column's
    * values, plus a `__nulls:<col>` row with the file's null count.
    * Sketches are MERGEABLE, so planning-time column statistics
    * (distinct count, null count) for ANY file subset cost a
    * driver-side union of the surviving files' sketches — never a
    * data scan. The catalog scan feeds these to Spark's V2 column
    * statistics ([[graft.catalog.GraftFileScan.estimateStatistics]]),
    * which is what the cost-based optimizer's join estimates eat.
    * Computed with Spark's own `hll_sketch_agg` (lgConfigK 12 — the
    * union side must match); timestamps/dates sketch their long form
    * so write and probe agree with the zone-map encoding. */
  private def hllStats(spark: SparkSession, root: String,
                       relFiles: Seq[String], cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(relFiles.map(r => s"$root/$r"): _*)
    val schema = df.schema
    val rel = relUnderRoot(root)
    val aggs = cols.flatMap { c =>
      val in = schema(c).dataType match {
        case StringType | LongType | IntegerType => col(c)
        case ShortType | ByteType => col(c).cast(IntegerType)
        case TimestampType | TimestampNTZType | DateType =>
          statLongExpr(col(c), schema(c).dataType)
        case other => throw new IllegalArgumentException(
          s"hll sketches support integral, string, timestamp, and date " +
            s"columns; $c is $other")
      }
      Seq(hex(hll_sketch_agg(in)).as(s"__h_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"))
    }
    val base = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      base.select(rel.as("file"), lit(s"__hll:$c").as("col"),
        lit(null).cast(LongType).as("lo_long"),
        lit(null).cast(LongType).as("hi_long"),
        col(s"__h_$c").as("lo_str"),
        lit(null).cast(StringType).as("hi_str"))
        .unionByName(base.select(rel.as("file"), lit(s"__nulls:$c").as("col"),
          col(s"__n_$c").cast(LongType).as("lo_long"),
          lit(null).cast(LongType).as("hi_long"),
          lit(null).cast(StringType).as("lo_str"),
          lit(null).cast(StringType).as("hi_str")))
    }.reduce(_ unionByName _)
  }

  /** `ANALYZE`-time NDV statistics (Iceberg's puffin discipline —
    * sketches are a MAINTENANCE artifact, never a per-write tax): one
    * distributed pass over the CURRENT epoch's files computes
    * per-file HLL + null-count rows for every eligible column, and a
    * new epoch commits the same manifest with the enriched stats
    * (prior `__hll:`/`__nulls:` rows replaced; everything else —
    * files, schema, DV — carried). Appends after an ANALYZE keep the
    * analyzed files' sketches and simply lack rows for the new files,
    * which the scan-side coverage check detects: column statistics
    * come back after the next ANALYZE, never wrong in between.
    * Returns the new epoch. */
  def analyzeNdv(spark: SparkSession, root: String): Int = {
    import org.apache.spark.sql.types._
    val cur = currentEpoch(spark, root)
    val entries = manifestEntries3(spark, root, cur)
    val relFiles = entries.map(_._1).sorted
    val schema = commitSchema(spark, root, cur)
      .getOrElse(read(spark, root, cur).schema)
    val cols = schema.fields.toSeq.collect {
      case f if Seq(LongType, IntegerType, ShortType, ByteType, StringType,
        TimestampType, TimestampNTZType, DateType).contains(f.dataType) => f.name
    }
    require(cols.nonEmpty, s"ANALYZE $root: no sketchable columns in " +
      schema.simpleString)
    val prior =
      if (statsExists(spark, root, cur))
        statsTable(spark, root, cur).filter(
          !org.apache.spark.sql.functions.col("col").startsWith("__hll:") &&
          !org.apache.spark.sql.functions.col("col").startsWith("__nulls:"))
      else emptyStats(spark)
    val fresh =
      if (relFiles.isEmpty) emptyStats(spark)
      else hllStats(spark, root, relFiles, cols)
    commitStaged(spark, Staged(root, cur + 1, newToken(), relFiles,
      Some(prior.unionByName(fresh)),
      commitSchema(spark, root, cur).map(_.json),
      commitDvs(spark, root, cur),
      sizes = knownSizes(entries), fileEpochs = knownEpochs(entries)))
    cur + 1
  }

  /** Publish `df` bucket-clustered on `keyCol` into `numBuckets`
    * single-bucket files (plus all-column zone maps via `statsCols`).
    * Two tables published this way with the same (key semantics, n)
    * storage-partition-join through the SQL catalog: zero exchanges. */
  def publishBucketed(df: DataFrame, root: String, epoch: Int,
                      keyCol: String, numBuckets: Int,
                      statsCols: Seq[String] = Nil,
                      txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stage(df, root, epoch, statsCols, bucket = Some((keyCol, numBuckets))), txn)

  /** APPEND-publish preserving the bucketed layout: the fresh batch
    * lays out into single-bucket files; prior epochs' bucket rows
    * carry, so the table stays SPJ-eligible at O(batch) write cost. */
  def publishBucketedAppend(df: DataFrame, root: String, epoch: Int,
                            keyCol: String, numBuckets: Int,
                            statsCols: Seq[String] = Nil,
                            txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stageAppend(df, root, epoch, statsCols,
        bucket = Some((keyCol, numBuckets))), txn)

  /** The committed bucket layout of an epoch, if it FULLY covers the
    * manifest: exactly one single-bucket row per manifest file, all
    * under one `__bucket:<col>:<n>` spec. Any gap (a CoW-rewritten
    * file, a non-bucketed append, mixed specs) returns None — the
    * scan degrades to unpartitioned rather than reporting a layout
    * the files don't have. Metadata-only (one stats-table read). */
  def bucketSpec(spark: SparkSession, root: String, epoch: Int,
                 scope: Option[Set[String]] = None): Option[BucketSpec] = {
    val rows =
      try SnapshotCache.statRows(spark, root, epoch).getOrElse(return None)
      catch { case _: Throwable => return None }
    val brows = rows.filter(r => r.getString(1).startsWith("__bucket:") &&
      scope.forall(_.contains(r.getString(0))))
    if (brows.isEmpty) return None
    val specs = brows.map(_.getString(1)).distinct
    if (specs.length != 1) return None
    val Array(_, keyCol, nStr) = specs(0).split(":", 3)
    val n = nStr.toInt
    val fb = brows.flatMap { r =>
      if (r.isNullAt(2) || r.isNullAt(3) || r.getLong(2) != r.getLong(3)) None
      else Some(r.getString(0) -> r.getLong(2).toInt)
    }.toMap
    val all = scope.map(_.toSeq)
      .getOrElse(manifestEntries(spark, root, epoch).map(_._1))
    if (all.nonEmpty && all.forall(fb.contains) && brows.length == fb.size &&
      fb.values.forall(b => b >= 0 && b < n))
      Some(BucketSpec(keyCol, n, fb))
    else None
  }

  // ------------------------------------------------- time-partitioned layout

  /** A committed TIME-TRANSFORM layout (the Iceberg `hours(ts)` /
    * `days(ts)` / `months(ts)` / `years(ts)` partition-transform
    * analog — the reference's own layout is hour-bucketed,
    * `cassandra/init.cql:41-54`): every data file holds exactly one
    * time-partition ordinal of its column, recorded per file in the
    * stats table (`__ptime:<col>:<unit>` rows, lo == hi == the file's
    * ordinal). Ordinals follow the public Iceberg transform spec:
    * hours/days since 1970-01-01T00:00:00 (floor division), months as
    * `(year-1970)*12 + month-1`, years as `year-1970`. Unlike bucket,
    * the ordinal SET is data-dependent — `fileOrds` lists exactly the
    * partitions present. Files hour/day-ALIGNED make the ordinary ts
    * zone maps exact partition pruning (each file's [lo, hi] spans one
    * unit), so a time-range scan reads precisely the overlapped
    * partitions' files with zero new pruning machinery. */
  final case class TimeSpec(col: String, unit: String,
                            fileOrds: Map[String, Int])

  /** The accepted transform units, in Iceberg's naming. */
  val TimeUnits: Set[String] = Set("hours", "days", "months", "years")

  /** The time-partition ordinal expression — kept in exact agreement
    * with [[graft.catalog.GraftTimeBound.produceResult]] (the V2
    * function form Spark compares SPJ join sides with) and with the
    * zone-map long encoding ([[statLongExpr]]): micros for timestamps
    * (NTZ via its unshifted internal long), days for dates. The
    * subtraction-then-divide spelling is exact floor division in
    * LONG arithmetic (pmod is non-negative), never a double round. */
  private[graft] def timeOrdCol(c: org.apache.spark.sql.Column,
                                dt: org.apache.spark.sql.types.DataType,
                                unit: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def floorDivL(x: org.apache.spark.sql.Column, u: Long) =
      ((x - pmod(x, lit(u))) / lit(u)).cast(IntegerType)
    (dt, unit) match {
      case (DateType, "days")  => datediff(c, lit(java.sql.Date.valueOf("1970-01-01")))
      case (DateType, "hours") =>
        (datediff(c, lit(java.sql.Date.valueOf("1970-01-01"))) * lit(24))
          .cast(IntegerType)
      case (_, "hours")  => floorDivL(statLongExpr(c, dt), 3600L * 1000000L)
      case (_, "days")   => floorDivL(statLongExpr(c, dt), 86400L * 1000000L)
      // months/years derive from the UTC epoch DAY (date_add over the
      // floored day ordinal, mirroring GraftTimeBound's
      // LocalDate.ofEpochDay), never year()/month() on the timestamp:
      // those follow spark.sql.session.timeZone, and under a non-UTC
      // session the committed ordinals would disagree with the V2
      // function Spark compares SPJ join sides with — silently joining
      // wrong partitions (year()/month() on the derived DATE are
      // timezone-free: DateType is a plain epoch-day count)
      case (_, u @ ("months" | "years")) =>
        val d =
          if (dt == DateType) c
          else date_add(lit(java.sql.Date.valueOf("1970-01-01")),
            floorDivL(statLongExpr(c, dt), 86400L * 1000000L))
        if (u == "years") (year(d) - lit(1970)).cast(IntegerType)
        else ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1))
          .cast(IntegerType)
      case other => throw new IllegalArgumentException(
        s"unsupported time transform: $other (want hours/days/months/years)")
    }
  }

  /** Lay `df` out so each output FILE holds exactly one time ordinal,
    * fanning an over-[[targetFileSize]] ordinal out across several
    * salted single-ordinal files (see [[placeByKey]] for the whole
    * placement discipline — the bounded ordinal enumeration, the
    * identity partitioner, the null rejection). */
  private def timeLayout(df: DataFrame, col0: String, unit: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}
    val dt = df.schema(col0).dataType
    require(Seq(TimestampType, TimestampNTZType, DateType).contains(dt),
      s"time-partitioned layout needs a timestamp or date column; $col0 is $dt")
    require(TimeUnits.contains(unit), s"unknown time unit $unit")
    val withK = df
      .withColumn("__k", timeOrdCol(col(col0), dt, unit).cast(LongType))
      .withColumn("__s", xxhash64(col(col0)))
    placeByKey(withK, Seq(col0),
      s"time-partitioned layout: null partition value in $col0")
  }

  /** COMPOSED layout (the Iceberg multi-transform partition spec —
    * `PARTITIONED BY (days(ts), bucket(n, id))`; the reference's own
    * access pattern is exactly this pair, device-bucketed within
    * hour-clustered time, `cassandra/init.cql:41-54`): each output
    * FILE holds exactly ONE (time ordinal, bucket) pair, committed as
    * BOTH a `__ptime` row and a `__bucket` row, so time pruning and
    * bucket point-lookup pruning INTERSECT on the file list with zero
    * new machinery, and the scan reports the pair as a two-transform
    * `KeyGroupedPartitioning` (SPJ on (ts, key) — or on a subset under
    * `allowJoinKeysSubsetOfPartitionKeys`). The pair key packs as
    * `ord * n + bucket` (exact in Long; bucket ∈ [0, n)), the pair
    * SET stays bounded at ordinals × buckets, and each pair fans out
    * past [[targetFileSize]] like every layout ([[placeByKey]]). */
  private def composedLayout(df: DataFrame, col0: String, unit: String,
                             keyCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    import org.apache.spark.sql.types._
    val dt = df.schema(col0).dataType
    require(Seq(TimestampType, TimestampNTZType, DateType).contains(dt),
      s"time-partitioned layout needs a timestamp or date column; $col0 is $dt")
    require(TimeUnits.contains(unit), s"unknown time unit $unit")
    require(n > 0, s"numBuckets must be positive; got $n")
    val kt = df.schema(keyCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(kt),
      s"bucketed layout needs an integral key; $keyCol is $kt")
    val packed = timeOrdCol(col(col0), dt, unit).cast(LongType) *
      lit(n.toLong) + bucketIdCol(keyCol, n).cast(LongType)
    val withK = df.withColumn("__k", packed)
      .withColumn("__s", xxhash64(col(col0), col(keyCol)))
    placeByKey(withK, Seq(col0, keyCol),
      s"composed layout: null partition value in $col0 or $keyCol")
  }


  /** The committed time-transform layout of an epoch, if it FULLY
    * covers the manifest — any gap (CoW-rewritten file, non-layout
    * append, mixed specs) returns None and the scan degrades to
    * unpartitioned. Metadata-only (one stats-table read). */
  def ptimeSpec(spark: SparkSession, root: String, epoch: Int,
                scope: Option[Set[String]] = None): Option[TimeSpec] = {
    val rows =
      try SnapshotCache.statRows(spark, root, epoch).getOrElse(return None)
      catch { case _: Throwable => return None }
    val prows = rows.filter(r => r.getString(1).startsWith("__ptime:") &&
      scope.forall(_.contains(r.getString(0))))
    if (prows.isEmpty) return None
    val specs = prows.map(_.getString(1)).distinct
    if (specs.length != 1) return None
    val Array(_, col0, unit) = specs(0).split(":", 3)
    val fo = prows.flatMap { r =>
      if (r.isNullAt(2) || r.isNullAt(3) || r.getLong(2) != r.getLong(3)) None
      else Some(r.getString(0) -> r.getLong(2).toInt)
    }.toMap
    val all = scope.map(_.toSeq)
      .getOrElse(manifestEntries(spark, root, epoch).map(_._1))
    if (all.nonEmpty && all.forall(fo.contains) && prows.length == fo.size)
      Some(TimeSpec(col0, unit, fo))
    else None
  }

  /** Publish `df` laid out one-file-set-per-time-unit on `col` (plus
    * zone maps via `statsCols`) — the engine-API form of
    * `PARTITIONED BY (hours(ts))`. */
  def publishTimePartitioned(df: DataFrame, root: String, epoch: Int,
                             col: String, unit: String,
                             statsCols: Seq[String] = Nil,
                             txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stage(df, root, epoch, statsCols, ptime = Some((col, unit))), txn)

  /** APPEND-publish preserving the time-partitioned layout: the fresh
    * batch lays out into single-ordinal files; prior epochs' ptime
    * rows carry, so the table stays partition-reporting at O(batch)
    * write cost. */
  def publishTimePartitionedAppend(df: DataFrame, root: String, epoch: Int,
                                   col: String, unit: String,
                                   statsCols: Seq[String] = Nil,
                                   txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stageAppend(df, root, epoch, statsCols, ptime = Some((col, unit))), txn)

  /** Publish `df` under the COMPOSED layout (one file per (time
    * ordinal, bucket) pair — see [[composedLayout]]): the engine-API
    * form of `PARTITIONED BY (unit(col), bucket(n, keyCol))`. */
  def publishComposed(df: DataFrame, root: String, epoch: Int,
                      col: String, unit: String,
                      keyCol: String, n: Int,
                      statsCols: Seq[String] = Nil,
                      txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stage(df, root, epoch, statsCols, ptime = Some((col, unit)),
        bucket = Some((keyCol, n))), txn)

  // ------------------------------------------- identity/truncate layout

  /** A committed IDENTITY or TRUNCATE layout (the Iceberg `identity` /
    * `truncate(w, col)` partition transforms — the reference's own
    * `location` secondary-index access pattern,
    * `cassandra/init.cql:81-82`, re-expressed as a layout; the natural
    * spec for corpus slicing by `documents.lang`/`source`): every data
    * file holds exactly ONE transform value of its column, recorded
    * per file in the stats table (`__ident:<col>` rows for identity,
    * `__trunc:<col>:<w>` for truncate; lo == hi == the file's value —
    * the long legs for integral columns, the string legs for string
    * ones). Unlike bucket the value DOMAIN is data-dependent, so the
    * spec carries exactly the values present (`fileLongs`/`fileStrs`).
    * Because each file is single-value, the ordinary zone maps make
    * `WHERE col = ?` EXACT partition pruning with zero new machinery —
    * the spec's scan-side role is the `KeyGroupedPartitioning`
    * report: two same-layout tables storage-partition-join on the
    * column with zero shuffles. Identity/truncate do not compose with
    * bucket/time transforms (yet) — the spec grammar refuses the mix. */
  final case class IdentSpec(col: String, width: Option[Int],
                             isString: Boolean,
                             fileLongs: Map[String, Long],
                             fileStrs: Map[String, String]) {
    def specString: String =
      width.fold(s"__ident:$col")(w => s"__trunc:$col:$w")
  }

  /** The identity/truncate transform expression — kept in exact
    * agreement with [[graft.catalog.GraftTruncBound.produceResult]]
    * (the V2 function SPJ compares truncate sides with; identity needs
    * no function — Spark resolves it natively). Iceberg truncate
    * semantics: integers floor to the width's multiple
    * (`v - pmod(v, w)` — exact in LONG arithmetic, floors negatives),
    * strings take the first `w` characters. Identity is the column
    * itself (integrals widened to long so an int-keyed side
    * co-partitions with a long-keyed one). */
  private[graft] def identKeyCol(c: org.apache.spark.sql.Column,
                                 dt: org.apache.spark.sql.types.DataType,
                                 width: Option[Int]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, substring}
    import org.apache.spark.sql.types._
    (dt, width) match {
      case (StringType, None) => c
      case (StringType, Some(w)) => substring(c, 1, w)
      case (LongType | IntegerType | ShortType | ByteType, None) =>
        c.cast(LongType)
      case (LongType | IntegerType | ShortType | ByteType, Some(w)) =>
        val v = c.cast(LongType)
        v - pmod(v, lit(w.toLong))
      case (other, _) => throw new IllegalArgumentException(
        s"identity/truncate layout needs an integral or string column; got $other")
    }
  }

  /** Lay `df` out so each output FILE holds exactly one identity /
    * truncate value (see [[placeByKey]] for the placement discipline).
    * String keys are DENSE-INDEXED to the Long key placeByKey
    * contracts on via a broadcast value→ordinal join — deterministic,
    * where hashing could fold two values into one file and break the
    * single-value contract. The distinct value set is bounded by the
    * same [[layoutMaxKeys]] cap the sizing aggregate enforces
    * (identity layouts are low-cardinality by design — a language, a
    * source, a tenant — never a high-cardinality id: that is what
    * bucket is for). */
  private def identLayout(df: DataFrame, col0: String,
                          width: Option[Int]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, xxhash64}
    import org.apache.spark.sql.types._
    val dt = df.schema(col0).dataType
    width.foreach(w => require(w > 0, s"truncate width must be positive; got $w"))
    val key = identKeyCol(col(col0), dt, width)
    val nullMsg = s"identity/truncate layout: null partition value in $col0"
    if (dt != StringType) {
      val withK = df.withColumn("__k", key)
        .withColumn("__s", xxhash64(col(col0)))
      placeByKey(withK, Seq(col0), nullMsg)
    } else {
      val spark = df.sparkSession
      val maxKeys = layoutMaxKeys(spark)
      val vals = df.select(key.as("__v")).distinct()
        .limit(maxKeys + 1).collect()
      require(vals.length <= maxKeys,
        s"identity/truncate layout on $col0 would exceed " +
          s"spark.graft.layout.maxKeys=$maxKeys distinct values; " +
          "bucket the column instead, or raise the cap")
      vals.foreach(r => require(!r.isNullAt(0), nullMsg))
      import spark.implicits._
      val idx = vals.map(_.getString(0)).sorted.zipWithIndex
        .map { case (v, i) => (v, i.toLong) }.toSeq.toDF("__v", "__k")
      // LEFT join, never inner (r17 advice): a nondeterministic input
      // (rand()-derived values, unstable sampling) can produce values
      // ABSENT from the just-collected index — an inner join would
      // silently drop those rows from the committed table; the left
      // join surfaces them as null keys, which placeByKey refuses
      val withK = df.withColumn("__v", key)
        .join(broadcast(idx), Seq("__v"), "left").drop("__v")
        .withColumn("__s", xxhash64(col(col0)))
      placeByKey(withK, Seq(col0), nullMsg +
        " (a null key here can also mean a value NOT present when the " +
        "placement index was computed — a nondeterministic input)")
    }
  }

  /** COMPOSED identity layout — identity/truncate × bucket, or
    * identity/truncate × time transform (`PARTITIONED BY (lang,
    * bucket(4, id))` / `(event_type, days(ts))`): each output FILE
    * holds exactly ONE (identity value, partner value) pair, committed
    * as BOTH stats-row families so the two prunings INTERSECT and the
    * scan reports a two-transform `KeyGroupedPartitioning`. Unlike the
    * time×bucket pair (packable as `ord*n+bucket` — bucket's domain is
    * bounded), an identity value's domain is data-dependent, so the
    * pair key is a DENSE INDEX over the distinct pairs actually
    * present — ONE bounded enumeration (capped by [[layoutMaxKeys]],
    * the same bound the sizing aggregate lives under), broadcast back
    * as a value→ordinal join. */
  private def identPairLayout(df: DataFrame, c: String, w: Option[Int],
                              partner: org.apache.spark.sql.Column,
                              partnerSortCol: String,
                              sortIdentFirst: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, xxhash64}
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    requireWidth(w)
    val isStr = dt == StringType
    val iKey = identKeyCol(col(c), dt, w)
    val spark = df.sparkSession
    val maxKeys = layoutMaxKeys(spark)
    val nullMsg = s"composed identity layout: null partition value in " +
      s"$c or $partnerSortCol"
    val pairs = df.select(iKey.as("__iv"), partner.cast(LongType).as("__pv"))
      .distinct().limit(maxKeys + 1).collect()
    require(pairs.length <= maxKeys,
      s"composed identity layout on ($c, $partnerSortCol) would exceed " +
        s"spark.graft.layout.maxKeys=$maxKeys distinct pairs; coarsen the " +
        "spec or raise the cap")
    pairs.foreach(r => require(!r.isNullAt(0) && !r.isNullAt(1), nullMsg))
    val sorted =
      if (isStr) pairs.sortBy(r => (r.getString(0), r.getLong(1)))
      else pairs.sortBy(r => (r.getLong(0), r.getLong(1)))
    import spark.implicits._
    val idx =
      if (isStr)
        sorted.zipWithIndex.map { case (r, i) =>
          (r.getString(0), r.getLong(1), i.toLong) }.toSeq
          .toDF("__iv", "__pv", "__k")
      else
        sorted.zipWithIndex.map { case (r, i) =>
          (r.getLong(0), r.getLong(1), i.toLong) }.toSeq
          .toDF("__iv", "__pv", "__k")
    val sortCols =
      if (sortIdentFirst) Seq(c, partnerSortCol) else Seq(partnerSortCol, c)
    // LEFT join for the same nondeterministic-input discipline as the
    // single-axis identity path: an unseen pair surfaces as a null
    // key and fails loudly instead of silently vanishing
    val withK = df.withColumn("__iv", iKey)
      .withColumn("__pv", partner.cast(LongType))
      .join(broadcast(idx), Seq("__iv", "__pv"), "left").drop("__iv", "__pv")
      .withColumn("__s", xxhash64(col(c), col(partnerSortCol)))
    placeByKey(withK, sortCols, nullMsg +
      " (a null key here can also mean a pair NOT present when the " +
      "placement index was computed — a nondeterministic input)")
  }

  private def requireWidth(w: Option[Int]): Unit =
    w.foreach(ww => require(ww > 0, s"truncate width must be positive; got $ww"))


  /** The committed identity/truncate layout of an epoch, if it FULLY
    * covers the manifest — any gap (a non-layout append, mixed specs)
    * returns None and the scan degrades to unpartitioned
    * (metadata-only; same discipline as [[bucketSpec]]). */
  def identSpec(spark: SparkSession, root: String, epoch: Int,
                scope: Option[Set[String]] = None): Option[IdentSpec] = {
    val rows =
      try SnapshotCache.statRows(spark, root, epoch).getOrElse(return None)
      catch { case _: Throwable => return None }
    val irows = rows.filter(r => (r.getString(1).startsWith("__ident:") ||
      r.getString(1).startsWith("__trunc:")) &&
      scope.forall(_.contains(r.getString(0))))
    if (irows.isEmpty) return None
    val specs = irows.map(_.getString(1)).distinct
    if (specs.length != 1) return None
    val (col0, width) = specs(0).split(":", -1) match {
      case Array("__ident", c) => (c, None)
      case Array("__trunc", c, w) => (c, Some(w.toInt))
      case _ => return None
    }
    val longs = irows.flatMap { r =>
      if (r.isNullAt(2) || r.isNullAt(3) || r.getLong(2) != r.getLong(3)) None
      else Some(r.getString(0) -> r.getLong(2))
    }.toMap
    val strs = irows.flatMap { r =>
      if (r.isNullAt(4) || r.isNullAt(5) || r.getString(4) != r.getString(5)) None
      else Some(r.getString(0) -> r.getString(4))
    }.toMap
    // a spec is either all-long or all-string (one column, one type)
    val (isString, covered) =
      if (strs.nonEmpty && longs.isEmpty) (true, strs.keySet)
      else if (longs.nonEmpty && strs.isEmpty) (false, longs.keySet)
      else return None
    val all = scope.map(_.toSeq)
      .getOrElse(manifestEntries(spark, root, epoch).map(_._1))
    if (all.nonEmpty && all.forall(covered.contains) &&
      irows.length == covered.size)
      Some(IdentSpec(col0, width, isString, longs, strs))
    else None
  }

  /** Publish `df` laid out one-file-set-per-value on `col` (identity,
    * or the first-`width` truncate) — the engine-API form of
    * `PARTITIONED BY (col)` / `PARTITIONED BY (truncate(w, col))`. */
  def publishIdentity(df: DataFrame, root: String, epoch: Int,
                      col: String, width: Option[Int] = None,
                      statsCols: Seq[String] = Nil,
                      txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stage(df, root, epoch, statsCols, ident = Some((col, width))), txn)

  /** ADD-COLUMN schema evolution as a PURE-METADATA commit (Delta's
    * `ALTER TABLE ADD COLUMNS`): a new epoch carrying the SAME file
    * list, stats, and DV as the current one, with the union schema
    * pinned into its marker — zero data I/O; pre-evolution files fill
    * the added columns with null at read, exactly as evolving appends
    * do ([[publishAppendEvolve]]). Existing names are rejected (this
    * is evolution, not migration). Returns the new epoch. */
  def evolveSchema(spark: SparkSession, root: String,
                   added: org.apache.spark.sql.types.StructType): Int = {
    val cur = currentEpoch(spark, root)
    val prior = commitSchema(spark, root, cur)
      .getOrElse(read(spark, root, cur).schema)
    added.fields.foreach(f => require(!prior.fieldNames.contains(f.name),
      s"ALTER TABLE ADD COLUMNS: ${f.name} already exists in ${prior.simpleString}"))
    // a mapped table's new columns get UUID-fresh physical names so a
    // re-added name can never resurrect a dropped column's data
    val addedFields =
      if (ColumnMapping.hasMapping(prior))
        added.fields.map(f => ColumnMapping.withPhysical(
          f.copy(nullable = true), ColumnMapping.freshPhysical(f.name)))
      else added.fields.map(_.copy(nullable = true))
    val merged = org.apache.spark.sql.types.StructType(prior.fields ++ addedFields)
    val entries = manifestEntries3(spark, root, cur)
    val stats =
      if (statsExists(spark, root, cur)) Some(statsTable(spark, root, cur))
      else None
    val staged = Staged(root, cur + 1, newToken(), entries.map(_._1), stats,
      Some(asNullable(merged).json), dvs = commitDvs(spark, root, cur),
      sizes = knownSizes(entries), fileEpochs = knownEpochs(entries))
    commitStaged(spark, staged)
    cur + 1
  }

  /** `ALTER TABLE ... ALTER COLUMN ... TYPE` — SAFE TYPE WIDENING as a
    * PURE-METADATA commit (Delta type widening / Iceberg type
    * promotion): the committed schema's field changes to the wider
    * type, files keep their narrow physical encodings, and the parquet
    * reader widens per file at scan time (Spark 4's widening type
    * promotions — int32 pages decode straight into long/wider decimal
    * vectors). Allowed promotions: byte/short/int → any wider
    * integral, float → double, and decimal growth that never loses
    * integer digits or scale. Everything else (narrowing, string ↔
    * numeric, date → timestamp) is a MIGRATION — refused.
    *
    * Committed metadata survives because it is long-normalized:
    * integral zone maps, dictionaries, and bucket rows store values AS
    * LONGS, and bloom bit positions hash the long cast — a widened
    * predicate compares long-vs-long exactly as before (spec-pinned).
    * The one exception is HLL NDV sketches, which hash the TYPED
    * value: the widened column's `__hll:`/`__nulls:` rows are DROPPED
    * from the carried stats (pre- and post-widening sketches cannot
    * union honestly; ANALYZE recreates them in the wide type).
    * Guards: a live DV key or committed bucket key refuses (their
    * typed read paths pin the narrow type); travel keeps old shapes.
    * Returns the new epoch. */
  def widenColumn(spark: SparkSession, root: String, name: String,
                  to: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.functions.col
    val cur = currentEpoch(spark, root)
    val prior = commitSchema(spark, root, cur)
      .getOrElse(read(spark, root, cur).schema)
    val idx = prior.fieldNames.indexOf(name)
    require(idx >= 0, s"ALTER COLUMN: no column $name in ${prior.simpleString}")
    val fromType = prior.fields(idx).dataType
    require(isSafeWidening(fromType, to),
      s"unsupported type change for $name: ${fromType.simpleString} -> " +
        s"${to.simpleString} is not a widening promotion (allowed: " +
        "byte/short/int -> wider integral, float -> double, decimal " +
        "growth keeping integer digits and scale); rewrite the table " +
        "to migrate")
    val phys = ColumnMapping.physicalName(prior.fields(idx))
    commitDvs(spark, root, cur).foreach { case (_, k) =>
      require(k != phys && k != name,
        s"column $name carries live delete-vector keys; OPTIMIZE to " +
          "materialize them before widening")
    }
    bucketSpec(spark, root, cur).foreach { bs =>
      require(bs.keyCol != name && bs.keyCol != phys,
        s"column $name is the committed bucket key; re-bucket (OPTIMIZE " +
          "BUCKET BY) after widening instead")
    }
    ptimeSpec(spark, root, cur).foreach { ts =>
      require(ts.col != name && ts.col != phys,
        s"column $name is the committed time-partition column; rewrite " +
          "the layout after widening instead")
    }
    identSpec(spark, root, cur).foreach { is =>
      require(is.col != name && is.col != phys,
        s"column $name is the committed identity/truncate layout column; " +
          "rewrite the layout after widening instead")
    }
    val merged = org.apache.spark.sql.types.StructType(
      prior.fields.updated(idx, prior.fields(idx).copy(dataType = to)))
    val entries = manifestEntries3(spark, root, cur)
    val stats =
      if (!statsExists(spark, root, cur)) None
      else Some(statsTable(spark, root, cur)
        .filter(!col("col").isin(s"__hll:$phys", s"__nulls:$phys")))
    val staged = Staged(root, cur + 1, newToken(), entries.map(_._1), stats,
      Some(asNullable(merged).json), dvs = commitDvs(spark, root, cur),
      sizes = knownSizes(entries), fileEpochs = knownEpochs(entries))
    commitStaged(spark, staged)
    cur + 1
  }

  /** Commit a PURE-METADATA epoch that carries the current manifest,
    * stats, schema, and delete vectors verbatim — the epoch advance
    * for table-surface changes that live in sidecars (ADD/DROP
    * CONSTRAINT). The advance is what makes such a change VISIBLE to
    * optimistic concurrency (VERDICT r14 #5): a racing row-level
    * commit finds the table moved, re-enters its CAS loop, and
    * re-audits its staged files against the new surface instead of
    * committing blind. `expectedBase` pins the epoch the caller's own
    * pre-commit work (e.g. the ADD CONSTRAINT existing-data audit) ran
    * against — if the table advanced past it, the commit fails with a
    * retryable [[ManifestConflictException]] so the caller re-runs
    * that work. Returns the new epoch. */
  def commitCarryEpoch(spark: SparkSession, root: String,
                       expectedBase: Int): Int = {
    val cur = currentEpoch(spark, root)
    if (cur != expectedBase)
      throw new ManifestConflictException(root, expectedBase + 1,
        s"table advanced to epoch $cur while a metadata change was " +
          s"prepared against epoch $expectedBase; re-run the preparation")
    val entries = manifestEntries3(spark, root, cur)
    val stats =
      if (statsExists(spark, root, cur)) Some(statsTable(spark, root, cur))
      else None
    commitStaged(spark, Staged(root, cur + 1, newToken(),
      entries.map(_._1), stats, commitSchema(spark, root, cur).map(_.json),
      dvs = commitDvs(spark, root, cur),
      sizes = knownSizes(entries), fileEpochs = knownEpochs(entries)))
    cur + 1
  }

  /** The widening-promotion predicate, exposed for the pre-first-commit
    * sidecar path (same contract, no epoch to commit). */
  def isSafeWideningPublic(from: org.apache.spark.sql.types.DataType,
                           to: org.apache.spark.sql.types.DataType): Boolean =
    isSafeWidening(from, to)

  private def isSafeWidening(from: org.apache.spark.sql.types.DataType,
                             to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        (d1 != d2) && d2.scale >= d1.scale &&
          d2.precision - d2.scale >= d1.precision - d1.scale
      case _ => false
    }
  }

  /** `ALTER TABLE RENAME COLUMN` as a PURE-METADATA commit (Delta's
    * column-mapping rename): the first rename/drop upgrades the table
    * to explicit logical→physical mapping ([[ColumnMapping.stampAll]]),
    * after which the files' physical names are pinned forever and the
    * logical rename touches only the committed schema — zero data
    * I/O; stats/dict/bloom/bucket/DV metadata (all keyed by physical
    * name) carry verbatim; travel keeps the old shape (each commit
    * pins its own schema). Returns the new epoch. */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Int =
    remapSchema(spark, root) { sch =>
      require(sch.fieldNames.contains(from),
        s"RENAME COLUMN: no column $from in ${sch.simpleString}")
      require(!sch.fieldNames.contains(to),
        s"RENAME COLUMN: $to already exists in ${sch.simpleString}")
      org.apache.spark.sql.types.StructType(
        sch.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    }

  /** `ALTER TABLE DROP COLUMN` as a PURE-METADATA commit: the field
    * leaves the logical schema; the physical column stays in the
    * (immutable) files, invisible to every read — files byte-identical
    * (the spec-pinned property). A column later re-ADDED under the
    * same name gets a fresh physical name, so the dropped data can
    * never resurrect. Returns the new epoch. */
  def dropColumn(spark: SparkSession, root: String, name: String): Int =
    remapSchema(spark, root) { sch =>
      require(sch.fieldNames.contains(name),
        s"DROP COLUMN: no column $name in ${sch.simpleString}")
      require(sch.length > 1, "cannot drop a table's last column")
      org.apache.spark.sql.types.StructType(sch.fields.filterNot(_.name == name))
    }

  private def remapSchema(spark: SparkSession, root: String)(
      change: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType): Int = {
    val cur = currentEpoch(spark, root)
    val prior = ColumnMapping.stampAll(commitSchema(spark, root, cur)
      .getOrElse(read(spark, root, cur).schema))
    val next = change(prior)
    // metadata the rename/drop must not orphan: a live DV key or a
    // committed bucket key is addressed by PHYSICAL name in places
    // that also surface it logically (the SPJ transform, the DV
    // append key) — keep those columns live and un-renamed
    commitDvs(spark, root, cur).foreach { case (_, k) =>
      require(ColumnMapping.logicalOfPhysical(next, k).isDefined,
        s"cannot drop the live delete-vector key column (physical $k); " +
          "materialize the DV first (compact)")
    }
    bucketSpec(spark, root, cur).foreach { bs =>
      val f = ColumnMapping.logicalOfPhysical(next, bs.keyCol)
      require(f.exists(_.name == bs.keyCol),
        s"cannot rename or drop the bucket key ${bs.keyCol}: the " +
          "storage-partitioned layout is declared by that name; " +
          "re-bucket (OPTIMIZE ... BUCKET BY) first")
    }
    ptimeSpec(spark, root, cur).foreach { ts =>
      val f = ColumnMapping.logicalOfPhysical(next, ts.col)
      require(f.exists(_.name == ts.col),
        s"cannot rename or drop the time-partition column ${ts.col}: " +
          "the layout is declared by that name; rewrite the layout first")
    }
    identSpec(spark, root, cur).foreach { is =>
      val f = ColumnMapping.logicalOfPhysical(next, is.col)
      require(f.exists(_.name == is.col),
        s"cannot rename or drop the identity/truncate layout column " +
          s"${is.col}: the layout is declared by that name; rewrite the " +
          "layout first")
    }
    val entries = manifestEntries3(spark, root, cur)
    val stats =
      if (statsExists(spark, root, cur)) Some(statsTable(spark, root, cur))
      else None
    commitStaged(spark, Staged(root, cur + 1, newToken(), entries.map(_._1),
      stats, Some(asNullable(next).json), dvs = commitDvs(spark, root, cur),
      sizes = knownSizes(entries), fileEpochs = knownEpochs(entries)))
    cur + 1
  }

  /** TRUNCATE as a metadata epoch: the new manifest lists NO files —
    * content history restarts while the schema stays pinned and every
    * prior epoch remains time-travelable until vacuum. An empty stats
    * table rides along so metadata-only aggregation keeps answering
    * (count 0) without a fallback scan. Returns the new epoch. */
  def truncate(spark: SparkSession, root: String): Int = {
    val cur = currentEpoch(spark, root)
    commitStaged(spark, Staged(root, cur + 1, newToken(), Nil,
      Some(emptyStats(spark)), commitSchema(spark, root, cur).map(_.json)))
    cur + 1
  }

  /** One expectation's violation tally from a rejected publish. */
  final case class ExpectationViolation(name: String, rows: Long)

  /** A publish was rejected by its expectations: nothing was committed
    * (the staged files are invisible orphans until vacuum). */
  final class ExpectationFailedException(root: String, epoch: Int,
                                         val violations: Seq[ExpectationViolation])
    extends RuntimeException(
      s"epoch $epoch at $root rejected: " +
        violations.map(v => s"${v.name}=${v.rows}").mkString(", "))

  /** CHECK-constrained publish — the AUDIT step of write-audit-publish
    * made real (Delta's CHECK constraints / DLT expectations): the
    * epoch is staged, then ONE aggregation pass over the just-written
    * files tallies rows violating each expectation, and any violation
    * aborts BEFORE the commit-marker CAS — readers never see a
    * rejected epoch, and the staged files are ordinary vacuum-swept
    * orphans. Auditing the STAGED files (not the input plan) certifies
    * what a reader would actually scan. SQL CHECK semantics: a NULL
    * expectation result passes; only `false` violates. Expectations
    * are an ordered Seq so violation reports are deterministic. */
  def publishExpect(df: DataFrame, root: String, epoch: Int,
                    expectations: Seq[(String, org.apache.spark.sql.Column)],
                    statsCols: Seq[String] = Nil, txn: Option[Txn] = None): Int = {
    import org.apache.spark.sql.functions._
    require(expectations.nonEmpty, "publishExpect needs at least one expectation")
    val spark = df.sparkSession
    val staged = stage(df, root, epoch, statsCols)
    val bad =
      if (staged.relFiles.isEmpty) Nil
      else {
        val audit = spark.read.schema(df.schema)
          .parquet(staged.relFiles.map(r => s"$root/$r"): _*)
        val counts = audit.select(expectations.map { case (n, e) =>
          sum(when(not(coalesce(e, lit(true))), 1L).otherwise(0L)).as(n)
        }: _*).head()
        expectations.zipWithIndex.flatMap { case ((n, _), i) =>
          val c = if (counts.isNullAt(i)) 0L else counts.getLong(i)
          if (c > 0) Some(ExpectationViolation(n, c)) else None
        }
      }
    if (bad.nonEmpty) throw new ExpectationFailedException(root, epoch, bad)
    commitStaged(spark, staged, txn)
  }

  /** Expect-or-DROP (DLT's quarantine pattern): rows passing every
    * expectation publish as epoch `epoch`; violating rows land in the
    * table's quarantine side-table (`<root>_quarantine` — a SIBLING
    * manifest table, kept outside `root` so the parent's vacuum
    * orphan sweep, which claims every `data-epoch=` dir under its
    * root, can never eat quarantined data) tagged with the
    * comma-joined names of the
    * expectations they failed and the rejecting epoch — the triage
    * surface a 100 TB ingest needs, because at that scale "reject the
    * whole batch" (publishExpect) is only for contract breaches, not
    * row-level dirt. Input is scanned twice (valid split + quarantine
    * split), the same economics as DLT's drop policy.
    * @return (published file count, quarantined row count) */
  def publishQuarantine(df: DataFrame, root: String, epoch: Int,
                        expectations: Seq[(String, org.apache.spark.sql.Column)],
                        statsCols: Seq[String] = Nil,
                        txn: Option[Txn] = None): (Int, Long) = {
    import org.apache.spark.sql.functions._
    require(expectations.nonEmpty, "publishQuarantine needs at least one expectation")
    val spark = df.sparkSession
    val viol = array(expectations.map { case (n, e) =>
      when(not(coalesce(e, lit(true))), lit(n)) }: _*)
    val tagged = df.withColumn("_violations",
      filter(viol, v => v.isNotNull))
    val valid = tagged.filter(size(col("_violations")) === 0).drop("_violations")
    val invalid = tagged.filter(size(col("_violations")) > 0)
      .withColumn("_violations", concat_ws(",", col("_violations")))
      .withColumn("_epoch", lit(epoch))
    val n = commitStaged(spark, stage(valid, root, epoch, statsCols), txn)
    val nq = invalid.count()
    if (nq > 0) {
      val quarRoot = s"${root}_quarantine"
      publishAppend(invalid, quarRoot,
        currentEpochOpt(spark, quarRoot).getOrElse(0) + 1)
    }
    (n, nq)
  }

  /** The table's quarantine side-table (rows dropped by
    * [[publishQuarantine]], newest committed epoch). */
  def quarantine(spark: SparkSession, root: String): DataFrame =
    read(spark, s"${root}_quarantine")

  /** Idempotent streaming append-commit — the foreachBatch contract is
    * at-least-once per batch (a crash between this sink's commit and
    * Spark's checkpoint commit REPLAYS the batch; the reference's own
    * contract doc warns on exactly this bookkeeping class,
    * docs/data-contracts.md:296-298): record the batchId as the txn
    * version and no-op any version already committed. Returns true iff
    * this call published (false = replay skipped). Batch versions are
    * monotonic per appId (Spark's batchId contract), so `>= version`
    * is the committed test. */
  def commitIdempotentAppend(df: DataFrame, root: String, appId: String,
                             version: Long, statsCols: Seq[String] = Nil): Boolean = {
    val spark = df.sparkSession
    if (lastCommittedVersion(spark, root, appId).exists(_ >= version)) false
    else {
      val next = currentEpochOpt(spark, root).getOrElse(0) + 1
      try {
        commitStaged(spark, stageAppend(df, root, next, statsCols),
          Some(Txn(appId, version)))
        true
      } catch {
        case c: ManifestConflictException =>
          // lost a race — but if the winner WAS this (appId, version)
          // (a concurrent replay of the same batch), that's still a
          // clean no-op; any other winner is a real conflict
          if (lastCommittedVersion(spark, root, appId).exists(_ >= version)) false
          else throw c
      }
    }
  }

  /** [[commitIdempotentAppend]] for files ALREADY WRITTEN by a
    * distributed writer (the streaming `toTable` path: Spark's own
    * parquet batch write stages the micro-batch into
    * `root/dirName/`, then this assembles the append epoch from the
    * staged files — no second write). Same txn discipline: a replayed
    * (appId, version) no-ops and the staged dir becomes vacuum-swept
    * debris. Schema is pinned from the prior epoch (the writer was
    * configured with the table schema); the first epoch pins the
    * staged files' own schema. */
  def commitIdempotentAppendFiles(spark: SparkSession, root: String,
                                  dirName: String, appId: String,
                                  version: Long,
                                  statsCols: Seq[String] = Nil,
                                  schemaFallback: Option[org.apache.spark.sql.types.StructType] = None): Boolean = {
    val stagePath = new org.apache.hadoop.fs.Path(s"$root/$dirName")
    val f = fs(spark, stagePath)
    if (lastCommittedVersion(spark, root, appId).exists(_ >= version)) {
      // replayed batch: its freshly staged files duplicate an already
      // committed epoch's — drop them now or they leak (no manifest
      // will ever reference them, and retention sweeps only epoch dirs)
      f.delete(stagePath, true)
      return false
    }
    // the stage dir is created by the distributed write's commit
    // protocol even for a zero-row batch, so its ABSENCE here can only
    // mean an external sweep (a vacuum whose stream-stage grace was
    // shorter than this batch's write phase) deleted it between the
    // delegate commit and this epoch commit. Committing would publish
    // an EMPTY epoch while the checkpoint advances — silent loss of
    // the batch (ADVICE r12). Fail loudly instead; the retried batch
    // re-stages.
    if (!f.exists(stagePath))
      throw new IllegalStateException(
        s"streaming stage dir $stagePath vanished before its epoch " +
          "commit (batch not lost — it will replay): a concurrent " +
          "VACUUM's streamStageGraceMs was shorter than this batch's " +
          "write phase; raise the grace or do not run vacuum " +
          "concurrently with long streaming batches")
    val next = currentEpochOpt(spark, root).getOrElse(0) + 1
    val token = newToken()
    // move the stage into the standard attempt-dir shape BEFORE the
    // commit: data-epoch=N-aTOKEN is what every retention rule
    // understands — an in-flight batch stages ABOVE the current epoch
    // (protected from vacuum), a beaten or replaced attempt is ordinary
    // epoch-bounded debris. A bespoke stream-dir name would sit outside
    // those rules and either leak or race the sweeps.
    val epochDirName = s"data-epoch=$next-a$token"
    val epochDirPath = new org.apache.hadoop.fs.Path(s"$root/$epochDirName")
    if (!f.rename(stagePath, epochDirPath))
      throw new IllegalStateException(s"rename $stagePath -> $epochDirPath failed")
    val listed =
      if (!f.exists(epochDirPath)) Nil
      else f.listStatus(epochDirPath).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
    val freshSizes = listed
      .map(s => s"$epochDirName/${s.getPath.getName}" -> s.getLen).toMap
    val relFiles = freshSizes.keys.toSeq.sorted
    val freshStats =
      if (statsCols.isEmpty) None
      else if (relFiles.isEmpty) Some(emptyStats(spark))
      else Some(zoneStats(spark, root, relFiles, statsCols))
    val fresh = Staged(root, next, token, relFiles, freshStats,
      sizes = freshSizes)
    val staged =
      if (next <= 1) {
        val sch =
          if (relFiles.isEmpty) schemaFallback.map(s => asNullable(s).json)
          else Some(asNullable(spark.read
            .parquet(relFiles.map(r => s"$root/$r"): _*).schema).json)
        fresh.copy(schemaJson = sch)
      } else {
        val priorEntries = manifestEntries3(spark, root, next - 1)
        val prior = priorEntries.map(_._1)
        val stats =
          if (statsCols.isEmpty) None
          else Some(statsTable(spark, root, next - 1).unionByName(freshStats.get))
        fresh.copy(relFiles = (prior ++ relFiles).sorted, stats = stats,
          schemaJson = commitSchema(spark, root, next - 1).map(_.json)
            .orElse(fresh.schemaJson),
          dvs = commitDvs(spark, root, next - 1),
          sizes = freshSizes ++ knownSizes(priorEntries),
          fileEpochs = knownEpochs(priorEntries))
      }
    try { commitStaged(spark, staged, Some(Txn(appId, version))); true }
    catch {
      case c: ManifestConflictException =>
        if (lastCommittedVersion(spark, root, appId).exists(_ >= version)) {
          // a concurrent replay of the same batch won: clean no-op —
          // this attempt's renamed dir is ordinary epoch-bounded
          // debris for vacuum, but drop it now while we know
          f.delete(epochDirPath, true)
          false
        } else throw c
    }
  }

  // ---------------------------------------------------------------- zone maps

  /** Per-file per-column (min, max) rows for freshly staged files —
    * one distributed pass grouped by input_file_name, one stats row
    * per (file, column). Integral, timestamp, and date columns land
    * in (lo_long, hi_long) — timestamps as MICROS since the epoch
    * (exactly Spark's own literal encoding, so pruning compares like
    * with like; NTZ converts under the pinned-UTC session), dates as
    * DAYS — strings in (lo_str, hi_str); anything else is rejected
    * (floats would need NaN-ordering care; add when a caller needs
    * them). Time-range scans are the reference's primary access
    * pattern (`cassandra/init.cql:25` clusters by timestamp), so the
    * ts column pruning the FILE LIST is the manifest-level spelling
    * of that layout. */
  private[sink] def statLongExpr(c: org.apache.spark.sql.Column,
                                 dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType => unix_micros(c)
      // NTZ encodes timezone-INDEPENDENTLY (its internal long,
      // verbatim): the cast-to-Timestamp spelling shifted by the
      // session zone while catalyst NTZ literals on the probe side are
      // unshifted — offset bounds under a non-UTC session could
      // wrongly prune boundary files (ADVICE r12)
      case TimestampNTZType => graft.functions.TimeExprs.ntzMicros(c)
      case DateType => datediff(c, lit(java.sql.Date.valueOf("1970-01-01")))
      case _ => c
    }
  }

  /** MANIFEST-relative path of a data file: the path from its
    * `data-epoch=`/`data-stream-` ancestor dir down. Layout
    * replacement writes nest files one partition level below the
    * epoch dir (`data-epoch=N-aTOK/__p0=<v>/part-*.parquet`), so the
    * old parent-name/file-name rule mislabeled them — every manifest
    * lookup keyed on it missed. Falls back to parent/name for paths
    * with no data- ancestor (never a committed data file). */
  def relOfData(p: org.apache.hadoop.fs.Path): String = {
    val segs = scala.collection.mutable.ListBuffer(p.getName)
    var cur = p.getParent
    while (cur != null && !cur.getName.startsWith("data-")) {
      segs.prepend(cur.getName)
      cur = cur.getParent
    }
    if (cur != null) { segs.prepend(cur.getName); segs.mkString("/") }
    else s"${p.getParent.getName}/${p.getName}"
  }

  /** `<root>/` as it appears inside `input_file_name()` URIs. */
  private def rootMarker(root: String): String =
    new org.apache.hadoop.fs.Path(root).toUri.getPath.stripSuffix("/") + "/"

  /** Root-relative path of `input_file_name()` (column form):
    * everything after `<root>/` in the file URI. Robust to partition
    * SUBDIRECTORIES — layout replacement writes nest files as
    * `data-epoch=N-aTOK/__p0=<v>/part-*.parquet`, and the old
    * last-two-segments rule silently mislabeled them, detaching their
    * stats rows from the manifest entries they describe. */
  private def relUnderRoot(root: String): org.apache.spark.sql.Column =
    relColUnder(root, org.apache.spark.sql.functions.col("__f"))

  /** [[relUnderRoot]] over an arbitrary file-name column (the branch
    * DML state reads tag rows with their manifest rel path). */
  def relColUnder(root: String,
                  c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, locate}
    val marker = rootMarker(root)
    c.substr(locate(marker, c) + lit(marker.length), lit(Int.MaxValue))
  }

  /** LAZY zone-map builder for SINGLE-flavor (statsCols-only) stages:
    * the rows fold into the commit's one stats-parquet write, so the
    * common append/DML commit pays ZERO extra jobs. Multi-flavor
    * stages go through [[fusedStats]] (one pass for all flavors)
    * instead of one scan per flavor. */
  private def zoneStats(spark: SparkSession, root: String,
                        relFiles: Seq[String], statsCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(relFiles.map(r => s"$root/$r"): _*)
    val schema = df.schema
    statsCols.foreach { c =>
      schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType | StringType |
             TimestampType | TimestampNTZType | DateType => ()
        case other => throw new IllegalArgumentException(
          s"zone maps support integral, string, timestamp, and date " +
            s"columns; $c is $other")
      }
    }
    val aggs = statsCols.flatMap { c =>
      val e = statLongExpr(col(c), schema(c).dataType)
      Seq(min(e).as(s"__lo_$c"), max(e).as(s"__hi_$c"))
    } :+
      count(lit(1)).as("__cnt")
    // relative path = last two segments (layout is always root/dir/file)
    val rel = relUnderRoot(root)
    val base = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
    // one `__count` row per file rides every zone-map publish: it is
    // what makes metadata-only aggregation ([[aggFromMetadata]])
    // possible, and it merges/carries/compacts through the same
    // machinery as the min/max rows (appends union it, CoW carries it)
    val cnt = base.select(
      rel.as("file"), lit("__count").as("col"),
      col("__cnt").cast(LongType).as("lo_long"),
      lit(null).cast(LongType).as("hi_long"),
      lit(null).cast(StringType).as("lo_str"),
      lit(null).cast(StringType).as("hi_str"))
    (statsCols.map { c =>
      val isStr = schema(c).dataType == StringType
      base.select(
        rel.as("file"), lit(c).as("col"),
        (if (isStr) lit(null).cast(LongType) else col(s"__lo_$c").cast(LongType)).as("lo_long"),
        (if (isStr) lit(null).cast(LongType) else col(s"__hi_$c").cast(LongType)).as("hi_long"),
        (if (isStr) col(s"__lo_$c") else lit(null).cast(StringType)).as("lo_str"),
        (if (isStr) col(s"__hi_$c") else lit(null).cast(StringType)).as("hi_str"))
    } :+ cnt).reduce(_ unionByName _)
  }

  /** EVERY requested per-file stats flavor in ONE pass (guide §1.2 —
    * one read, one groupBy(input_file_name), one driver collect of
    * file-count-bounded rows): zone min/max + __count, dictionaries,
    * bloom filters, bucket/ptime/ident layout rows, HLL sketches. The
    * dedicated single-flavor builders each re-scan the freshly staged
    * files — a composed-spec CTAS with zone maps paid three scans and
    * three shuffles of the batch it had just written; this fuses them
    * into one aggregation whose result is one row per staged file (the
    * same driver bound as the `sizes` map the stage already holds, and
    * the same enumeration an Iceberg manifest makes). Values and
    * validation messages are byte-identical to the dedicated paths;
    * under `lenientLayout` a layout flavor that sees a mixed-value
    * file contributes NO rows (independently per flavor — the
    * spec-detection callers' partial-coverage contract) instead of
    * throwing. Always Some (Option kept for call-site symmetry). */
  private def fusedStats(spark: SparkSession, root: String, relFiles: Seq[String],
                         statsCols: Seq[String], dictCols: Seq[String] = Nil,
                         dictCap: Int = 256, bloomCols: Seq[String] = Nil,
                         bloomBits: Int = 16384, bloomHashes: Int = 5,
                         bucketO: Option[(String, Int)] = None,
                         ptime: Option[(String, String)] = None,
                         ident: Option[(String, Option[Int])] = None,
                         hllCols: Seq[String] = Nil,
                         lenientLayout: Boolean = false): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(relFiles.map(r => s"$root/$r"): _*)
    val schema = df.schema
    statsCols.foreach { c =>
      schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType | StringType |
             TimestampType | TimestampNTZType | DateType => ()
        case other => throw new IllegalArgumentException(
          s"zone maps support integral, string, timestamp, and date " +
            s"columns; $c is $other")
      }
    }
    val aggs = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column]()
    aggs ++= statsCols.flatMap { c =>
      val e = statLongExpr(col(c), schema(c).dataType)
      Seq(min(e).as(s"__lo_$c"), max(e).as(s"__hi_$c"))
    }
    aggs += count(lit(1)).as("__cnt")
    aggs ++= dictCols.map { c =>
      schema(c).dataType match {
        case StringType | LongType | IntegerType | ShortType | ByteType => ()
        case other => throw new IllegalArgumentException(
          s"file dictionaries support integral and string columns; $c is $other")
      }
      // BOUNDED dict aggregate: at most dictCap+1 distinct values leave
      // the executors per file — enough to decide overflow (size > cap
      // ⟺ the capped slice has cap+1 elements) without ever shipping a
      // high-cardinality column's full distinct set to the driver (the
      // uncapped collect_set made every __dictover file's whole set
      // cross the wire just to be discarded — a driver OOM at 100 TB).
      slice(sort_array(collect_set(col(c))), 1, dictCap + 1).as(s"__d_$c")
    }
    if (bloomCols.nonEmpty) {
      require(bloomBits > 0 && bloomBits % 8 == 0,
        s"bloom bits must be a positive multiple of 8, got $bloomBits")
      require(bloomHashes >= 1, s"bloom needs at least one hash, got $bloomHashes")
    }
    aggs ++= bloomCols.flatMap { c =>
      val probe: org.apache.spark.sql.Column = schema(c).dataType match {
        case StringType => col(c)
        case LongType | IntegerType | ShortType | ByteType => col(c).cast(LongType)
        case other => throw new IllegalArgumentException(
          s"bloom filters support integral and string columns; $c is $other")
      }
      (0 until bloomHashes).map(i => collect_set(when(col(c).isNotNull,
        pmod(xxhash64(lit(i), probe), lit(bloomBits.toLong)).cast(IntegerType)))
        .as(s"__b${i}_$c"))
    }
    bucketO.foreach { case (k, n) =>
      val b = bucketIdCol(k, n)
      aggs += min(b).as("__blo"); aggs += max(b).as("__bhi")
    }
    ptime.foreach { case (c, u) =>
      val p = timeOrdCol(col(c), schema(c).dataType, u)
      aggs += min(p).as("__plo"); aggs += max(p).as("__phi")
    }
    ident.foreach { case (c, w) =>
      val k = identKeyCol(col(c), schema(c).dataType, w)
      aggs += min(k).as("__ilo"); aggs += max(k).as("__ihi")
    }
    aggs ++= hllCols.flatMap { c =>
      val in = schema(c).dataType match {
        case StringType | LongType | IntegerType => col(c)
        case ShortType | ByteType => col(c).cast(IntegerType)
        case TimestampType | TimestampNTZType | DateType =>
          statLongExpr(col(c), schema(c).dataType)
        case other => throw new IllegalArgumentException(
          s"hll sketches support integral, string, timestamp, and date " +
            s"columns; $c is $other")
      }
      Seq(hex(hll_sketch_agg(in)).as(s"__h_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"))
    }
    val fusedAgg = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail.toSeq: _*)
    graft.ops.PlanDump.dump("sink_fused_stats", fusedAgg)
    val collected = fusedAgg.collect()
    val marker = rootMarker(root)
    def relOf(full: String): String = {
      val at = full.indexOf(marker)
      if (at >= 0) full.substring(at + marker.length)
      else full.split("/").takeRight(2).mkString("/")
    }
    // layout flavors validate up front, per flavor: strict callers get
    // the dedicated paths' exact require message naming the first
    // offending file; lenient callers drop just that flavor's rows
    def flavorClean(loCol: String, hiCol: String, what: String): Boolean = {
      collected.foreach { r =>
        val lo = r.getAs[Any](loCol); val hi = r.getAs[Any](hiCol)
        val single = lo != null && lo == hi
        if (!single) {
          if (lenientLayout) return false
          require(single, s"$what ${relOf(r.getAs[String]("__f"))}: $lo..$hi")
        }
      }
      true
    }
    val bucketClean = bucketO.isDefined && flavorClean("__blo", "__bhi",
      "bucketed stage produced a mixed-bucket file")
    val ptimeClean = ptime.isDefined && flavorClean("__plo", "__phi",
      "time-partitioned stage produced a mixed-ordinal file")
    val identClean = ident.isDefined && flavorClean("__ilo", "__ihi",
      "identity/truncate stage produced a mixed-value file")
    def asLong(v: Any): java.lang.Long = v match {
      case null => null
      case l: Long => java.lang.Long.valueOf(l)
      case i: Int => java.lang.Long.valueOf(i.toLong)
      case s: Short => java.lang.Long.valueOf(s.toLong)
      case b: Byte => java.lang.Long.valueOf(b.toLong)
      case other => throw new IllegalStateException(s"unexpected stat value $other")
    }
    val rows = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    collected.foreach { r =>
      val file = relOf(r.getAs[String]("__f"))
      statsCols.foreach { c =>
        val isStr = schema(c).dataType == StringType
        val lo = r.getAs[Any](s"__lo_$c"); val hi = r.getAs[Any](s"__hi_$c")
        rows += org.apache.spark.sql.Row(file, c,
          if (isStr) null else asLong(lo), if (isStr) null else asLong(hi),
          if (isStr) lo else null, if (isStr) hi else null)
      }
      // __count rides the ZONE-MAP flavor exactly as in fileStats — a
      // layout-only stage (no statsCols) must not grow one (the
      // metadata-agg coverage checks key on its presence)
      if (statsCols.nonEmpty)
        rows += org.apache.spark.sql.Row(file, "__count",
          asLong(r.getAs[Any]("__cnt")), null, null, null)
      dictCols.foreach { c =>
        val isStr = schema(c).dataType == StringType
        val set = r.getAs[scala.collection.Seq[Any]](s"__d_$c")
        if (set.size > dictCap)
          rows += org.apache.spark.sql.Row(file, s"__dictover:$c", null, null, null, null)
        else set.foreach { v =>
          rows += org.apache.spark.sql.Row(file, s"__dict:$c",
            if (isStr) null else asLong(v), null,
            if (isStr) v.toString else null, null)
        }
      }
      bloomCols.foreach { c =>
        val bytes = new Array[Byte](bloomBits / 8)
        var any = false
        (0 until bloomHashes).foreach { i =>
          r.getAs[scala.collection.Seq[Int]](s"__b${i}_$c").foreach { p =>
            bytes(p / 8) = (bytes(p / 8) | (1 << (p % 8))).toByte
            any = true
          }
        }
        // a file whose bloom column is entirely null emits NO __bloom
        // row (the dedicated builder's exact output: explode+filter saw
        // zero positions for it) — the file is then KEPT on point
        // lookups, byte-identical stats either way
        if (any)
          rows += org.apache.spark.sql.Row(file, s"__bloom:$c",
            bloomBits.toLong, bloomHashes.toLong,
            bytes.map("%02x".format(_)).mkString, null)
      }
      if (bucketClean) bucketO.foreach { case (k, n) =>
        val lo = r.getAs[Any]("__blo")
        rows += org.apache.spark.sql.Row(file, s"__bucket:$k:$n",
          asLong(lo), asLong(lo), null, null)
      }
      if (ptimeClean) ptime.foreach { case (c, u) =>
        val lo = r.getAs[Any]("__plo")
        rows += org.apache.spark.sql.Row(file, s"__ptime:$c:$u",
          asLong(lo), asLong(lo), null, null)
      }
      if (identClean) ident.foreach { case (c, w) =>
        val isStr = schema(c).dataType == StringType
        val lo = r.getAs[Any]("__ilo")
        val spec = w.fold(s"__ident:$c")(wd => s"__trunc:$c:$wd")
        rows += org.apache.spark.sql.Row(file, spec,
          if (isStr) null else asLong(lo), if (isStr) null else asLong(lo),
          if (isStr) lo.toString else null, if (isStr) lo.toString else null)
      }
      hllCols.foreach { c =>
        rows += org.apache.spark.sql.Row(file, s"__hll:$c",
          null, null, r.getAs[String](s"__h_$c"), null)
        rows += org.apache.spark.sql.Row(file, s"__nulls:$c",
          asLong(r.getAs[Any](s"__n_$c")), null, null, null)
      }
    }
    Some(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rows.toSeq: _*)),
      emptyStats(spark).schema))
  }




  /** Publish with zone maps AND per-file bloom filters (see
    * [[bloomStats]]): `bloomCols` get probabilistic point-lookup
    * skipping for high-cardinality keys where a dictionary would
    * overflow and a hash layout blinds the min/max. */
  def publishWithBloom(df: DataFrame, root: String, epoch: Int,
                       statsCols: Seq[String], bloomCols: Seq[String],
                       bloomBits: Int = 16384, bloomHashes: Int = 5,
                       txn: Option[Txn] = None): Int =
    commitStaged(df.sparkSession,
      stage(df, root, epoch, statsCols, unique = false, Nil, 256,
        bloomCols, bloomBits, bloomHashes), txn)

  /** The probe side of [[bloomStats]]: the candidate value's k bit
    * positions under (m, k), computed with the SAME Spark expression
    * the write side used (a 1-row local plan — constant-folded, no
    * job). */
  private[sink] def bloomProbePositions(spark: SparkSession,
                             value: org.apache.spark.sql.Column,
                             m: Long, k: Long): Seq[Int] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.IntegerType
    val row = spark.range(1).select((0 until k.toInt).map(i =>
      pmod(xxhash64(lit(i), value), lit(m)).cast(IntegerType).as(s"p$i")): _*)
      .head()
    (0 until k.toInt).map(row.getInt)
  }

  private[sink] def bloomHexTest(hex: String, positions: Seq[Int]): Boolean =
    positions.forall { p =>
      val b = Integer.parseInt(hex.substring((p / 8) * 2, (p / 8) * 2 + 2), 16)
      (b & (1 << (p % 8))) != 0
    }

  /** POINT read through the file dictionaries (falling back to the
    * zone map, then to conservative keep): scan only files that can
    * contain `value`. Returns (frame, selected, total manifest files). */
  def readPointPruned(spark: SparkSession, root: String, statsCol: String,
                      value: Long, epoch: Int = -1): (DataFrame, Int, Int) =
    pointPruned(spark, root, statsCol, epoch, r =>
      if (r.isNullAt(2)) false else r.getLong(2) == value,
      r => !r.isNullAt(2) && !r.isNullAt(3) &&
        r.getLong(2) <= value && value <= r.getLong(3),
      org.apache.spark.sql.functions.lit(value))

  /** String variant of [[readPointPruned]]. */
  def readPointPrunedString(spark: SparkSession, root: String, statsCol: String,
                            value: String, epoch: Int = -1): (DataFrame, Int, Int) =
    pointPruned(spark, root, statsCol, epoch, r =>
      if (r.isNullAt(4)) false else r.getString(4) == value,
      r => !r.isNullAt(4) && !r.isNullAt(5) &&
        r.getString(4) <= value && value <= r.getString(5),
      org.apache.spark.sql.functions.lit(value))

  /** Skipping ladder per file: exact dictionary when present, bloom
    * probe next (no false negatives, so it safely overrides the
    * overflow sentinel), overflow sentinel -> keep, zone map last,
    * conservative keep when nothing covers the file. */
  private def pointPruned(spark: SparkSession, root: String, c: String,
                          epoch: Int,
                          dictHit: org.apache.spark.sql.Row => Boolean,
                          zoneHit: org.apache.spark.sql.Row => Boolean,
                          probe: org.apache.spark.sql.Column): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    val wanted = Set(c, s"__dict:$c", s"__dictover:$c", s"__bloom:$c")
    val rows = SnapshotCache.statRows(spark, root, e)
      .getOrElse(Array.empty[org.apache.spark.sql.Row])
      .filter(r => wanted(r.getString(1)))
    val byFile = rows.groupBy(_.getString(0))
    // the probe value's bit positions, once per committed (m, k)
    val posCache = scala.collection.mutable.Map.empty[(Long, Long), Seq[Int]]
    def positions(m: Long, k: Long): Seq[Int] =
      posCache.getOrElseUpdate((m, k), bloomProbePositions(spark, probe, m, k))
    val all = manifestEntries(spark, root, e).map(_._1)
    val hit = all.filter { f =>
      byFile.get(f) match {
        case None => true // no stats for this file: conservative keep
        case Some(rs) =>
          val dict = rs.filter(_.getString(1) == s"__dict:$c")
          val bloom = rs.filter(_.getString(1) == s"__bloom:$c")
          if (dict.nonEmpty) dict.exists(dictHit)
          else if (bloom.nonEmpty) bloom.exists(r =>
            bloomHexTest(r.getString(4), positions(r.getLong(2), r.getLong(3))))
          else if (rs.exists(_.getString(1) == s"__dictover:$c")) true
          else rs.filter(_.getString(1) == c) match {
            case zs if zs.nonEmpty => zs.exists(zoneHit)
            case _ => true
          }
      }
    }.sorted
    val df =
      if (hit.isEmpty) read(spark, root, e).filter(lit(false))
      else dvScopedScan(spark, root, e, hit,
        fs => spark.read.parquet(fs.map(n => s"$root/$n"): _*))
    (df, hit.length, all.length)
  }

  /** The committed zone-map stats table of `epoch`:
    * (file, col, lo_long, hi_long, lo_str, hi_str). */
  def statsTable(spark: SparkSession, root: String, epoch: Int): DataFrame = {
    val (token, _) = commitInfo(spark, root, epoch)
    spark.read.parquet(s"$root/stats-$epoch.$token")
  }

  /** METADATA-ONLY AGGREGATION — answer `count(*)` and per-column
    * min/max WITHOUT opening a single data file (Iceberg's
    * manifest-stats aggregation): every stats-carrying commit records
    * a `__count` row per file and (min, max) zone maps, and
    * count/min/max are mergeable statistics, so the table-level answer
    * is an exact fold over the stats table — at 100 TB the difference
    * between a metadata read bounded by the FILE count and a full
    * scan bounded by the ROW count. Returns a one-row frame
    * (`cnt`, then `min_c`/`max_c` per requested column; integral
    * columns surface as long — the zone maps' storage type — strings
    * as string), planned from a local relation: ZERO data-file I/O,
    * which the spec pins by asserting no file scan in the plan.
    * Guards: refuses a DV-carrying epoch (deleted rows would count)
    * and any manifest file not covered by the stats — falling back to
    * a scan silently would defeat the contract, so incomplete
    * metadata fails fast instead. min/max ignore all-null files
    * (SQL semantics); a column null in EVERY file yields null. */
  def aggFromMetadata(spark: SparkSession, root: String, cols: Seq[String],
                      epoch: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{LongType, StringType}
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    require(commitDvs(spark, root, e).isEmpty,
      "metadata aggregation on a DV-carrying epoch would count deleted rows; compact first")
    val rows = SnapshotCache.statRows(spark, root, e)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"epoch $e at $root committed no stats table"))
    val all = manifestEntries(spark, root, e).map(_._1).toSet
    val counts = rows.filter(r => r.getString(1) == "__count" && all(r.getString(0)))
    require(counts.map(_.getString(0)).toSet == all,
      s"epoch $e at $root: some manifest files carry no __count stats row " +
        "(written before row counts landed, or without statsCols); recompute stats")
    val cnt = counts.map(_.getLong(2)).sum
    val aggCols = cols.flatMap { c =>
      val zs = rows.filter(r => r.getString(1) == c && all(r.getString(0)))
      require(zs.map(_.getString(0)).toSet == all,
        s"epoch $e at $root: column $c lacks zone maps for every manifest file")
      if (zs.exists(r => !r.isNullAt(4))) { // string zone maps
        // fold in UTF8String BINARY order — the order Spark's min/max
        // produced the bounds in (Java String order diverges for
        // supplementary-plane code points; the ADVICE r11 class)
        val u8 = org.apache.spark.unsafe.types.UTF8String.fromString _
        val los = zs.collect { case r if !r.isNullAt(4) => r.getString(4) }
        val his = zs.collect { case r if !r.isNullAt(5) => r.getString(5) }
        Seq(los.reduceOption((a, b) => if (u8(a).compareTo(u8(b)) <= 0) a else b)
            .map(lit).getOrElse(lit(null).cast(StringType)).as(s"min_$c"),
          his.reduceOption((a, b) => if (u8(a).compareTo(u8(b)) >= 0) a else b)
            .map(lit).getOrElse(lit(null).cast(StringType)).as(s"max_$c"))
      } else {
        val los = zs.collect { case r if !r.isNullAt(2) => r.getLong(2) }
        val his = zs.collect { case r if !r.isNullAt(3) => r.getLong(3) }
        Seq(los.minOption.map(lit).getOrElse(lit(null).cast(LongType)).as(s"min_$c"),
          his.maxOption.map(lit).getOrElse(lit(null).cast(LongType)).as(s"max_$c"))
      }
    }
    spark.range(1).select(lit(cnt).as("cnt") +: aggCols: _*)
  }

  private def prunedRead(spark: SparkSession, root: String, e: Int,
                         statsCol: String,
                         overlaps: org.apache.spark.sql.Row => Boolean): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val rows = SnapshotCache.statRows(spark, root, e)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"epoch $e at $root committed no stats table"))
      .filter(_.getString(1) == statsCol)
    val hit = rows.filter(overlaps).map(_.getString(0)).sorted
    val df =
      if (hit.isEmpty)
        // schema-preserving EMPTY frame (optimizes to an empty local
        // relation — zero I/O), never an un-pruned fallback scan that
        // could surface orphan rows or the wrong file set (ADVICE r10)
        read(spark, root, e).filter(lit(false))
      else
        // merge-on-read deletes apply to pruned reads too (epoch-scoped)
        dvScopedScan(spark, root, e, hit.toSeq,
          fs => spark.read.parquet(fs.map(n => s"$root/$n"): _*))
    (df, hit.length, rows.length)
  }

  /** Range read through the zone maps of an integral column: scan ONLY
    * files whose [lo, hi] overlaps [from, to]. Returns the pruned
    * frame and the (selected, total) file counts as evidence. Files
    * with null bounds (all-null column) are kept conservatively. */
  def readRangePruned(spark: SparkSession, root: String, statsCol: String,
                      from: Long, to: Long, epoch: Int = -1): (DataFrame, Int, Int) = {
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    prunedRead(spark, root, e, statsCol, r =>
      r.isNullAt(2) || r.isNullAt(3) || (r.getLong(3) >= from && r.getLong(2) <= to))
  }

  /** Range read through the zone maps of a STRING column ([from, to]
    * inclusive). Pruning compares in UTF8String BINARY order — the
    * order Spark's min/max produced the committed bounds in. (Java
    * String order is UTF-16 code-unit order, which diverges for
    * supplementary-plane code points and would wrongly prune files —
    * ADVICE r11.) */
  def readRangePrunedString(spark: SparkSession, root: String, statsCol: String,
                            from: String, to: String, epoch: Int = -1): (DataFrame, Int, Int) = {
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    import org.apache.spark.unsafe.types.UTF8String
    def u8(s: String) = UTF8String.fromString(s)
    prunedRead(spark, root, e, statsCol, r =>
      r.isNullAt(4) || r.isNullAt(5) ||
        (u8(r.getString(5)).compareTo(u8(from)) >= 0 &&
          u8(r.getString(4)).compareTo(u8(to)) <= 0))
  }

  /** Compact the CURRENT epoch into a new one — the "rewrite data
    * files" maintenance op that closes the manifest lifecycle: an
    * append-committed stream leaves one file set per batch; this
    * reads the committed view, rewrites it range-clustered on the
    * FIRST stats column into `numFiles` files, and publishes the
    * rewrite as epoch cur+1 WITH fresh zone maps for ALL `statsCols`.
    * Readers never see an intermediate state (the commit marker CAS
    * is the only visibility flip; old epochs stay pinned for travel
    * until `vacuum` reclaims them — which also deletes the
    * now-unreferenced pre-compaction files). Returns the new epoch. */
  def compact(spark: SparkSession, root: String, statsCols: Seq[String],
              numFiles: Int = 4): Int = {
    import org.apache.spark.sql.functions.col
    val cur = currentEpoch(spark, root)
    val next = cur + 1
    publishWithStats(
      read(spark, root)
        .repartitionByRange(numFiles, col(statsCols.head))
        .sortWithinPartitions(statsCols.head),
      root, next, statsCols)
    next
  }

  /** COPY-ON-WRITE MERGE (upsert) — the Delta/Iceberg MERGE economics
    * on the manifest table: rows of `updates` replace current rows
    * with the same `keyCol`, unmatched update rows insert, and the
    * rewrite touches ONLY the files whose zone-map [lo, hi] overlaps
    * an update key — every other file carries into the new manifest
    * as pure metadata. At 100 TB this is the entire point of the
    * stats table: a narrow-key upsert rewrites a handful of files,
    * not the table (the naive merge is a full-table rewrite per
    * batch). Overlap is decided distributively — the (file, lo, hi)
    * ranges broadcast onto the update keys, so the update side never
    * collects — and the touched list is bounded by the file count.
    * Requires the current epoch to carry zone maps for `keyCol`;
    * `statsCols` (must include `keyCol`) are rewritten for the fresh
    * files and carried for the untouched ones.
    * @return (newEpoch, rewrittenFiles, carriedFiles) */
  def mergeCow(spark: SparkSession, root: String, updates: DataFrame,
               keyCol: String, statsCols: Seq[String],
               txn: Option[Txn] = None): (Int, Int, Int) =
    cowRewrite(spark, root, updates, keyCol, statsCols, insert = true, txn)

  /** COPY-ON-WRITE DELETE — the mergeCow machinery minus the insert:
    * every row whose `keyCol` appears in `keys` is removed, and the
    * rewrite touches only the files whose zone map overlaps a deleted
    * key. This is the takedown/right-to-erasure primitive a
    * training-data lakehouse needs at 100 TB: deleting one document's
    * rows rewrites the handful of files that hold them, atomically,
    * with the pre-delete epoch still pinned for audit until vacuum.
    * @return (newEpoch, rewrittenFiles, carriedFiles) */
  def deleteCow(spark: SparkSession, root: String, keys: DataFrame,
                keyCol: String, statsCols: Seq[String],
                txn: Option[Txn] = None): (Int, Int, Int) =
    cowRewrite(spark, root, keys, keyCol, statsCols, insert = false, txn)

  private def cowRewrite(spark: SparkSession, root: String, updates0: DataFrame,
                         keyCol0: String, statsCols0: Seq[String],
                         insert: Boolean, txn: Option[Txn]): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(statsCols0.contains(keyCol0), "statsCols must include the merge key")
    val cur = currentEpoch(spark, root)
    require(commitDvs(spark, root, cur).isEmpty,
      "CoW rewrite on a DV-carrying epoch would resurrect merge-on-read " +
        "deletes; materialize them first (compact) or use the SQL DML " +
        "path, whose scan is DV-aware")
    val next = cur + 1
    // mapped tables: updates arrive LOGICAL; the rewrite runs entirely
    // in PHYSICAL terms (stats keys, file columns, staged output)
    val tableSchemaEarly = commitSchema(spark, root, cur)
    val mapping = tableSchemaEarly.filter(ColumnMapping.hasMapping)
    // NOTE (r19, measured): the update frame executes up to three
    // times here (touched probe, survivors anti-join, staged union).
    // A generic localCheckpoint was A/B'd and REGRESSED 3 of 4
    // cow-heavy rows (+1.5-2.5 s each): typical updates are tiny
    // literal/delta frames where the materialization job costs more
    // than the re-executions. Callers with EXPENSIVE update pipelines
    // checkpoint at the call site instead (NnDescent.appendToGraph).
    val (updates, keyCol, statsCols) = mapping match {
      case Some(p) =>
        val phys = ColumnMapping.physOf(p)
        (ColumnMapping.toPhysicalDf(updates0, p),
          phys.getOrElse(keyCol0, keyCol0),
          statsCols0.map(c => phys.getOrElse(c, c)))
      case None => (updates0, keyCol0, statsCols0)
    }
    val stats = statsTable(spark, root, cur)
    // type-aware overlap: string merge keys compare against
    // (lo_str, hi_str), integral ones against (lo_long, hi_long) —
    // comparing a string key to the always-null long bounds would make
    // `touched` empty and silently corrupt the merge (inserts without
    // replacement; deletes that delete nothing) (ADVICE r11). The
    // comparison itself runs IN Spark, so string order is UTF8String
    // binary order — the same order that produced the committed
    // min/max.
    val keyIsStr = {
      import org.apache.spark.sql.types.{StringType, LongType, IntegerType, ShortType, ByteType}
      updates.schema(keyCol).dataType match {
        case StringType => true
        case LongType | IntegerType | ShortType | ByteType => false
        case other => throw new IllegalArgumentException(
          s"CoW merge key must be integral or string; $keyCol is $other")
      }
    }
    val keyRanges = stats.filter(col("col") === keyCol).select(
      col("file"),
      (if (keyIsStr) col("lo_str") else col("lo_long")).as("__lo"),
      (if (keyIsStr) col("hi_str") else col("hi_long")).as("__hi"))
    // touched = files whose range contains at least one update key;
    // ranges broadcast (file-count-bounded), update keys stay
    // distributed
    val touched = updates.select(col(keyCol).as("__k"))
      .join(broadcast(keyRanges),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val entries = manifestEntries3(spark, root, cur)
    val all = entries.map(_._1)
    val carried = all.filterNot(touched)
    val carriedSizes = knownSizes(entries).view.filterKeys(carried.contains).toMap
    val carriedEpochs = knownEpochs(entries).view.filterKeys(carried.contains).toMap
    // rewrite: touched rows that lose to an update key, plus (merge
    // only) every update row — replacements AND inserts
    val carriedStats = stats.filter(col("file").isin(carried: _*))
    val tableSchema = commitSchema(spark, root, cur)
    if (touched.isEmpty && !insert) {
      // delete with nothing to delete: a metadata-only new epoch —
      // no data write at all, the manifest and stats carry verbatim
      commitStaged(spark,
        Staged(root, next, newToken(), carried.sorted, Some(carriedStats),
          tableSchema.map(_.json), sizes = carriedSizes,
          fileEpochs = carriedEpochs), txn)
      return (next, 0, carried.size)
    }
    val survivors =
      if (touched.isEmpty) updates
      else {
        // touched files read under the TABLE schema (an evolved
        // table's pre-evolution files fill added columns with null);
        // mapped tables read the PHYSICAL shape — updates are already
        // in it
        val readSchema = mapping.map(ColumnMapping.physicalSchema)
          .orElse(tableSchema)
        val reader = readSchema.fold(spark.read)(spark.read.schema)
        val keep = reader.parquet(touched.map(n => s"$root/$n").toSeq: _*)
          .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        if (insert) keep.unionByName(updates) else keep
      }
    // layout-preserving CoW (VERDICT r16): the replacement batch lays
    // out under the current epoch's committed spec with its own
    // __bucket/__ptime rows, so the layout — and with it SPJ and exact
    // partition pruning — survives the rewrite (specs are stats-keyed
    // physical names, matching the physical-space rewrite)
    val layoutB = bucketSpec(spark, root, cur).map(b => (b.keyCol, b.numBuckets))
    val layoutT = ptimeSpec(spark, root, cur).map(t => (t.col, t.unit))
    val layoutI = identSpec(spark, root, cur).map(i => (i.col, i.width))
    graft.ops.PlanDump.dump("cow_survivors", survivors)
    val fresh = stage(survivors, root, next, statsCols,
      bucket = layoutB, ptime = layoutT, ident = layoutI)
    commitStaged(spark, fresh.copy(
      relFiles = (carried ++ fresh.relFiles).sorted,
      stats = Some(carriedStats.unionByName(fresh.stats.getOrElse(
        emptyStats(spark)))),
      // the committed schema is the TABLE's (mapping included) — the
      // staged files' physical shape must never overwrite it
      schemaJson = tableSchema.map(_.json).orElse(fresh.schemaJson),
      sizes = fresh.sizes ++ carriedSizes), txn)
    (next, fresh.relFiles.size, carried.size)
  }

  /** Attempt token for writers that stage OUTSIDE [[stage]] (the SQL
    * row-level write path stages through Spark's own distributed
    * parquet committer into an attempt-unique dir, then commits via
    * [[commitReplaceGroups]]). */
  def newAttemptToken(): String = newToken()

  // ------------------------------------------ optimistic conflict resolution

  /** `spark.graft.isolation`: `write-serializable` (default — the
    * Delta level: blind appends and row-level commits over DISJOINT
    * file sets reorder across each other via rebase) or
    * `serializable` (any epoch advance fails a derived commit, the
    * pre-r14 behavior). */
  def isolationSerializable(spark: SparkSession): Boolean =
    spark.sessionState.conf
      .getConfString("spark.graft.isolation", "write-serializable") ==
      "serializable"

  /** Bounded optimistic-concurrency retries for derived commits
    * (`spark.graft.commit.maxRetries`). */
  /** Test seam for DETERMINISTIC commit-CAS races: fired ONCE
    * (self-clearing) after an attempt's manifest/stats land, right
    * before its CAS rename — so a spec can put a racing commit exactly
    * inside the loser-cleanup window (thread timing cannot sit under
    * an oracle). */
  @volatile var commitCasRaceHook: Option[() => Unit] = None

  def commitMaxRetries(spark: SparkSession): Int =
    spark.sessionState.conf
      .getConfString("spark.graft.commit.maxRetries", "5").toInt

  /** The Delta-ConflictChecker / Iceberg-validation REBASE CHECK for a
    * row-level (replace-groups) commit that found the table advanced:
    * the commit's scan/rewrite stays valid against `cur` iff every
    * intervening epoch (base, cur] changed NOTHING the operation read —
    *
    *  - no file REMOVALS (a rewrite/compaction/truncate/rollback could
    *    have touched the replaced groups' key space);
    *  - no added file inside the replaced set (impossible for fresh
    *    token-named files; checked anyway);
    *  - no added file that may OVERLAP the operation's READ SET
    *    (ADVICE r14: a racing append of a matching key would have been
    *    read — Delta's ConcurrentAppendException even under
    *    WriteSerializable). The caller describes its read set through
    *    `appendGuard`: given (epoch, added rel paths), return
    *    Some(reason) when overlap is possible, None when the added
    *    files provably hold no row the operation read. No guard =
    *    no way to bound the read set = any data-adding epoch fails;
    *  - no schema change (the replacement files were written in the
    *    base shape);
    *  - no delete-vector change (a concurrent takedown invalidates the
    *    rows the scan produced — rewritten files MATERIALIZE vectors,
    *    so committing a pre-takedown rewrite would resurrect them).
    *
    * Guard-cleared appends and pure-metadata epochs (ANALYZE stats,
    * constraint DDL) pass; the MERGE-vs-MERGE / MERGE-vs-compaction
    * overlap fails exactly as before. Throws
    * [[ManifestConflictException]] when ineligible. */
  private def checkReplaceRebase(spark: SparkSession, root: String,
                                 baseEpoch: Int, cur: Int,
                                 replaced: Set[String],
                                 appendGuard: Option[(Int, Set[String]) => Option[String]]): Unit = {
    def fail(e: Int, why: String): Nothing =
      throw new ManifestConflictException(root, baseEpoch + 1,
        s"table advanced to epoch $cur while a row-level operation ran " +
          s"against epoch $baseEpoch, and epoch $e is not rebase-eligible: " +
          s"$why; retry against the current epoch")
    if (isolationSerializable(spark))
      fail(cur, "spark.graft.isolation=serializable disables rebase")
    var prev = manifestEntries3(spark, root, baseEpoch).map(_._1).toSet
    (baseEpoch + 1 to cur).foreach { e =>
      val rels = manifestEntries3(spark, root, e).map(_._1).toSet
      val removed = prev -- rels
      if (removed.nonEmpty)
        fail(e, s"it removed ${removed.size} file(s) (rewrite/compaction)")
      val added = rels -- prev
      if (added.exists(replaced))
        fail(e, "it added a file inside the replaced group set")
      if (added.nonEmpty) appendGuard match {
        case None =>
          fail(e, s"it appended ${added.size} file(s) and the operation " +
            "carries no read-set bound to clear them against")
        case Some(g) => g(e, added).foreach(why =>
          fail(e, s"it appended ${added.size} file(s): $why"))
      }
      if (commitSchema(spark, root, e).map(_.json) !=
          commitSchema(spark, root, e - 1).map(_.json))
        fail(e, "it changed the table schema")
      if (commitDvs(spark, root, e) != commitDvs(spark, root, e - 1))
        fail(e, "it changed the delete vectors (concurrent takedown)")
      prev = rels
    }
  }

  /** REBASE a staged INSERT onto the current epoch after a lost CAS
    * race (Delta's blind-append discipline) — reuses the already
    * written data files instead of re-running the whole write. An
    * insert depends on prior state only through the carried
    * list/stats/DV metadata and the schema contract, so it rebases
    * whenever the committed schema is UNCHANGED since staging and the
    * staged files still exist (the attempt dir's embedded epoch falls
    * at or below the advanced current epoch, making it vacuum-eligible
    * — a swept stage returns None and the caller restages in full).
    * Overwrites carry nothing: their rebase is just the next epoch
    * number. Returns the rebased Staged, or None → full restage. */
  def rebaseStagedInsert(spark: SparkSession, staged: Staged,
                         overwrite: Boolean,
                         observedSchemaJson: Option[String]): Option[Staged] = {
    import org.apache.spark.sql.functions.col
    if (isolationSerializable(spark)) return None
    val root = staged.root
    val cur = currentEpochOpt(spark, root).getOrElse(return Some(staged))
    if (cur < staged.epoch) return Some(staged)
    if (commitSchema(spark, root, cur).map(_.json) != observedSchemaJson)
      return None // schema moved: drift/mapping discipline must re-run
    // the attempt dir's TOKEN identifies the fresh files across
    // rebases (the dir name embeds the epoch the stage was first
    // derived for, which a prior rebase may already have outgrown)
    val freshMark = s"-a${staged.token}/"
    val fresh = staged.relFiles.filter(_.contains(freshMark))
    val f = fs(spark, new org.apache.hadoop.fs.Path(root))
    val freshLive = fresh.forall(r =>
      f.exists(new org.apache.hadoop.fs.Path(s"$root/$r")))
    if (!freshLive) return None // a vacuum swept the stage: rewrite it
    val next = cur + 1
    if (overwrite)
      // a fresh full snapshot carries nothing from the beaten epoch
      return Some(staged.copy(epoch = next,
        fileEpochs = fresh.map(_ -> next).toMap))
    val entries = manifestEntries3(spark, root, cur)
    val prior = entries.map(_._1)
    val freshStats = staged.stats.map(_.filter(col("file").isin(fresh: _*)))
    val stats = freshStats.map { fd =>
      if (statsExists(spark, root, cur)) statsTable(spark, root, cur).unionByName(fd)
      else fd
    }
    Some(staged.copy(epoch = next,
      relFiles = (prior ++ fresh).sorted,
      stats = stats,
      dvs = commitDvs(spark, root, cur),
      sizes = staged.sizes.view.filterKeys(fresh.contains).toMap ++
        knownSizes(entries),
      fileEpochs = knownEpochs(entries) ++ fresh.map(_ -> next)))
  }

  /** Recursive rel-path → size listing of a staged dir's parquet
    * files. Layout-preserving replacement writes (round 18 —
    * [[graft.catalog.GraftReplaceWrite]]) stage into partition
    * SUBDIRECTORIES (`__p0=<v>/part-*.parquet`, the Hive/Iceberg
    * data-layout convention), so every consumer of a replace-groups
    * stage must list recursively; flat stages list identically. */
  def listStagedParquet(spark: SparkSession, root: String,
                        dirName: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$dirName")
    val f = fs(spark, p)
    if (!f.exists(p)) return Map.empty
    val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
      .stripSuffix("/")
    val it = f.listFiles(p, true)
    val out = Map.newBuilder[String, Long]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      val rel = s.getPath.toUri.getPath.stripPrefix(rootUri + "/")
      if (s.isFile && name.endsWith(".parquet") && !name.startsWith(".") &&
          !name.startsWith("_") && !rel.contains("/_temporary/"))
        out += rel -> s.getLen
    }
    out.result()
  }

  /** True iff `epoch` carries any fully-covering committed layout. */
  def hasLayout(spark: SparkSession, root: String, epoch: Int): Boolean =
    bucketSpec(spark, root, epoch).isDefined ||
      ptimeSpec(spark, root, epoch).isDefined ||
      identSpec(spark, root, epoch).isDefined

  /** Apply `baseEpoch`'s committed layout to an IN-MEMORY replacement
    * batch, so a caller that HAS the batch as a DataFrame (the
    * over-cap MoR→CoW materialization) writes ONCE with the layout in
    * place. (SQL row-level DML needs no DataFrame-side placement at
    * all — [[graft.catalog.GraftReplaceWrite]] declares the layout to
    * Spark via RequiresDistributionAndOrdering and rotates staged
    * files per key.) Returns `df` unchanged when the base has no
    * layout. */
  def layoutForBase(spark: SparkSession, root: String, baseEpoch: Int,
                    df: DataFrame): DataFrame = {
    val bs = bucketSpec(spark, root, baseEpoch)
    val ts = ptimeSpec(spark, root, baseEpoch)
    val is = identSpec(spark, root, baseEpoch)
    (bs, ts, is) match {
      case (Some(b), Some(t), None) =>
        composedLayout(df, t.col, t.unit, b.keyCol, b.numBuckets)
      case (Some(b), None, None) => bucketLayout(df, b.keyCol, b.numBuckets)
      case (None, Some(t), None) => timeLayout(df, t.col, t.unit)
      case (None, None, Some(i)) => identLayout(df, i.col, i.width)
      case (Some(b), None, Some(i)) =>
        identPairLayout(df, i.col, i.width,
          bucketIdCol(b.keyCol, b.numBuckets), b.keyCol, sortIdentFirst = true)
      case (None, Some(t), Some(i)) =>
        identPairLayout(df, i.col, i.width,
          timeOrdCol(org.apache.spark.sql.functions.col(t.col),
            df.schema(t.col).dataType, t.unit), t.col, sortIdentFirst = false)
      case _ => df
    }
  }

  /** Layout stats rows for replace-groups REPLACEMENT files — the
    * commit half of layout-preserving CoW: one `__bucket` / `__ptime`
    * row per staged file under the current epoch's spec(s), emitted
    * only when every staged file verifies single-key (lenient — a
    * caller that staged key-mixed files gets no rows and the table
    * degrades honestly, exactly the pre-r17 contract). */
  private def replacementLayoutStats(spark: SparkSession, root: String,
                                     cur: Int, relFiles: Seq[String]): DataFrame = {
    if (relFiles.isEmpty) return emptyStats(spark)
    // spec detection is metadata-only; the verification scan of the
    // replacement files then runs ONCE for every present flavor (the
    // per-flavor lenient drop preserves partial coverage exactly as
    // the three dedicated passes did)
    val b = bucketSpec(spark, root, cur).map(s => (s.keyCol, s.numBuckets))
    val t = ptimeSpec(spark, root, cur).map(s => (s.col, s.unit))
    val i = identSpec(spark, root, cur).map(s => (s.col, s.width))
    if (b.isEmpty && t.isEmpty && i.isEmpty) emptyStats(spark)
    else fusedStats(spark, root, relFiles, statsCols = Nil,
      bucketO = b, ptime = t, ident = i, lenientLayout = true)
      .getOrElse(emptyStats(spark))
  }

  /** Collapse a publishing branch's STAGED delete vectors into ONE
    * vector scoped exactly at `target.epoch + 1` (round 18, clearing
    * the r17-advice scope-stacking bug): the branch pipeline is
    * inserts-then-deletes (an INSERT after a branch delete is refused
    * at stage time — [[graft.catalog.GraftTable]]'s branch write
    * guard), so the UNION of all staged takedown keys, scoped one
    * above the publish epoch, hides those keys in base files, the
    * branch's own fresh files, and racing live writes alike while
    * EXEMPTING every post-publish epoch. Keeping stage-epoch names
    * verbatim (the old fast-forward) or renumbering each DV above the
    * rebased epoch (the old rebase) published scopes HIGHER than
    * publishedEpoch+1, so a post-publish re-insert of a taken-down
    * key at those epochs silently vanished — violating the
    * epoch-scoped-not-cumulative DV contract. The merged vector gets
    * a FRESH token (a stage-epoch name can equal the merged name —
    * overwriting an input mid-read); originals stay as sweepable
    * debris, so a later rebase attempt re-reads them intact. Keys are
    * cap-bounded (the branch delete enforced it) — metadata-priced.
    * Callers pass the ORIGINAL staged state (its dvs name the staged
    * files) and the about-to-commit state; used by BOTH publish paths
    * (fast-forward and rebase ladder). */
  def rebaseBranchDvs(spark: SparkSession, root: String,
                      orig: Staged, target: Staged): Staged = {
    val branchDvs = orig.dvs.filter(_._1.endsWith(s".${orig.token}"))
    if (branchDvs.isEmpty) return target
    val keyCol = branchDvs.head._2
    // two publish scopes, by class: DELETE vectors land one ABOVE the
    // published epoch (hide their keys in base files, the branch's own
    // fresh files, and racers — exempting post-publish epochs);
    // UPDATE-class vectors (`dv-N.u.*` — see
    // [[graft.catalog.BranchUpdateCommand]]) land AT the published
    // epoch: their keys' branch-file copies were already rewritten at
    // stage time, so the vector hides only base + racer copies while
    // exempting every branch file (all published at target.epoch),
    // including the update's own replacement rows.
    def merge(dvs: Seq[(String, String)], scope: Int): Option[(String, String)] =
      if (dvs.isEmpty) None
      else {
        val mergedRel = s"dv-$scope.${newToken()}"
        dvs.map(d => spark.read.parquet(s"$root/${d._1}"))
          .reduce(_ unionByName _).distinct().coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$mergedRel")
        Some((mergedRel, keyCol))
      }
    val (upd, del) = branchDvs.partition(_._1.contains(".u."))
    target.copy(dvs = target.dvs.filterNot(_._1.endsWith(s".${orig.token}")) ++
      merge(del, target.epoch + 1) ++ merge(upd, target.epoch))
  }

  /** Commit a REPLACE-GROUPS epoch — the commit half of SQL
    * MERGE/UPDATE/DELETE (group-based copy-on-write): the files in
    * `replaced` (rel paths) leave the manifest, every parquet file
    * under `stagedDirName` (already written by the caller's
    * distributed write, e.g. Spark's FileBatchWrite) enters it with
    * fresh zone maps for the base epoch's stats columns, and every
    * other file CARRIES with its stats rows as pure metadata. The
    * caller's scan/write must have run against `baseEpoch`; if the
    * table advanced meanwhile the commit fails with a retryable
    * [[ManifestConflictException]] (optimistic concurrency — the
    * replaced-group set is only valid against the epoch it was
    * derived from). A DV-carrying base CARRIES its delete vector into
    * the new epoch: the caller's scan applied the DV (the DSv2
    * row-level scan always does — [[graft.catalog.GraftRowLevelOperation]]),
    * so the staged replacement files are DV-clean (the rewrite
    * MATERIALIZES the deletes for the touched files) while untouched
    * files still need the vector. Keys physically absent everywhere
    * after the rewrite stay in the DV harmlessly (anti join misses). */
  /** A declared layout triple (bucket, time, identity/truncate) — the
    * shape [[stage]] takes as three parameters, bundled for callers
    * that thread it through commits. */
  final case class LayoutDecl(bucket: Option[(String, Int)],
                              ptime: Option[(String, String)],
                              ident: Option[(String, Option[Int])]) {
    def specStrings: Set[String] =
      (bucket.map { case (c, n) => s"__bucket:$c:$n" } ++
        ptime.map { case (c, u) => s"__ptime:$c:$u" } ++
        ident.map { case (c, w) =>
          w.fold(s"__ident:$c")(ww => s"__trunc:$c:$ww") }).toSet
    def isEmpty: Boolean = bucket.isEmpty && ptime.isEmpty && ident.isEmpty
  }

  def commitReplaceGroups(spark: SparkSession, root: String, baseEpoch: Int,
                          stagedDirName: String, replaced: Set[String],
                          txn: Option[Txn] = None,
                          appendGuard: Option[(Int, Set[String]) => Option[String]] = None,
                          reaudit: Option[() => Unit] = None,
                          declaredLayout: Option[LayoutDecl] = None): Int = {
    import org.apache.spark.sql.functions.col
    val stagedPath = new org.apache.hadoop.fs.Path(s"$root/$stagedDirName")
    val f = fs(spark, stagedPath)
    // recursive: layout-preserving replacement writes stage into
    // partition subdirectories (one per layout value)
    def listStage(): Map[String, Long] =
      listStagedParquet(spark, root, stagedDirName)
    // the staged replacement files as first observed: once the table
    // advances past the stage dir's embedded epoch, a concurrent
    // VACUUM could sweep it as an orphan — every attempt re-verifies
    // the listing and fails LOUDLY on loss (the r12 stream-stage
    // discipline) rather than committing an epoch that silently drops
    // the replacement rows
    val newSizes0 = listStage()
    var attempt = 0
    val maxRetries = commitMaxRetries(spark)
    var result = -1
    while (result < 0) {
      val cur = currentEpoch(spark, root)
      if (cur != baseEpoch)
        // OPTIMISTIC REBASE (VERDICT r13 / the Delta ConflictChecker
        // discipline): a racing epoch that is a pure append (or pure
        // metadata) disjoint from the replaced groups does not
        // invalidate this commit — land on the advanced epoch instead
        // of re-running the whole scan+rewrite. Ineligible races
        // (overlap, schema/DV change, serializable isolation) throw.
        checkReplaceRebase(spark, root, baseEpoch, cur, replaced, appendGuard)
      // re-run the caller's staged-file audit EVERY attempt (VERDICT
      // r14 #5): a racing epoch may have added a CHECK constraint —
      // which commits a metadata epoch exactly so this loop re-enters
      // — and the rebased files must never commit un-audited
      reaudit.foreach(_.apply())
      val newSizes = listStage()
      if (newSizes != newSizes0) throw new IllegalStateException(
        s"replace-groups stage $stagedDirName at $root changed underneath " +
          s"the commit (${newSizes0.size} -> ${newSizes.size} files): a " +
          "vacuum swept the staged replacements while the table advanced; " +
          "re-run the operation")
      val next = cur + 1
      val entries = manifestEntries3(spark, root, cur)
      val all = entries.map(_._1)
      require(replaced.subsetOf(all.toSet),
        s"replaced files not in epoch $cur's manifest: ${replaced -- all.toSet}")
      val carried = all.filterNot(replaced)
      val carriedSizes = knownSizes(entries).view.filterKeys(carried.contains).toMap
      val carriedEpochs = knownEpochs(entries).view.filterKeys(carried.contains).toMap
      val newRel = newSizes.keys.toSeq.sorted
      // a stats-less base commits a stats-less next epoch; a
      // stats-carrying base keeps carried rows verbatim and computes
      // fresh rows for the staged files over the same columns
      val baseToken = commitInfo(spark, root, cur)._1
      val hasStats = f.exists(new org.apache.hadoop.fs.Path(s"$root/stats-$cur.$baseToken"))
      val mergedStats =
        if (!hasStats) None
        else {
          val stats = statsTable(spark, root, cur)
          val statsCols = stats.select("col").distinct().collect()
            .map(_.getString(0)).filterNot(_.startsWith("__")).sorted.toSeq
          val carriedStats = stats.filter(col("file").isin(carried: _*))
          // layout-preserving CoW (VERDICT r16/r18): replacement
          // files staged single-key (the layout write rotates per
          // value) get their own layout rows, so the spec keeps
          // covering the whole manifest and the scan keeps
          // KeyGroupedPartitioning + exact pruning. A caller that
          // placed the batch under an explicitly DECLARED spec (the
          // scoped spec-evolution convergence — on a mixed-spec table
          // no committed whole-table spec exists to infer from)
          // passes it; verification is then STRICT (the files were
          // just placed — a mixed-key file is a placement bug, not an
          // honest degrade). Zone maps and the declared-layout rows
          // fuse into ONE verification pass over the replacement
          // batch (fusedStats); the inferred-spec fallback keeps its
          // own lenient pass.
          val freshAndLayout = declaredLayout match {
            case Some(ld) if newRel.nonEmpty && !ld.isEmpty =>
              fusedStats(spark, root, newRel, statsCols,
                bucketO = ld.bucket, ptime = ld.ptime, ident = ld.ident)
                .getOrElse(emptyStats(spark))
            case _ =>
              val freshStats =
                if (newRel.isEmpty || statsCols.isEmpty) emptyStats(spark)
                else zoneStats(spark, root, newRel, statsCols)
              freshStats.unionByName(
                replacementLayoutStats(spark, root, cur, newRel))
          }
          Some(carriedStats.unionByName(freshAndLayout))
        }
      val tableSchema = commitSchema(spark, root, cur)
      try {
        commitStaged(spark,
          Staged(root, next, stagedDirName.split("-a").last,
            (carried ++ newRel).sorted, mergedStats,
            tableSchema.map(_.json), dvs = commitDvs(spark, root, cur),
            sizes = carriedSizes ++ newSizes,
            // staged replacements default to `next` (above every DV
            // scope: the caller's scan already applied the vectors);
            // carried files keep their epochs so older DVs keep
            // applying to them
            fileEpochs = carriedEpochs), txn)
        result = next
      } catch {
        case c: ManifestConflictException =>
          // lost the CAS to yet another racer: loop — the next pass
          // re-validates the newly intervening epochs
          attempt += 1
          if (attempt >= maxRetries) throw c
      }
    }
    result
  }

  private def emptyStats(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("file", StringType), StructField("col", StringType),
        StructField("lo_long", LongType), StructField("hi_long", LongType),
        StructField("lo_str", StringType), StructField("hi_str", StringType))))
  }

  /** CHANGE DATA FEED — the row-level changes between two committed
    * epochs (Delta's `table_changes` surface), computed from the
    * MANIFEST DELTA rather than stored change files: for each epoch e
    * in (fromEpoch, toEpoch], only the files e REMOVED from and ADDED
    * to its predecessor's manifest are read — for an append epoch
    * that is exactly the batch, for a CoW merge/delete it is the
    * zone-map-bounded touch set, and for a compaction it is the
    * rewrite (whose rows diff to NOTHING, so compaction emits an
    * empty feed — the rewrite is physical, not semantic). The diff is
    * keyed on `keyCol` (the table's merge key, unique per snapshot —
    * the same contract [[mergeCow]] enforces): a key only in the
    * added files is an `insert`, only in the removed files a
    * `delete`, in both with different payload an `update_preimage` /
    * `update_postimage` pair, and in both unchanged (a carried
    * survivor of a rewritten file) no row at all. A rollback epoch
    * therefore emits exactly the INVERSE of the feed it undoes.
    *
    * At 100 TB the economics mirror the CoW write path: per epoch the
    * scan is the file delta (not the table), the one shuffle keys
    * only those rows, and the epoch loop is retention-bounded. Output
    * = table columns + `_change_type` + `_commit_epoch`. Both sides
    * read under the toEpoch schema, so evolved tables feed old files
    * with nulls in the added columns. */
  def tableChanges(spark: SparkSession, root: String, keyCol: String,
                   fromEpoch: Int, toEpoch: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromEpoch < toEpoch, s"need fromEpoch < toEpoch, got $fromEpoch >= $toEpoch")
    val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
    // epoch 0 = the empty table, so a feed from 0 opens with the first
    // epoch's snapshot-as-inserts (the streaming change-feed contract)
    def rel(e: Int): Seq[String] =
      if (e <= 0) Nil
      else manifestFiles(spark, root, e).map { p =>
        new org.apache.hadoop.fs.Path(p).toUri.getPath
          .stripPrefix(rootUri).stripPrefix("/")
      }
    val commitSch = commitSchema(spark, root, toEpoch)
    val mappedSch = commitSch.filter(ColumnMapping.hasMapping)
    val schema = commitSch.map(ColumnMapping.stripMapping)
      .getOrElse(read(spark, root, toEpoch).schema)
    val cols = schema.fieldNames.toSeq
    def readFiles(files: Seq[String]): DataFrame =
      if (files.isEmpty) read(spark, root, toEpoch).filter(lit(false))
      else mappedSch match {
        case Some(p) =>
          spark.read.schema(ColumnMapping.physicalSchema(p))
            .parquet(files.map(n => s"$root/$n"): _*)
            .select(ColumnMapping.toLogicalCols(p): _*)
        case None =>
          spark.read.schema(schema).parquet(files.map(n => s"$root/$n"): _*)
      }
    // a file read under an epoch that carries delete vectors must
    // exclude the vectored keys — the feed diffs VISIBLE rows, not
    // physical file bytes. Without this, a CoW rewrite over a standing
    // DV (replacement files are DV-clean, removed files are not) or a
    // DV-materializing compaction would emit spurious deletes for rows
    // the feed already reported deleted at their deleteMor epoch.
    // DVs are epoch-scoped, so the application goes through
    // [[dvScopedScan]] (per-file-group anti joins); the DV key is
    // PHYSICAL while readFiles surfaces LOGICAL names — translate.
    def logicalOf(k: String): String = commitSch
      .flatMap(s => ColumnMapping.logicalOfPhysical(s, k).map(_.name))
      .getOrElse(k)
    def visible(rels: Seq[String], ep: Int): DataFrame =
      if (ep <= 0) readFiles(rels)
      else dvScopedScan(spark, root, ep, rels, readFiles, logicalOf)
    (fromEpoch + 1 to toEpoch).map { e =>
      val prev = rel(e - 1).toSet
      val cur = rel(e).toSet
      // merge-on-read epochs remove rows by DV DELTA, not file delta:
      // the DV files NEW at this epoch (scoped lists carry old files
      // verbatim, so the delta is a rel-path set difference)
      // contribute their keys' pre-delete payloads to the PRE side
      // (one VISIBLE-snapshot scan semi-joined by the broadcast keys —
      // DV batches are keys-only small by contract; visibility at e-1
      // keeps already-deleted keys out). Feeding them through the SAME
      // full-outer join as file removals is what makes a MoR UPDATE
      // (DV + delta-file append in one epoch) surface as
      // update_preimage/update_postimage pairs instead of a spurious
      // delete+insert (round 15).
      val dvPrevRels =
        (if (e - 1 <= 0) Nil else commitDvs(spark, root, e - 1)).map(_._1).toSet
      val freshDvs = (if (e <= 0) Nil else commitDvs(spark, root, e))
        .filterNot(d => dvPrevRels.contains(d._1))
      val filePre = visible((prev -- cur).toSeq.sorted, e - 1)
        .select(struct(cols.map(col): _*).as("__pre"), col(keyCol).as("__pk"))
      val pre =
        if (freshDvs.isEmpty) filePre
        else {
          // the feed's one consistent shape is toEpoch's LOGICAL
          // schema (physical names are stable, so the pre-delete
          // snapshot reads fine under it even if columns were renamed
          // later in the range)
          val logicalKey = logicalOf(freshDvs.head._2)
          val freshKeys = freshDvs.map { case (relDv, _) =>
            spark.read.parquet(s"$root/$relDv").toDF(logicalKey)
          }.reduce(_ unionByName _)
          val morPre = visible(rel(e - 1).toSeq.sorted, e - 1)
            .join(broadcast(freshKeys), Seq(logicalKey), "left_semi")
            .select(struct(cols.map(col): _*).as("__pre"),
              col(keyCol).as("__pk"))
          filePre.unionByName(morPre)
        }
      val post = visible((cur -- prev).toSeq.sorted, e)
        .select(struct(cols.map(col): _*).as("__post"), col(keyCol).as("__ok"))
      // one full-outer join, one pass: each outcome explodes to its
      // 0/1/2 change rows so the join is never re-planned per branch
      pre.join(post, col("__pk") === col("__ok"), "full_outer")
        .select(explode(
          when(col("__pk").isNull,
            array(struct(lit("insert").as("t"), col("__post").as("r"))))
          .when(col("__ok").isNull,
            array(struct(lit("delete").as("t"), col("__pre").as("r"))))
          .when(!(col("__pre") <=> col("__post")), array(
            struct(lit("update_preimage").as("t"), col("__pre").as("r")),
            struct(lit("update_postimage").as("t"), col("__post").as("r"))))
          .otherwise(array().cast(
            s"array<struct<t:string,r:struct<${schema.toDDL}>>>"))).as("__c"))
        .select(col("__c.r.*") +: Seq(
          col("__c.t").as("_change_type"), lit(e).as("_commit_epoch")): _*)
    }.reduce(_ unionByName _)
  }

  /** MERGE-ON-READ DELETE — the Iceberg equality-delete discipline,
    * complementing [[deleteCow]]: instead of rewriting the touched
    * files NOW, the new epoch carries the SAME data file list plus a
    * small keys-only DELETE-VECTOR parquet (`dv-N.TOKEN/`); [[read]]
    * applies it as one broadcast anti join. Deleting a handful of
    * keys from a 100 TB table is then a pure-metadata commit + a
    * KB-sized key write — zero data I/O — at the price of one
    * broadcast anti join per read until [[compact]] MATERIALIZES the
    * deletes (compact reads through the DVs and publishes fresh
    * DV-free files; that is the Iceberg rewrite-data-files +
    * drop-deletes maintenance pass). Each delete batch commits as its
    * OWN dv file, EPOCH-SCOPED exactly like Iceberg's
    * sequence-numbered equality deletes: `dv-N.TOKEN` hides its keys
    * only in data files committed at epochs < N (the manifest records
    * each file's commit epoch), so a key re-inserted by a LATER
    * append or MERGE is visible again — there is NO single-key-space
    * contract. Appends and row-level rewrites simply CARRY the live
    * dv lines; the group count readers pay is bounded by live DV
    * generations (retention-bounded, gone at the next compact).
    *
    * Contracts: DVs are keys-only and broadcast — for bulk erasure
    * use [[deleteCow]] (zone-map-bounded rewrite); every live DV
    * shares one key column; the V1 [[mergeCow]]/[[deleteCow]] API
    * refuses DV bases (its survivor rewrite is DV-blind — the SQL
    * DML path's scan is DV-aware and works).
    * @return the new epoch */
  def deleteMor(spark: SparkSession, root: String, keys0: DataFrame,
                keyCol0: String, txn: Option[Txn] = None): Int = {
    import org.apache.spark.sql.functions.col
    val cur = currentEpoch(spark, root)
    val next = cur + 1
    val token = newToken()
    // the keys-only-SMALL contract is ENFORCED, not assumed (VERDICT
    // r13: the reader collects every live DV's keys onto the driver
    // and ships them inside each serialized reader factory — an
    // unbounded key set is a driver/executor scale-killer). Above the
    // cap the delete must go copy-on-write ([[deleteCow]] — a bulk
    // erasure rewrites files instead of bloating every future read).
    val dvMaxKeys = dvKeyCap(spark)
    // mapped tables: the DV is keyed by PHYSICAL name (stable across
    // renames — exactly why the DV survives them untouched)
    val mappingOpt = commitSchema(spark, root, cur).filter(ColumnMapping.hasMapping)
    val (keys, keyCol) = mappingOpt match {
      case Some(p) =>
        val phys = ColumnMapping.physOf(p)
        val pk = phys.getOrElse(keyCol0, keyCol0)
        (keys0.select(col(keyCol0).as(pk)), pk)
      case None => (keys0, keyCol0)
    }
    val prior = commitDvs(spark, root, cur)
    prior.foreach { case (_, k) =>
      require(k == keyCol, s"DV key mismatch: table has $k, delete on $keyCol")
    }
    // EPOCH-SCOPED, NOT cumulative: this batch's keys commit as their
    // own dv-$next file, scoped to files committed at epochs < $next —
    // a later append/MERGE re-inserting one of these keys is therefore
    // VISIBLE (its file's epoch is above the scope), the Iceberg
    // sequence-number semantics. Prior DV files carry unchanged with
    // their own (older) scopes.
    val dvRel = s"dv-$next.$token"
    keys.select(col(keyCol)).distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$dvRel")
    // count from the written file's parquet metadata (no second pass
    // over the input); abort BEFORE the commit CAS so an over-cap
    // attempt leaves the table untouched and its dv file as debris
    val nKeys = spark.read.parquet(s"$root/$dvRel").count()
    if (nKeys > dvMaxKeys) {
      fs(spark, new org.apache.hadoop.fs.Path(root))
        .delete(new org.apache.hadoop.fs.Path(s"$root/$dvRel"), true)
      throw new IllegalArgumentException(
        s"deleteMor key set ($nKeys keys) exceeds spark.graft.dv.maxKeys " +
          s"($dvMaxKeys): a delete vector this large would bloat the driver " +
          s"and every reader factory. Bulk erasure should rewrite instead: " +
          s"on a DV-free table use deleteCow (zone-map-bounded rewrite); on " +
          s"a DV-carrying table use the SQL DELETE row-level path (its " +
          s"DV-aware scan rewrites correctly) or compact/OPTIMIZE first to " +
          s"materialize the vectors, then deleteCow. Or raise the cap " +
          s"deliberately.")
    }
    val entries = manifestEntries3(spark, root, cur)
    val stats =
      if (statsExists(spark, root, cur)) Some(statsTable(spark, root, cur))
      else None
    commitStaged(spark, Staged(root, next, token, entries.map(_._1).sorted, stats,
      commitSchema(spark, root, cur).map(_.json), prior :+ ((dvRel, keyCol)),
      sizes = knownSizes(entries), fileEpochs = knownEpochs(entries)), txn)
    next
  }

  /** MERGE-ON-READ row-level COMMIT — the write half of a MoR
    * UPDATE/MERGE (VERDICT r14 #2, Iceberg's merge-on-read write
    * modes): ONE epoch that (a) CARRIES every current data file
    * verbatim (untouched bytes — the whole point), (b) ADDS the
    * staged DELTA files (the updated/inserted rows, committed at the
    * new epoch so they sit ABOVE every DV's scope), and (c) appends a
    * keys-only DELETE VECTOR (`dv-N.TOKEN/`, staged by the writers as
    * `stagedKeyDirName`) hiding the PRE-update rows in the carried
    * files. A wide, low-selectivity UPDATE on a 100 TB table is then
    * O(changed rows) of write I/O instead of O(touched files) — the
    * CoW rewrite's exact complement, priced by the same
    * [[dvKeyCap]] contract (the CALLER routes over-cap operations to
    * copy-on-write; this commit re-checks and refuses).
    *
    * Optimistic concurrency matches [[commitReplaceGroups]]: a table
    * that advanced re-validates every intervening epoch through the
    * same rebase ladder (no removals, no schema/DV change, appends
    * cleared by `appendGuard`) and retries bounded times; `reaudit`
    * re-runs the staged-file constraint audit per attempt. The epoch-
    * scoped DV discipline makes the delta files immune to their own
    * vector: they commit at epoch N while `dv-N` hides only in files
    * committed at epochs < N. Returns the new epoch. */
  def commitMorDelta(spark: SparkSession, root: String, baseEpoch: Int,
                     stagedDeltaDirName: String, stagedKeyDirName: String,
                     keyColPhysical: String,
                     keyType: org.apache.spark.sql.types.DataType,
                     txn: Option[Txn] = None,
                     appendGuard: Option[(Int, Set[String]) => Option[String]] = None,
                     reaudit: Option[() => Unit] = None): Int = {
    import org.apache.spark.sql.functions.col
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    def listDir(name: String, suffix: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$name")
      if (!f.exists(p)) Map.empty
      else f.listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(suffix))
        .map(s => s"$name/${s.getPath.getName}" -> s.getLen).toMap
    }
    // the key stage is task-written JSONL (see GraftMorWriterFactory —
    // the commit coordinator allows one coordinated committer per
    // task, so keys publish by hidden-write + rename instead)
    def readKeys(): DataFrame = spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyColPhysical, keyType))))
      .json(s"$root/$stagedKeyDirName")
    val deltaSizes0 = listDir(stagedDeltaDirName, ".parquet")
    val keyFiles0 = listDir(stagedKeyDirName, ".json")
    // a MERGE of pure not-matched inserts stages no keys: the epoch is
    // then a plain delta append (no vector)
    val hasKeys = keyFiles0.nonEmpty
    if (hasKeys) {
      val nKeys = readKeys().count()
      require(nKeys <= dvKeyCap(spark),
        s"MoR delta key set ($nKeys) exceeds spark.graft.dv.maxKeys " +
          s"(${dvKeyCap(spark)}); the caller must route to copy-on-write")
    }
    var attempt = 0
    val maxRetries = commitMaxRetries(spark)
    var result = -1
    while (result < 0) {
      val cur = currentEpoch(spark, root)
      if (cur != baseEpoch)
        checkReplaceRebase(spark, root, baseEpoch, cur, Set.empty, appendGuard)
      reaudit.foreach(_.apply())
      if (listDir(stagedDeltaDirName, ".parquet") != deltaSizes0 ||
          listDir(stagedKeyDirName, ".json") != keyFiles0)
        throw new IllegalStateException(
          s"MoR stage $stagedDeltaDirName/$stagedKeyDirName at $root " +
            "changed underneath the commit: a vacuum swept the staged " +
            "files while the table advanced; re-run the operation")
      val next = cur + 1
      val prior = commitDvs(spark, root, cur)
      if (hasKeys) prior.foreach { case (_, k) =>
        require(k == keyColPhysical,
          s"DV key mismatch: table carries $k, MoR delta on $keyColPhysical")
      }
      // the staged keys BECOME the epoch's vector under the dv naming
      // contract (dv-N.TOKEN, scope = files committed at epochs < N):
      // a fresh single-file copy per attempt (a rename would pin the
      // first attempt's epoch number into the name)
      val token = stagedDeltaDirName.split("-a").last
      val dvRel = s"dv-$next.$token"
      if (hasKeys)
        readKeys().distinct().coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$dvRel")
      val entries = manifestEntries3(spark, root, cur)
      val carried = entries.map(_._1)
      val deltaRel = deltaSizes0.keys.toSeq.sorted
      val baseToken = commitInfo(spark, root, cur)._1
      val hasStats = f.exists(new org.apache.hadoop.fs.Path(
        s"$root/stats-$cur.$baseToken"))
      val mergedStats =
        if (!hasStats) None
        else {
          val stats = statsTable(spark, root, cur)
          val statsCols = stats.select("col").distinct().collect()
            .map(_.getString(0)).filterNot(_.startsWith("__")).sorted.toSeq
          val freshStats =
            if (deltaRel.isEmpty || statsCols.isEmpty) emptyStats(spark)
            else zoneStats(spark, root, deltaRel, statsCols)
          Some(stats.unionByName(freshStats))
        }
      try {
        commitStaged(spark, Staged(root, next, token,
          (carried ++ deltaRel).sorted, mergedStats,
          commitSchema(spark, root, cur).map(_.json),
          dvs = if (hasKeys) prior :+ ((dvRel, keyColPhysical)) else prior,
          sizes = knownSizes(entries) ++ deltaSizes0,
          // delta files sit ABOVE the new vector's scope; carried
          // files keep their epochs so it (and older DVs) bite
          fileEpochs = knownEpochs(entries) ++ deltaRel.map(_ -> next)), txn)
        result = next
      } catch {
        case c: ManifestConflictException =>
          try f.delete(new org.apache.hadoop.fs.Path(s"$root/$dvRel"), true): Unit
          catch { case _: Throwable => () }
          attempt += 1
          if (attempt >= maxRetries) throw c
      }
    }
    result
  }

  /** The enforced ceiling on a single delete vector's key count
    * (`spark.graft.dv.maxKeys`, default 100k ≈ 0.8 MB of longs):
    * [[deleteMor]] refuses above it, which is what makes the read
    * path's driver-side key collect BOUNDED (at most cap × live DV
    * generations, and generations are retention-bounded). */
  def dvKeyCap(spark: SparkSession): Long =
    spark.sessionState.conf.getConfString("spark.graft.dv.maxKeys", "100000").toLong

  /** The ordered (dv relative path, key column) list a committed epoch
    * carries (snapshot-cached). Each `dv-N.TOKEN` is EPOCH-SCOPED: its
    * keys hide only in data files committed at epochs < N. */
  def commitDvs(spark: SparkSession, root: String, epoch: Int): Seq[(String, String)] =
    SnapshotCache.get(spark, root, epoch).dvs

  /** Compat accessor for existence/change checks: the NEWEST live DV,
    * None when the epoch carries no delete vector. */
  def commitDv(spark: SparkSession, root: String, epoch: Int): Option[(String, String)] =
    commitDvs(spark, root, epoch).lastOption

  /** The scoping epoch of a delete-vector file (`dv-N.TOKEN`, or the
    * branch UPDATE class `dv-N.u.TOKEN` -> N): its keys apply to data
    * files committed at epochs < N. */
  def dvEpochOf(rel: String): Int = {
    val m = "dv-(\\d+)\\..*".r
    rel match {
      case m(e) => e.toInt
      // unknown shape: apply to every file (conservative)
      case _ => Int.MaxValue
    }
  }

  /** EPOCH-SCOPED delete-vector application over an arbitrary rel-path
    * subset of epoch `e`'s manifest: files group by which SUFFIX of
    * the (epoch-ascending) DV list applies to them — a file committed
    * at `ef` is subject to exactly the DVs with scope epoch > `ef` —
    * and each group anti-joins once against that suffix's key union
    * (broadcast; keys-only small by the deleteMor contract). Files
    * with an unknown commit epoch (legacy manifests) take every DV,
    * the pre-scoping semantics. `scan` reads a rel subset under the
    * caller's schema discipline; `keyName` translates the DV's
    * PHYSICAL key column to the scan's output name (identity for
    * physical-shaped scans). Group count is bounded by the live DV
    * count + 1 — one deleteMor per epoch, retention-bounded. */
  private[graft] def dvScopedScan(spark: SparkSession, root: String, e: Int,
                                  rels: Seq[String],
                                  scan: Seq[String] => DataFrame,
                                  keyName: String => String = identity)
      : DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val dvs = commitDvs(spark, root, e).sortBy(d => dvEpochOf(d._1))
    if (dvs.isEmpty || rels.isEmpty) scan(rels)
    else {
      val epochs = knownEpochs(manifestEntries3(spark, root, e))
      def groupOf(rel: String): Int = {
        val ef = epochs.getOrElse(rel, 0)
        dvs.count(d => dvEpochOf(d._1) <= ef)
      }
      rels.groupBy(groupOf).toSeq.sortBy(_._1).map { case (g, fs) =>
        val applicable = dvs.drop(g)
        if (applicable.isEmpty) scan(fs.sorted)
        else {
          val k = keyName(applicable.head._2)
          val keys = applicable.map { case (rel, kc) =>
            spark.read.parquet(s"$root/$rel").select(col(kc).as(k))
          }.reduce(_ unionByName _)
          scan(fs.sorted).join(broadcast(keys), Seq(k), "left_anti")
        }
      }.reduce(_ unionByName _)
    }
  }

  def statsExists(spark: SparkSession, root: String, epoch: Int): Boolean = {
    val (token, _) = commitInfo(spark, root, epoch)
    fs(spark, new org.apache.hadoop.fs.Path(root))
      .exists(new org.apache.hadoop.fs.Path(s"$root/stats-$epoch.$token"))
  }

  /** ROLLBACK — restore epoch `to`'s content as a NEW epoch: history
    * is never rewritten, the rollback itself is an auditable commit
    * (the Iceberg rollback-as-snapshot discipline). The new manifest
    * and stats are epoch `to`'s, verbatim; data files are shared, so
    * the operation is pure metadata. */
  def rollback(spark: SparkSession, root: String, to: Int,
               txn: Option[Txn] = None): Int = {
    val cur = currentEpoch(spark, root)
    val next = cur + 1
    val entries = manifestEntries3(spark, root, to)
    val (token, _) = commitInfo(spark, root, to)
    val f = fs(spark, new org.apache.hadoop.fs.Path(root))
    val stats =
      if (f.exists(new org.apache.hadoop.fs.Path(s"$root/stats-$to.$token")))
        Some(statsTable(spark, root, to))
      else None
    commitStaged(spark, Staged(root, next, newToken(), entries.map(_._1).sorted,
      stats, commitSchema(spark, root, to).map(_.json),
      commitDvs(spark, root, to), sizes = knownSizes(entries),
      // restored files keep epoch `to`'s commit epochs — the restored
      // DVs' scopes must keep lining up with their files
      fileEpochs = knownEpochs(entries)), txn)
    next
  }

  // ---------------------------------------------------------------- read path

  /** The epoch the table currently publishes: max committed marker. */
  def currentEpochOpt(spark: SparkSession, root: String): Option[Int] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    if (!f.exists(rootPath)) None
    else f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("commit-\\d+"))
      .map(_.stripPrefix("commit-").toInt)
      .maxOption
  }

  def currentEpoch(spark: SparkSession, root: String): Int =
    currentEpochOpt(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed epoch at $root"))

  /** The winning (token, txn) of a committed epoch (snapshot-cached). */
  def commitInfo(spark: SparkSession, root: String, epoch: Int): (String, Option[Txn]) = {
    val s = SnapshotCache.get(spark, root, epoch)
    (s.token, s.txn)
  }

  /** Newest committed txn version for `appId`, across live commit
    * markers AND the `TXNS` rollup vacuum leaves behind — the replay
    * no-op test survives retention. */
  def lastCommittedVersion(spark: SparkSession, root: String,
                           appId: String): Option[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    if (!f.exists(rootPath)) return None
    val live = f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("commit-\\d+"))
      .flatMap(n => commitInfo(spark, root, n.stripPrefix("commit-").toInt)._2)
      .collect { case Txn(a, v) if a == appId => v }
    val rolled = {
      val p = new org.apache.hadoop.fs.Path(rootPath, "TXNS")
      if (!f.exists(p)) Nil
      else readLines(spark, p).flatMap { l =>
        val Array(a, v) = l.split(":", 2)
        if (a == appId) Some(v.toLong) else None
      }
    }
    (live ++ rolled).maxOption
  }

  /** Manifest-resolved file list of `epoch` (absolute paths;
    * snapshot-cached). */
  def manifestFiles(spark: SparkSession, root: String, epoch: Int): Seq[String] =
    manifestEntries(spark, root, epoch).map { case (rel, _) => s"$root/$rel" }

  /** Manifest entries of `epoch` as (relPath, sizeBytes) — size -1 for
    * manifests committed before sizes landed. Snapshot-cached: after
    * the first load, planning state costs one marker read, zero
    * per-file RPCs. */
  def manifestEntries(spark: SparkSession, root: String,
                      epoch: Int): Seq[(String, Long)] =
    SnapshotCache.get(spark, root, epoch).entries.map { case (r, s, _) => (r, s) }

  /** Manifest entries with their commit epochs: (relPath, sizeBytes,
    * commitEpoch); -1 marks fields from manifests written before they
    * landed. Snapshot-cached. */
  def manifestEntries3(spark: SparkSession, root: String,
                       epoch: Int): Seq[(String, Long, Int)] =
    SnapshotCache.get(spark, root, epoch).entries

  /** Read the table AS PUBLISHED: only manifest-listed files — orphans
    * and unpublished epochs are invisible. Pass `epoch` to time-travel
    * to a pinned commit. When the commit carries a schema (every
    * commit since schema metadata landed), the scan PLANS under it —
    * no footer-inference job, and files predating an evolution
    * surface the added columns as null. */
  def read(spark: SparkSession, root: String, epoch: Int = -1): DataFrame = {
    val e = if (epoch >= 0) epoch else currentEpoch(spark, root)
    val rels = manifestEntries3(spark, root, e).map(_._1)
    val schOpt = commitSchema(spark, root, e)
    val mapped = schOpt.exists(ColumnMapping.hasMapping)
    // mapped tables scan under the files' PHYSICAL names and surface
    // the logical ones via one aliasing projection (see ColumnMapping)
    def scan(fs: Seq[String]): DataFrame = {
      val paths = fs.map(r => s"$root/$r")
      schOpt match {
        case Some(sch) if mapped =>
          spark.read.schema(ColumnMapping.physicalSchema(sch)).parquet(paths: _*)
        case Some(sch) => spark.read.schema(sch).parquet(paths: _*)
        case None      => spark.read.parquet(paths: _*)
      }
    }
    // merge-on-read: epoch-scoped broadcast anti joins against the
    // keys-only delete vectors (see deleteMor; compact materializes
    // them away). DV keys are PHYSICAL names — exactly what `scan`
    // exposes pre-alias.
    val withDv = dvScopedScan(spark, root, e, rels, scan)
    if (mapped) withDv.select(ColumnMapping.toLogicalCols(schOpt.get): _*)
    else withDv
  }

  /** The schema a committed epoch pinned, if its marker carries one
    * (markers from before schema metadata landed do not).
    * Snapshot-cached — the JSON parse happens once per epoch. */
  def commitSchema(spark: SparkSession, root: String, epoch: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    SnapshotCache.get(spark, root, epoch).schema

  /** Commit history of the table — the DESCRIBE HISTORY surface: one
    * row per live epoch with its winning token, txn (if any), and
    * manifest file count. Metadata-only (marker + manifest reads,
    * bounded by retention); time-travel targets come straight off
    * this frame. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val rows = f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("commit-\\d+"))
      .map(_.stripPrefix("commit-").toInt)
      .sorted
      .map { e =>
        val (token, txn) = commitInfo(spark, root, e)
        (e, token, txn.map(_.appId), txn.map(_.version),
          manifestFiles(spark, root, e).size)
      }
    rows.toDF("epoch", "token", "txn_app_id", "txn_version", "n_files")
  }

  // -------------------------------------------------------------------- tags

  /** SNAPSHOT TAGS (Iceberg's named refs, the tag kind): a tag is a
    * NAME pinned to a committed epoch, persisted in the `_TAGS.json`
    * sidecar (one `name=epoch` line per tag). Tags serve two
    * purposes: `VERSION AS OF 'name'` travels by meaning instead of
    * number, and — the retention contract — VACUUM KEEPS every
    * tagged epoch regardless of the keep-newest-N window, so an
    * audit/reproducibility pin (the training-data-release use case:
    * tag the epoch a model trained on) survives routine retention
    * until the tag is dropped. */
  val TagsFile = "_TAGS.json"

  def readTags(spark: SparkSession, root: String): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(root, TagsFile)
    val f = fs(spark, p)
    if (!f.exists(p)) Map.empty
    else readLines(spark, p).flatMap { l =>
      l.split("=", 2) match {
        case Array(n, e) if e.toIntOption.isDefined => Some(n -> e.toInt)
        case _ => None
      }
    }.toMap
  }

  private def writeTags(spark: SparkSession, root: String,
                        tags: Map[String, Int]): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, TagsFile)
    val f = fs(spark, p)
    if (tags.isEmpty) { f.delete(p, false); () }
    else writeFile(spark, p,
      tags.toSeq.sortBy(_._1).map { case (n, e) => s"$n=$e" }
        .mkString("", "\n", "\n"))
  }

  /** Pin `name` to `epoch` (default: the current epoch). Refused for
    * an uncommitted epoch or an existing name — a tag is an immutable
    * pin; drop it first to move it. */
  def createTag(spark: SparkSession, root: String, name: String,
                epoch: Option[Int] = None): Int = {
    require(name.matches("\\w+"), s"tag names are word-shaped; got '$name'")
    // an all-digit tag would be shadowed by epoch-number travel
    // (VERSION AS OF '7' parses as epoch 7 before tag lookup) —
    // refuse it rather than create an unreachable pin
    require(!name.forall(_.isDigit),
      s"tag name '$name' is all digits and would be read as an epoch " +
        "number by VERSION AS OF; pick a name with a letter")
    // tag mutations SERIALIZE against vacuum and each other under the
    // maintenance lease (ADVICE r15): an unsynchronized read-modify-
    // write here could (a) have its just-pinned epoch swept by a
    // vacuum that read _TAGS.json before the write landed — silently
    // voiding the retention-exemption contract — or (b) drop a
    // concurrent CREATE TAG's entry (last writer wins)
    withMaintLease(spark, root) {
      val cur = currentEpoch(spark, root)
      val e = epoch.getOrElse(cur)
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val f = fs(spark, rootPath)
      require(f.exists(new org.apache.hadoop.fs.Path(root, s"commit-$e")),
        s"cannot tag epoch $e: not a live committed epoch of $root")
      val tags = readTags(spark, root)
      require(!tags.contains(name),
        s"tag '$name' already pins epoch ${tags(name)}; DROP TAG first")
      writeTags(spark, root, tags + (name -> e))
      e
    }
  }

  def dropTag(spark: SparkSession, root: String, name: String): Unit =
    // leased for the same reason as createTag: a racing tag writer's
    // entry must not vanish under this read-modify-write
    withMaintLease(spark, root) {
      val tags = readTags(spark, root)
      require(tags.contains(name), s"no tag '$name' on $root")
      writeTags(spark, root, tags - name)
    }

  /** Live write-audit-publish stages: (epoch, token) per `_WAP/<id>`
    * descriptor (written by the catalog's WAP stage path). Vacuum
    * consults this so a pending cross-session stage — its
    * `stats-<epoch>.<token>` parquet and its `data-epoch=<e>-a<token>/`
    * files — is RETENTION-EXEMPT until the stage publishes or drops
    * (the whole point of the durable descriptor is that another
    * session publishes it later). */
  def liveWapStages(spark: SparkSession, root: String)
      : Seq[(String, Int, String)] = {
    val p = new org.apache.hadoop.fs.Path(root, "_WAP")
    val f = fs(spark, p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isFile).flatMap { st =>
      val lines =
        try readLines(spark, st.getPath)
        catch { case _: java.io.IOException => Nil }
      def one(k: String): Option[String] =
        lines.find(_.startsWith(s"$k=")).map(_.drop(k.length + 1))
      for (e <- one("epoch").flatMap(_.toIntOption); t <- one("token"))
        yield (st.getPath.getName, e, t)
    }.sortBy(_._1)
  }

  /** Live BRANCH stages: (name, latest staged epoch, token, base
    * epoch) per `_BRANCH/<name>` descriptor (written by the catalog's
    * branch write path — the multi-epoch WAP generalization). Vacuum
    * consults this so a live branch's staged files and stats stay
    * retention-exempt AND its base epoch stays alive (the branch's
    * carried file list references it) until publish or drop. */
  def liveBranchStages(spark: SparkSession, root: String)
      : Seq[(String, Int, String, Int)] = {
    val p = new org.apache.hadoop.fs.Path(root, "_BRANCH")
    val f = fs(spark, p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isFile).flatMap { st =>
      val lines =
        try readLines(spark, st.getPath)
        catch { case _: java.io.IOException => Nil }
      def one(k: String): Option[String] =
        lines.find(_.startsWith(s"$k=")).map(_.drop(k.length + 1))
      for (e <- one("epoch").flatMap(_.toIntOption); t <- one("token");
           b <- one("base").flatMap(_.toIntOption))
        yield (st.getPath.getName, e, t, b)
    }.sortBy(_._1)
  }

  // ---------------------------------------------------------------- retention

  /** Retention sweep — the vacuum discipline of the dedup epoch chain
    * / artifact cache applied to table epochs: keep the newest `keep`
    * committed epochs (the CURRENT epoch is always kept), drop older
    * commits + their now-unreferenced data files + their manifest and
    * stats metadata, sweep losing-attempt metadata, and sweep orphan
    * data files (crashed or beaten writers) — but ONLY inside epoch
    * dirs at or below the current epoch (the Iceberg
    * remove_orphan_files grace discipline, keyed on epochs instead of
    * age): a concurrent in-flight writer necessarily stages ABOVE the
    * current epoch, and anything uncommitted at or below it can never
    * commit (epochs are monotonic), so the bounded sweep cannot eat a
    * publishable epoch. Dropped epochs' txn records roll into `TXNS`
    * first, so replay idempotence survives retention. Single
    * maintenance process assumed (as for compact) — vacuum itself is
    * not CAS-protected.
    * Time travel remains available across exactly the kept epochs.
    *
    * `streamStageGraceMs` bounds the age-based sweep of crashed
    * `data-stream-a*` staging dirs. It MUST exceed the longest
    * streaming batch's write phase: a live batch whose stage dir is
    * swept mid-write would otherwise lose its files between the
    * delegate commit and the epoch commit (the epoch commit now fails
    * loudly on a vanished stage dir rather than publishing an empty
    * epoch — ADVICE r12 — but the batch still pays a replay). The
    * default is 24 h — far above any sane micro-batch; do not run
    * vacuum concurrently with longer batches.
    *
    * `orphanGraceMs` (ADVICE r14): the epoch bound alone no longer
    * proves an unreferenced file dead — OPTIMISTIC REBASE commits
    * staged files from attempt dirs whose embedded epoch the table
    * has already outgrown (a racing writer advanced it), so "at or
    * below current and unreferenced" can describe a stage that is
    * seconds from committing. Orphan data files therefore also need
    * to be OLDER than this grace (Delta's tombstone-retention
    * discipline; default 1 h — far above any stage→CAS window) before
    * the sweep may take them. Pass a non-positive value to sweep
    * regardless of age (tests; tables with provably no in-flight
    * writers).
    * @return (droppedEpochs, keptEpochs), each sorted. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             streamStageGraceMs: Long = 86400000L,
             orphanGraceMs: Long = 3600000L): (Seq[Int], Seq[Int]) =
      withMaintLease(spark, root) {
    require(keep >= 1, "must keep at least the current epoch")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val cur = currentEpoch(spark, root)
    val names = f.listStatus(rootPath).toSeq.map(_.getPath.getName)
    val epochs = names.filter(_.matches("commit-\\d+"))
      .map(_.stripPrefix("commit-").toInt).sorted
    // TAGGED epochs are retention-exempt (the Iceberg named-ref
    // contract): keep-newest-N plus every live epoch a tag pins —
    // a stale tag naming an epoch already dropped by an earlier,
    // pre-tag vacuum is simply inert
    val tagged = readTags(spark, root).values.toSeq.filter(epochs.contains)
    // a live branch PINS its base epoch (the cumulative staged file
    // list references the base's files; publishing later must still
    // find them) — the tag discipline applied to refs
    val branchBases = liveBranchStages(spark, root).map(_._4)
      .filter(epochs.contains)
    val kept = (epochs.takeRight(keep) ++ tagged ++ branchBases :+ cur)
      .distinct.sorted
    val dropped = epochs.filterNot(kept.contains)
    val keptFiles = kept
      .flatMap(e => manifestFiles(spark, root, e))
      .map(new org.apache.hadoop.fs.Path(_).toUri.getPath)
      .toSet
    // roll dropped txns into TXNS before their markers disappear
    val droppedTxns = dropped.flatMap(e => commitInfo(spark, root, e)._2)
    if (droppedTxns.nonEmpty) {
      val p = new org.apache.hadoop.fs.Path(rootPath, "TXNS")
      val existing =
        if (f.exists(p)) readLines(spark, p).map { l =>
          val Array(a, v) = l.split(":", 2); (a, v.toLong)
        } else Nil
      val merged = (existing ++ droppedTxns.map(t => (t.appId, t.version)))
        .groupBy(_._1).map { case (a, vs) => s"$a:${vs.map(_._2).max}" }
        .toSeq.sorted
      writeFile(spark, p, merged.mkString("\n") + "\n")
    }
    dropped.foreach { e =>
      manifestFiles(spark, root, e)
        .map(p => new org.apache.hadoop.fs.Path(p))
        .filterNot(p => keptFiles.contains(p.toUri.getPath))
        .foreach(p => f.delete(p, false))
      f.delete(new org.apache.hadoop.fs.Path(rootPath, s"commit-$e"), false)
    }
    // metadata sweep: dropped epochs' manifests/stats (ALL attempts),
    // losing-attempt metadata of kept epochs (ADVICE r10: stale stats
    // referencing deleted files must not outlive their epoch), and
    // crashed attempts' commit tmp files (a writer that died between
    // writing commit-N.tmp.T and the CAS rename leaves the tmp; any
    // tmp at or below the current epoch can never commit — epochs are
    // monotonic — so it is dead weight)
    val winners = kept.map(e => e -> commitInfo(spark, root, e)._1).toMap
    // pending WAP stages are retention-exempt (see [[liveWapStages]]);
    // live BRANCH stages likewise — a branch's token marks EVERY stage
    // dir and stats file of the ref, so exemption keys on the token
    val wapStages = liveWapStages(spark, root)
      .map { case (_, e, t) => (e, t) }.toSet
    val branchTokens = liveBranchStages(spark, root).map(_._3).toSet
    val wapTokens = wapStages.map(_._2) ++ branchTokens
    // DV files are carried ACROSS epochs by reference (appends ride the
    // line), so a dv-N file may outlive epoch N: sweep only DVs no
    // KEPT epoch references
    val keptDvs = kept.flatMap(e => commitDvs(spark, root, e)).map(_._1).toSet
    f.listStatus(rootPath).toSeq.map(_.getPath).foreach { p =>
      val n = p.getName
      val m = "^(manifest|stats)-(\\d+)\\.([0-9a-f]+)$".r
      val dv = "^dv-(\\d+)\\.(?:u\\.)?([0-9a-f]+)$".r
      val tmp = "^commit-(\\d+)\\.tmp\\.([0-9a-f]+)$".r
      n match {
        case m(_, e, token) =>
          // bounded to <= cur like the tmp and orphan sweeps: an
          // in-flight commitStaged writes manifest/stats FIRST and
          // CAS-renames the marker LAST, always at an epoch ABOVE the
          // current one — sweeping above-current metadata here would
          // race the writer (delete its manifest, then watch its CAS
          // succeed → a committed epoch with no manifest, table
          // unreadable). Above-current attempt metadata becomes
          // sweepable only once a later vacuum observes a higher
          // committed epoch (ADVICE r11).
          val ep = e.toInt
          if (ep <= cur && !wapStages((ep, token)) &&
            !branchTokens.contains(token) &&
            (!kept.contains(ep) || winners.get(ep).exists(_ != token)))
            f.delete(p, true): Unit
        case dv(e, token) if e.toInt <= cur && !keptDvs.contains(n) &&
          !branchTokens.contains(token) =>
          // branch-staged DVs (token-named) are retention-exempt for
          // the ref's life, exactly like its stage dirs and stats legs
          f.delete(p, true): Unit
        case tmp(e, _) if e.toInt <= cur =>
          f.delete(p, false): Unit
        case _ => ()
      }
    }
    // epoch-bounded AND age-graced orphan data sweep (see scaladoc):
    // epoch <= current filters out writers staging ahead; the grace
    // window protects a rebasing writer whose attempt dir's embedded
    // epoch fell behind a racing commit (ADVICE r14 — without it, a
    // sweep between the writer's stage re-check and its commit CAS
    // publishes a manifest referencing deleted files)
    val orphanCutoff = System.currentTimeMillis() - math.max(orphanGraceMs, 0L)
    orphanFiles(spark, root)
      .filter(p => dataEpochOf(p).exists(_ <= cur))
      .filterNot(p => wapTokens.exists(t => p.contains(s"-a$t/")))
      .filter { p =>
        orphanGraceMs <= 0 ||
          (try f.getFileStatus(new org.apache.hadoop.fs.Path(p))
            .getModificationTime < orphanCutoff
          catch { case _: java.io.FileNotFoundException => false })
      }
      .foreach(p => f.delete(new org.apache.hadoop.fs.Path(p), false))
    // crashed streaming stages: a toTable batch that died between its
    // file write and its epoch commit leaves an un-renamed
    // `data-stream-a*` dir no manifest can reference (a committed
    // batch's dir was renamed into data-epoch=N-aTOKEN form). Those
    // sit outside the epoch-bounded rules, so sweep by AGE: anything
    // older than the grace window cannot be a live in-flight batch
    // (the Delta tombstone-retention discipline).
    val cutoff = System.currentTimeMillis() - streamStageGraceMs
    f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.matches("^data-stream-a[0-9a-f]+$") &&
        s.getModificationTime < cutoff)
      .foreach(s => f.delete(s.getPath, true))
    // batch change-feed staging (`_changes/<from>-<to>.<token>`): each
    // scan's dir is swept by its own JVM at exit; crashed sessions
    // leave debris only this age-graced pass reclaims (same grace as
    // stream stages — a dir older than the longest conceivable query
    // cannot be a live scan)
    val changes = new org.apache.hadoop.fs.Path(rootPath, "_changes")
    if (f.exists(changes))
      f.listStatus(changes).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.matches("^\\d+-\\d+\\.[0-9a-f]+$") &&
          s.getModificationTime < cutoff)
        .foreach(s => f.delete(s.getPath, true))
    (dropped, kept)
  }

  /** Test/ops hook: whether a maintenance lease is currently held. */
  def maintLeaseHeld(spark: SparkSession, root: String): Boolean =
    fs(spark, new org.apache.hadoop.fs.Path(root))
      .exists(new org.apache.hadoop.fs.Path(root, "maint-lease"))

  /** The epoch a data file's directory belongs to, if it is an epoch
    * dir (`data-epoch=N` or an attempt dir `data-epoch=N-aTOKEN`). */
  private def dataEpochOf(path: String): Option[Int] = {
    // walk ANCESTORS, not just the parent: layout-preserving
    // replacement writes nest files under partition subdirectories
    // (`data-epoch=N-aTOK/__p0=<v>/part-*.parquet`), and an orphan
    // sweep that missed them would leak every aborted layout DML
    val re = "^data-epoch=(\\d+)(-a[0-9a-f]+)?$".r
    var p = new org.apache.hadoop.fs.Path(path).getParent
    while (p != null) {
      re.findFirstMatchIn(p.getName) match {
        case Some(m) => return Some(m.group(1).toInt)
        case None => p = p.getParent
      }
    }
    None
  }

  /** Data files under the table's epoch dirs that NO committed
    * manifest references — the candidates a retention sweep deletes
    * (crashed writers, beaten attempts, replaced epochs). Listing
    * only; deletion policy is [[vacuum]]'s (which bounds the sweep to
    * epochs at or below the current one). */
  def orphanFiles(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, rootPath)
    val referenced = f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("commit-\\d+"))
      .flatMap(m => manifestFiles(spark, root,
        m.stripPrefix("commit-").toInt))
      .map(new org.apache.hadoop.fs.Path(_).toUri.getPath)
      .toSet
    val it = f.listFiles(rootPath, true)
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && name.endsWith(".parquet") &&
          dataEpochOf(s.getPath.toUri.getPath).isDefined)
        all += s.getPath.toUri.getPath
    }
    all.toSeq.filterNot(referenced).sorted
  }
}
