package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** INCREMENTAL VIEW MAINTENANCE — what the change data feed is FOR: a
  * grouped (count, sum) aggregate view over a manifest table,
  * maintained from [[ManifestSink.tableChanges]] instead of
  * recomputed. Each refresh:
  *
  *   1. reads the change feed for exactly the epochs since the last
  *      refresh — work bounded by those epochs' file deltas, never
  *      the table;
  *   2. folds the changes into per-key (ΔCnt, ΔSum): insert /
  *      update_postimage count +1 and add the value, delete /
  *      update_preimage count −1 and subtract it;
  *   3. full-outer merges the delta onto the prior view (view-sized,
  *      i.e. keys-sized — not table-sized), dropping keys whose count
  *      reaches zero;
  *   4. publishes the merged view as a new epoch of the VIEW's own
  *      manifest table, carrying txn("ivm", sourceEpoch) — so the
  *      refresh cursor IS the txn bookkeeping
  *      ([[ManifestSink.lastCommittedVersion]]), a replayed or
  *      concurrent refresh of the same source epoch no-ops, and the
  *      view itself time-travels like any other table.
  *
  * Sums ride exact decimals (each value cast to DECIMAL(18,4), summed
  * and merged at DECIMAL(38,4) — the decSum discipline), so
  * increments and retractions cancel EXACTLY and incremental
  * maintenance equals full recomputation bit-for-bit — which is
  * precisely what the registered row's oracle certifies, since it
  * aggregates the final table state directly and hash-compares.
  *
  * At 100 TB: a narrow CoW merge touches a handful of files; the
  * refresh reads only those, shuffles only the changed keys, and
  * rewrites only the (typically tiny) view — the alternative is a
  * full-table aggregate per refresh. */
object IncrementalView {

  val AppId = "ivm"

  /** Refresh the (viewKey -> count, sum(valCol)) view at `viewRoot` up
    * to the source table's current epoch. `tableKey` is the SOURCE
    * table's merge key (the change feed diffs on it — it must be
    * row-unique per snapshot); `viewKey` is the grouping column the
    * view aggregates by — the two are independent. Returns the view's
    * current epoch (unchanged if already up to date). */
  def refresh(spark: SparkSession, tableRoot: String, viewRoot: String,
              tableKey: String, viewKey: String, valCol: String): Int = {
    val cur = ManifestSink.currentEpoch(spark, tableRoot)
    val last = ManifestSink.lastCommittedVersion(spark, viewRoot, AppId)
      .getOrElse(0L).toInt
    if (last >= cur) return ManifestSink.currentEpoch(spark, viewRoot)
    val changes = ManifestSink.tableChanges(spark, tableRoot, tableKey, last, cur)
    applyDelta(spark, viewRoot, changes, viewKey, valCol,
      ManifestSink.Txn(AppId, cur.toLong))
  }

  /** Fold a batch of change rows (`_change_type` + table columns) into
    * the view as one atomic epoch carrying `txn` — the shared core of
    * the batch cursor refresh above and the CONTINUOUS refresh
    * ([[graft.streaming.StreamIvm]]), where each change-feed
    * micro-batch applies with its batchId as the txn version and
    * at-least-once replays no-op. */
  def applyDelta(spark: SparkSession, viewRoot: String, changes: DataFrame,
                 viewKey: String, valCol: String,
                 txn: ManifestSink.Txn): Int = {
    // replay guard at entry (the commitIdempotentAppend discipline):
    // a refresh whose source version the view already committed must
    // no-op, not fold the delta a second time — versions are
    // monotonic per appId (source epochs / stream batchIds)
    if (ManifestSink.lastCommittedVersion(spark, viewRoot, txn.appId)
          .exists(_ >= txn.version))
      return ManifestSink.currentEpoch(spark, viewRoot)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes.groupBy(col(viewKey))
      .agg(sum(sign).as("d_cnt"),
        sum((col(valCol).cast(DecimalType(18, 4)) * sign)
          .cast(DecimalType(38, 4))).as("d_sum"))
    val priorEpoch = ManifestSink.currentEpochOpt(spark, viewRoot)
    val prior = priorEpoch match {
      case Some(_) => ManifestSink.read(spark, viewRoot)
      case None =>
        delta.select(col(viewKey), lit(0L).as("cnt"),
          lit(0).cast(DecimalType(38, 4)).as("sum_value")).filter(lit(false))
    }
    val merged = prior.join(delta, Seq(viewKey), "full_outer")
      .select(col(viewKey),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .cast(LongType).as("cnt"),
        (coalesce(col("sum_value"), lit(0).cast(DecimalType(38, 4)))
          + coalesce(col("d_sum"), lit(0).cast(DecimalType(38, 4))))
          .cast(DecimalType(38, 4)).as("sum_value"))
      .filter(col("cnt") > 0)
    val next = priorEpoch.getOrElse(0) + 1
    try {
      // attempt-unique staging: concurrent refreshes racing for the
      // same view epoch must not clobber each other's staged DATA
      // either — the loser's directory becomes vacuum-swept dead
      // weight, exactly the concurrent-publisher contract of stage()
      ManifestSink.commitStaged(spark,
        ManifestSink.stage(merged, viewRoot, next, unique = true), Some(txn))
      next
    } catch {
      case c: ManifestSink.ManifestConflictException =>
        // lost a publish race — but if the committed cursor already
        // covers this source version (a concurrent refresh of the
        // same epochs won), that is the promised no-op, not an error
        // (the commitIdempotentAppend discipline; ADVICE r11). Any
        // other winner is a real conflict: the view advanced past us
        // with work we did not fold, so surface it.
        if (ManifestSink.lastCommittedVersion(spark, viewRoot, txn.appId)
              .exists(_ >= txn.version))
          ManifestSink.currentEpoch(spark, viewRoot)
        else throw c
    }
  }
}
