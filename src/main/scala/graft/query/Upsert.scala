package graft.query

import org.apache.spark.sql.{Column, DataFrame}

import graft.llm.Dedup

/** Last-write-wins keyed merge — the engine analog of the reference's
  * Cassandra write semantics: every INSERT is an upsert on the primary
  * key, and the newest write (by timestamp) is the visible state
  * (`cassandra/init.cql` raw table PK; the consumer's append stream
  * materializes into per-key latest state on read).
  *
  * As a lakehouse batch operator this is MERGE INTO's keep-latest core:
  * union the base snapshot with the update batch and keep one winner
  * per key under an explicit version ordering. One hash shuffle on the
  * key; no sort of the full data (window row_number sorts within key
  * groups only). Deterministic by construction — the caller names the
  * full version ordering, so concurrent equal-timestamp writes have a
  * defined winner (the reference leaves that to Cassandra cell
  * timestamps).
  */
object Upsert {

  /** `base ∪ updates`, newest-first per key. `versionDesc` must be a
    * total order (e.g. ts DESC, event_id DESC). */
  def lwwMerge(base: DataFrame, updates: DataFrame, keys: Seq[String],
               versionDesc: Column*): DataFrame =
    Dedup.keepFirst(base.unionByName(updates), keys, versionDesc: _*)
}
