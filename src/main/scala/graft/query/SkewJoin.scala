package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §7 100 TB notes): when one join
  * key carries a disproportionate share of the fact rows, a plain
  * shuffle join lands that key on one reducer. Salting splits each hot
  * key into `saltFactor` sub-keys on the big side and replicates the
  * small side across all salts — an equality join on (key, salt)
  * spreads the hot key over saltFactor reducers.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`)
  * handles this automatically for sort-merge joins; explicit salting
  * remains the tool for aggregations and for joins AQE can't split
  * (e.g., bucketed-table joins that must avoid a shuffle).
  */
object SkewJoin {

  /** Deterministic per-row salt: murmur3 of the row's CONTENT, not of
    * `monotonically_increasing_id()` — the id is assigned by partition
    * layout, so under task retries or a different upstream partitioning
    * the same row could land on a different reducer run-to-run. A
    * content hash gives the identical spread (the salt only routes
    * rows; correctness never depended on it) while making reducer-level
    * behavior reproducible. Caveat by construction: byte-identical
    * duplicate rows share a salt — the skew this tool targets is a hot
    * KEY with distinct payloads, where content hashing spreads fully. */
  private[graft] def contentSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor))

  /** Salt limitation (applies to every salted op here): the salt is a
    * hash of the row's full CONTENT, so BYTE-IDENTICAL duplicate rows
    * share a salt and still land on one reducer. The tool targets the
    * common skew shape — a hot key with distinct payloads; if your
    * skew is literally repeated rows, dedup-with-count first (the
    * duplicates collapse to one weighted row) or mix a per-partition
    * counter into the salt at the cost of run-to-run reducer
    * reproducibility.
    *
    * @param forceShuffle pin a sort-merge join (hint) so the (key,
    *   salt) exchange actually spreads the hot key across reducers —
    *   for the demo/spec; in production leave Catalyst free to
    *   broadcast when the replicated side is tiny (salting is then a
    *   harmless no-op). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int = 8, forceShuffle: Boolean = false): DataFrame = {
    val salted = big.withColumn("__salt", contentSalt(big, saltFactor))
    val replicated0 = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    val replicated = if (forceShuffle) replicated0.hint("merge") else replicated0
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-tier salted join: salt ONLY provably-hot keys. The flat
    * saltedEquiJoin replicates the whole small side `saltFactor`x —
    * fine when it is a handful of dims, a real cost when it is large.
    * Here one count-aggregate over the big side finds the keys whose
    * row count exceeds `hotThreshold` (there can be at most
    * |big|/hotThreshold of them, so the hot-key list is tiny by
    * construction and broadcasts); hot big-side rows get a real salt,
    * cold rows salt 0, and the small side is replicated ONLY for hot
    * keys — replication volume is |small| + (saltFactor-1)x|hot dims|,
    * not saltFactor x |small|. Result is provably identical to the
    * plain join: for every key, the (key, salt) pairs on both sides
    * tile exactly the original key match (SkewJoinSpec pins both the
    * invariance and the replication volume). Byte-identical duplicate
    * rows share a salt — see saltedEquiJoin's salt limitation note. */
  def saltedEquiJoinTwoTier(big: DataFrame, small: DataFrame, key: String,
                            saltFactor: Int = 8, hotThreshold: Long = 100000L,
                            forceShuffle: Boolean = false): DataFrame = {
    val hot = big.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key), lit(true).as("__hot"))
    val salted = big
      .join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), contentSalt(big, saltFactor))
          .otherwise(lit(0)))
      .drop("__hot")
    val replicated0 = small
      .join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), array((0 until saltFactor).map(lit): _*))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    val replicated = if (forceShuffle) replicated0.hint("merge") else replicated0
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Replication volume of the two-tier small side — exposed for the
    * spec's volume assertion and for capacity planning. */
  private[graft] def twoTierReplicationCount(big: DataFrame, small: DataFrame,
                                             key: String, saltFactor: Int,
                                             hotThreshold: Long): Long = {
    val hot = big.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key))
    val nHot = small.join(broadcast(hot), Seq(key), "left_semi").count()
    val nAll = small.count()
    nAll + (saltFactor - 1L) * nHot
  }

  /** Two-phase (salted partial -> final) aggregation for skewed group
    * keys: count/sum-style aggregates pre-combine per (key, salt), then
    * combine per key — the map-side-combine pattern made explicit when
    * a single group would overwhelm one reducer. Byte-identical
    * duplicate rows share a salt — see saltedEquiJoin's salt
    * limitation note. */
  def saltedCountSum(big: DataFrame, key: String, valueCol: String,
                     saltFactor: Int = 8): DataFrame = {
    big
      .withColumn("__salt", contentSalt(big, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__c").as("cnt"), sum("__s").as("total"))
  }
}
