package graft.query

import org.apache.spark.sql.DataFrame
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

  /** @param forceShuffle pin a sort-merge join (hint) so the (key,
    *   salt) exchange actually spreads the hot key across reducers —
    *   for the demo/spec; in production leave Catalyst free to
    *   broadcast when the replicated side is tiny (salting is then a
    *   harmless no-op). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int = 8, forceShuffle: Boolean = false): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated0 = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    val replicated = if (forceShuffle) replicated0.hint("merge") else replicated0
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted partial -> final) aggregation for skewed group
    * keys: count/sum-style aggregates pre-combine per (key, salt), then
    * combine per key — the map-side-combine pattern made explicit when
    * a single group would overwhelm one reducer. */
  def saltedCountSum(big: DataFrame, key: String, valueCol: String,
                     saltFactor: Int = 8): DataFrame = {
    big
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__c").as("cnt"), sum("__s").as("total"))
  }
}
