// Warm A/B for the domainMixture token-count staging (round 8, VERDICT #5).
// :load from an sbt console. One-liners only (console loads line by line).
val spark = { val b = org.apache.spark.sql.SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC"); b.withExtensions(new graft.GraftExtensions).getOrCreate() }
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
// OLD spelling (pre-round-8): both the availability agg and the kept scan re-tokenize the text
def oldMix() = { val nTok = size(split(col("text"), " ")); val share = Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15).foldLeft(lit(0.0)) { case (acc, (k, v)) => when(col("lang") === k, lit(v)).otherwise(acc) }; val avail = docs.select(col("lang"), nTok.as("n_tok")).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")).withColumn("target_share", share); val rated = avail.withColumn("feas", min(col("n_tokens").cast("double") / col("target_share")).over(Window.partitionBy())).withColumn("rate_ppm", round(least(lit(1.0), col("target_share") * col("feas") / col("n_tokens")) * 1000000, 0).cast("long")).drop("feas"); val bucket = (col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(1000000L); val kept = docs.select(col("lang"), col("doc_id"), nTok.as("n_tok")).join(broadcast(rated.select(col("lang"), col("rate_ppm"))), Seq("lang")).filter(bucket < col("rate_ppm")).groupBy(col("lang")).agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens")); rated.join(kept, Seq("lang"), "left").select(col("lang"), col("n_docs"), col("n_tokens"), col("target_share"), col("rate_ppm"), coalesce(col("kept_docs"), lit(0L)).as("kept_docs"), coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens")).orderBy("lang") }
def timeIt(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = { val t0 = System.nanoTime(); f().write.format("noop").mode("overwrite").save(); println(s"$label ${(System.nanoTime() - t0) / 1e9}") }
// warm both paths, then measure the second run of each
timeIt("old_cold", () => oldMix())
timeIt("new_cold", () => graft.llm.Curation.domainMixture(docs))
timeIt("old_warm", () => oldMix())
timeIt("new_warm", () => graft.llm.Curation.domainMixture(docs))
timeIt("old_warm2", () => oldMix())
timeIt("new_warm2", () => graft.llm.Curation.domainMixture(docs))
