// :load from sbt console — measure simhash blocking recall vs exact 0.7 pairs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark2 = { SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions", "8").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
val d = "/root/testdata/sf0.01"
val docs = graft.Tables.documents(spark2, d)
val truth = graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.7).cache()
val cand = graft.llm.Dedup.simhashCandidates(docs).cache()
println(s"truth=${truth.count()} cand=${cand.count()} hits=${truth.join(cand, Seq("doc_a","doc_b"), "left_semi").count()}")
val sims = docs.select(col("doc_id"), graft.functions.ColumnFns.simhash64(graft.llm.TextOps.tokens(col("text"))).as("sim"))
val withHam = truth
  .join(sims.select(col("doc_id").as("doc_a"), col("sim").as("sim_a")), Seq("doc_a"))
  .join(sims.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")), Seq("doc_b"))
  .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
withHam.groupBy("hamming").count().orderBy("hamming").show(70)
println("DONE-SIMDEBUG")
