// :load from sbt console — entry smoke + simhash stage profile
import org.apache.spark.sql.SparkSession
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
println(s"entry rows = ${graft.SparkEntry.entry(spark2).count()}")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
val d = "/root/testdata/sf0.1"
val docs = graft.Tables.documents(spark2, d)
time("ngram truth 0.7 (count)")(graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.7).count())
time("simhash candidates (count)")(graft.llm.Dedup.simhashCandidates(docs).count())
time("full recall gate (count)")(graft.llm.Dedup.simhashRecallGate(docs).count())
println("DONE-SMOKE")
