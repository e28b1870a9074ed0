// :load from sbt console — capped-bucket simhash candidates: size + recall at 3 SFs
import org.apache.spark.sql.SparkSession
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
for (sfx <- Seq("sf0.001", "sf0.01", "sf0.1")) {
  val docs = graft.Tables.documents(spark2, s"/root/testdata/$sfx")
  val truth = graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.7).localCheckpoint()
  val t = truth.count()
  val cand = graft.llm.Dedup.simhashCandidates(docs).localCheckpoint()
  val c = time(s"$sfx candidates")(cand.count())
  val hits = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count()
  println(s"$sfx truth=$t cand=$c recall=${hits.toDouble / math.max(t, 1)}")
}
println("DONE-SIMPROFILE2")
