// :load from sbt console — A/B simhash blocking density + recall for
// unigram vs shingled features, at sf0.01 and sf0.1.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark2 = { SparkSession.builder().master("local[16]").config("spark.sql.shuffle.partitions", "16").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  val docs = graft.Tables.documents(spark2, d)
  val n = docs.count()
  val allPairs = n * (n - 1) / 2
  val truth = graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.7).localCheckpoint()
  val t = truth.count()
  for (fs <- Seq(1, 2, 3)) {
    val cand = graft.llm.Dedup.simhashCandidates(docs, featureShingle = fs).localCheckpoint()
    val c = cand.count()
    val hits = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count()
    println(f"SF=$d fs=$fs truth=$t cand=$c density=${c.toDouble / allPairs}%.5f recall=${if (t == 0) 1.0 else hits.toDouble / t}%.3f")
  }
}
println("DONE-SIMSHINGLE")
