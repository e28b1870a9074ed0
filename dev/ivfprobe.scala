// :load from sbt console — IVF recall@10 vs nProbe with/without Lloyd,
// across all three SFs (uses spark2 from a prior script, or builds one).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val sparkI = { SparkSession.builder().master("local[16]").config("spark.sql.shuffle.partitions", "16").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
sparkI.sparkContext.setLogLevel("WARN")
for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  val emb = graft.Tables.embeddings(sparkI, d).localCheckpoint()
  val exact = graft.llm.Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
  for (nProbe <- Seq(4, 6, 8, 10, 14); li <- Seq(0, 1)) {
    val ivf = graft.llm.Similarity.annIvfTopK(emb, 0L, 10, nCells = 16, nProbe = nProbe, lloydIters = li)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    println(f"IVFPROBE sf=$d nProbe=$nProbe lloyd=$li recall=$recall%.2f")
  }
}
println("DONE-IVFPROBE")
