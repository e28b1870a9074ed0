// :load from sbt console — time the prefix join variants at sf0.1
import org.apache.spark.sql.SparkSession
val sparkP = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
sparkP.sparkContext.setLogLevel("WARN")
val docsP = graft.Tables.documents(sparkP, "/root/testdata/sf0.1")
def time[A](label: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
// warm
docsP.count()
for (_ <- 1 to 2) {
  time("pairs rarest=false")(graft.llm.Dedup.ngramJaccardPairs(docsP, 3, 0.5, rarestFirst = false).count())
  time("pairs rarest=true ")(graft.llm.Dedup.ngramJaccardPairs(docsP, 3, 0.5, rarestFirst = true).count())
  time("shingle sets only   ")(graft.llm.Dedup.shingleHashSets(docsP, 3).count())
}
println("DONE-PREFIXPROF")
