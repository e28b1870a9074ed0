package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimization-round plan capture (guide §1: capture
  * `.explain("formatted")` for every query you touch).
  *
  * `runMain graft.ops.ExplainDump <outDir> <suffix> q_name [q_name2 ...]`
  * writes `<outDir>/<q_name>_<suffix>.txt` with the formatted plan of
  * each registered query's returned DataFrame, plus
  * `<outDir>/<label>_<suffix>.txt` for every INTERNAL plan the library
  * code hands to [[PlanDump]] while the query builds — the
  * construction-heavy demos (graph builds, catalog DML) hide their real
  * dataflow behind a memoized artifact read, so the hook is what makes
  * their hot plans inspectable. Diagnostic tooling only. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val seen = scala.collection.mutable.Set[String]()
    def write(label: String, df: DataFrame): Unit =
      if (seen.add(label)) {
        val p = java.nio.file.Paths.get(outDir, s"${label}_$suffix.txt")
        java.nio.file.Files.writeString(p,
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        System.err.println(s"wrote $p")
      }
    PlanDump.sink = Some(write)
    try names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      write(name, df)
    } finally PlanDump.sink = None
    spark.stop()
  }
}

/** Hook the library's construction pipelines call with their hot
  * internal DataFrames; a no-op unless [[ExplainDump]] installed a
  * sink. Labels are stable so before/after captures line up. */
object PlanDump {
  @volatile var sink: Option[(String, DataFrame) => Unit] = None
  def dump(label: String, df: DataFrame): Unit = sink.foreach(_(label, df))
}
