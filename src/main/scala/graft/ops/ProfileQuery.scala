package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * `runMain graft.ops.ProfileQuery q_name [q_name2 ...]` runs each named
  * registered query through the same noop-sink protocol as [[graft.Bench]]
  * (same session config, same env vars) and prints, per query and per
  * PASS (two passes, like the bench):
  *
  *   - total wall seconds;
  *   - every Spark JOB with its duration, task count and the first
  *     stage's call site — this is what localizes cost inside the
  *     construction-heavy demos (graph builds, catalog DML pipelines),
  *     where one registered query executes dozens of jobs.
  *
  * Diagnostic tooling only: never run by the driver, adds no queries.
  */
object ProfileQuery {

  private final case class JobRec(id: Int, desc: String, site: String,
                                  var tasks: Int = 0, var start: Long = 0L,
                                  var end: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
    // A/B experiments: args of the form conf:key=value override session
    // conf; remaining args are query names.
    args.filter(_.startsWith("conf:")).map(_.stripPrefix("conf:"))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-SQL-execution attribution: action name + wall ns (covers
    // planning + execution, which the job listener alone cannot see)
    val sqlExecs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val top = qe.analyzed.getClass.getSimpleName
        sqlExecs.add((funcName, durationNs, top)); ()
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = js.stageInfos.headOption.map(_.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("ProfileQuery"))
          .getOrElse(js.stageInfos.head.name)).getOrElse("")
        val rec = JobRec(js.jobId, desc, site,
          js.stageInfos.map(_.numTasks).sum, js.time)
        jobs.put(js.jobId, rec)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    })

    // same warm + dim-cache protocol as Bench so numbers are comparable
    Seq("q_count", "q_pricing_summary", "q_hourly_agg").foreach { w =>
      try graft.SparkEntry.queries.get(w).foreach(
        _(spark, sfDir).write.format("noop").mode("overwrite").save())
      catch { case _: Throwable => () }
    }
    Seq(graft.Tables.customer(spark, sfDir), graft.Tables.supplier(spark, sfDir),
        graft.Tables.part(spark, sfDir), graft.Tables.nation(spark, sfDir),
        graft.Tables.region(spark, sfDir))
      .foreach { df => df.cache(); df.count() }

    for (name <- args.filterNot(_.startsWith("conf:")); pass <- 1 to 2) {
      if (pass == 2) {
        graft.streaming.DemoMemo.reset(spark)
        graft.llm.AnnIndex.vacuumArtifacts(spark, _ => false): Unit
      }
      jobs.clear()
      sqlExecs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // settle async listener events (listenerBus is private[spark])
      Thread.sleep(500)
      val recs = {
        import scala.jdk.CollectionConverters._
        jobs.values().asScala.toSeq.sortBy(_.id)
      }
      val jobSum = recs.map(r => (r.end - r.start) / 1e3).sum
      val execs = {
        import scala.jdk.CollectionConverters._
        sqlExecs.asScala.toSeq
      }
      val execSum = execs.map(_._2 / 1e9).sum
      println(f"\n=== $name pass $pass: $secs%.2f s wall, ${recs.size} jobs, $jobSum%.2f s in-job, ${execs.size} sql-execs, $execSum%.2f s in-exec ===")
      execs.groupBy(e => (e._1, e._3)).toSeq
        .map { case ((fn, top), es) => (fn, top, es.size, es.map(_._2 / 1e9).sum) }
        .sortBy(-_._4).take(20).foreach { case (fn, top, cnt, s) =>
          println(f"  exec $s%7.3f s x$cnt%-4d $fn%-22s $top")
        }
      recs.sortBy(r => -(r.end - r.start)).take(15).foreach { r =>
        val d = (r.end - r.start) / 1e3
        println(f"  job ${r.id}%4d ${d}%7.3f s ${r.tasks}%5d tasks  ${r.desc.take(40)}%-40s ${r.site.take(100)}")
      }
    }
    spark.stop()
  }
}
