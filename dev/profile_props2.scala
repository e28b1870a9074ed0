// :load — compare project-before-sort vs project-after-sort for props_map
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.sql.adaptive.enabled", "true").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
val d = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
val ev = graft.Tables.events(spark2, d)
val m = { from_json(col("props"), MapType(StringType, StringType)) }
def before = { ev.select(col("event_id"), m.getItem("k").as("k_str"), size(map_keys(m)).as("n_keys")).orderBy("event_id") }
def after = { ev.select(col("event_id"), col("props")).orderBy("event_id").select(col("event_id"), m.getItem("k").as("k_str"), size(map_keys(m)).as("n_keys")) }
time("warmup")(ev.select(col("event_id")).write.format("noop").mode("overwrite").save())
time("project-before-sort 1")(before.write.format("noop").mode("overwrite").save())
time("project-after-sort 1")(after.write.format("noop").mode("overwrite").save())
time("project-before-sort 2")(before.write.format("noop").mode("overwrite").save())
time("project-after-sort 2")(after.write.format("noop").mode("overwrite").save())
println(after.queryExecution.executedPlan.toString.take(2000))
println("DONE-PROFILE2")
