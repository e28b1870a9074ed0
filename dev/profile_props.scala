// :load from sbt console — isolate the q_props_map r4 regression at sf0.1
import org.apache.spark.sql.SparkSession
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.sql.adaptive.enabled", "true").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
val d = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
def run(label: String) = time(label)(graft.pipeline.EventPipeline.propsMap(graft.Tables.events(spark2, d)).write.format("noop").mode("overwrite").save())
run("props_map cold")
run("props_map warm1")
run("props_map warm2")
spark2.conf.set("spark.sql.subexpressionElimination.enabled", "false")
run("props_map no-CSE")
spark2.conf.set("spark.sql.subexpressionElimination.enabled", "true")
time("project_flatten warm")(graft.pipeline.EventPipeline.projectFlatten(graft.Tables.events(spark2, d)).write.format("noop").mode("overwrite").save())
println("DONE-PROFILE")
