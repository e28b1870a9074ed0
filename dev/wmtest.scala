import org.apache.spark.sql.SparkSession
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.sql.adaptive.enabled", "true").config("spark.ui.enabled", "false").getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
val r1 = time("wm demo 1st")(graft.streaming.WatermarkDemo.lateDropDemo(spark2))
r1.show(false)
val r2 = time("wm demo 2nd")(graft.streaming.WatermarkDemo.lateDropDemo(spark2))
println("rows: " + r2.count() + " shuffle.partitions now: " + spark2.conf.get("spark.sql.shuffle.partitions"))
println("DONE-WM")
