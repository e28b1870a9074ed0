// :load from sbt console — profile q_session_window at sf0.1
import org.apache.spark.sql.SparkSession
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.sql.adaptive.enabled", "true").config("spark.ui.enabled", "false").getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
val d = "/root/testdata/sf0.1"
val ev = graft.Tables.events(spark2, d).cache()
println("events: " + ev.count())
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
time("sliding")(graft.query.Windows.slidingWindow(ev).write.format("noop").mode("overwrite").save())
time("session builtin")(graft.query.Windows.sessionWindow(ev).write.format("noop").mode("overwrite").save())
time("session builtin 2nd")(graft.query.Windows.sessionWindow(ev).write.format("noop").mode("overwrite").save())
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
def gai = { val e = ev.withColumn("us", unix_micros(graft.Tables.instant(col("ts")))); val w = Window.partitionBy(col("user_id")).orderBy(col("us")); e.withColumn("prev", lag(col("us"), 1).over(w)).withColumn("new_sess", when(col("prev").isNull || col("us") - col("prev") >= 1800000000L, 1).otherwise(0)).withColumn("sess", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).groupBy(col("user_id"), col("sess")).agg(count(lit(1)).as("event_count"), graft.Tables.decAvg(col("value")).as("avg_value"), min(col("us")).as("min_us"), max(col("us")).as("max_us")).select(col("user_id"), (col("min_us") / 1000000L).cast(LongType).as("session_start"), ((col("max_us") + 1800000000L) / 1000000L).cast(LongType).as("session_end"), col("event_count"), col("avg_value")).orderBy("user_id", "session_start") }
time("gaps-and-islands")(gai.write.format("noop").mode("overwrite").save())
time("gaps-and-islands 2nd")(gai.write.format("noop").mode("overwrite").save())
println("DONE-PROFILE")
