// :load from sbt console — round-13 entry smoke (driver contract)
import org.apache.spark.sql.SparkSession
val spark2 = { SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").withExtensions(new graft.GraftExtensions).getOrCreate() }
spark2.sparkContext.setLogLevel("WARN")
println(s"ENTRY-ROWS=${graft.SparkEntry.entry(spark2).count()}")
println("DONE-SMOKE")
