// :load probe — can the parquet reader widen int32→long, float→double,
// int→double, decimal growth, across V1 reads and in mixed-file scans?
import org.apache.spark.sql.types._
val dir = java.nio.file.Files.createTempDirectory("widen_").toString
spark.range(10).selectExpr("cast(id as int) as a", "cast(id as float) as b", "cast(id as decimal(10,2)) as c").write.mode("overwrite").parquet(dir + "/f1")
// mixed: a second file already written WIDE
spark.range(10, 20).selectExpr("cast(id as long) as a", "cast(id as double) as b", "cast(id as decimal(20,4)) as c").write.mode("append").parquet(dir + "/f1")
val wide = new StructType().add("a", LongType).add("b", DoubleType).add("c", DecimalType(20, 4))
val out = try { val d = spark.read.schema(wide).parquet(dir + "/f1"); (d.count(), d.agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0), "OK") } catch { case e: Throwable => (0L, 0L, "FAIL: " + e.getMessage.take(200)) }
println("WIDEN_PROBE=" + out)
val out2 = try { val d = spark.read.schema(new StructType().add("a", DoubleType)).parquet(dir + "/f1"); (d.count(), "int->double OK") } catch { case e: Throwable => (0L, "int->double FAIL: " + e.getMessage.take(120)) }
println("WIDEN_PROBE2=" + out2)
sys.exit(0)
