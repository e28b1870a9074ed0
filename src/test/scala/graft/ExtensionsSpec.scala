package graft

import org.apache.spark.sql.functions._

import graft.avro.AvroCodec
import graft.contract.Schemas
import graft.functions.HashExprs

/** SQL-function registration + expression-level Avro encode/decode
  * symmetry. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registered SQL functions evaluate like the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT fnv1a64('foobar') AS h,
        |  dot_product(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |              array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d,
        |  simhash64(array('a','b','c')) AS s,
        |  size(shingle_hash_set(array('a','b','c','d'), 3)) AS n_sh,
        |  size(shingle_minhash(array('a','b','c','d'), 3, 16)) AS n_sig,
        |  size(winnow('abcdefghijklmnop', 5, 4)) AS n_fp
        |""".stripMargin).collect().head
    assert(r.getLong(0) == HashExprs.fnv1a64("foobar"))
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) == HashExprs.simhash64(Iterator("a", "b", "c")))
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 16)
    assert(r.getInt(5) > 0)
  }

  test("to_avro / from_avro expressions are inverse (plan-level round trip)") {
    val events = graft.ingest.Generator.sensorEvents(spark, 4, 3)
    val decoded = events
      .select(AvroCodec.to_avro(struct(
        col("device_id"), col("device_name"), col("timestamp"),
        col("temperature"), col("humidity"), col("location")), Schemas.SensorEventAvro).as("value"))
      .select(AvroCodec.from_avro(col("value"), Schemas.SensorEventAvro).as("data"))
      .select("data.*")
    val got = decoded.orderBy("device_id", "timestamp").collect().toSeq
    val want = events.orderBy("device_id", "timestamp").collect().toSeq
    assert(got == want)
  }

  test("from_avro_confluent works from SQL with a literal schema") {
    GraftFunctions.register(spark)
    val schema = Schemas.parse(Schemas.SensorEventAvro)
    val bytes = AvroCodec.encodeConfluent(schema, 3)(Map(
      "device_id" -> "d", "device_name" -> null,
      "timestamp" -> java.lang.Long.valueOf(5L),
      "temperature" -> java.lang.Float.valueOf(1f),
      "humidity" -> java.lang.Float.valueOf(2f),
      "location" -> "Rome"))
    Seq(bytes).toDF("value").createOrReplaceTempView("raw_avro")
    val json = Schemas.SensorEventAvro.replace("\n", " ").replace("'", "''")
    val r = spark.sql(
      s"SELECT from_avro_confluent(value, '$json').device_id AS d FROM raw_avro")
      .collect().head
    assert(r.getString(0) == "d")
  }
}
