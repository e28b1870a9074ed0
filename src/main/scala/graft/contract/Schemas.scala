package graft.contract

import org.apache.avro.Schema
import org.apache.spark.sql.types._

/** First-class schema contracts (SURVEY.md §1.3): the engine's schemas
  * are Scala constants derived from checked-in Avro contracts — the
  * single source of truth the reference keeps in its Schema Registry
  * (`schemas/SensorEvent.avsc:1-40`, `schemas/HourlyAggregate.avsc:1-38`,
  * `docs/data-contracts.md:16-22`).
  */
object Schemas {

  /** `schemas/SensorEvent.avsc` — 6 fields, 2 nullable unions. */
  val SensorEventAvro: String =
    """{
      |  "type": "record",
      |  "name": "SensorEvent",
      |  "namespace": "graft.iot",
      |  "fields": [
      |    {"name": "device_id", "type": "string"},
      |    {"name": "device_name", "type": ["null", "string"], "default": null},
      |    {"name": "timestamp", "type": "long"},
      |    {"name": "temperature", "type": "float"},
      |    {"name": "humidity", "type": "float"},
      |    {"name": "location", "type": ["null", "string"], "default": null}
      |  ]
      |}""".stripMargin

  /** `schemas/HourlyAggregate.avsc` — the agg-stream output contract. */
  val HourlyAggregateAvro: String =
    """{
      |  "type": "record",
      |  "name": "HourlyAggregate",
      |  "namespace": "graft.iot",
      |  "fields": [
      |    {"name": "device_id", "type": "string"},
      |    {"name": "hour_bucket", "type": "long"},
      |    {"name": "avg_temperature", "type": "float"},
      |    {"name": "max_temperature", "type": "float"},
      |    {"name": "min_temperature", "type": "float"},
      |    {"name": "event_count", "type": "int"}
      |  ]
      |}""".stripMargin

  def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** Avro -> Spark type mapping for the flat-record contract class this
    * engine carries (nullable unions, primitives). Mirrors what
    * spark-avro's SchemaConverters does for these cases. */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"not a record: $schema")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private[contract] def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.toArray(Array.empty[Schema]).toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      (toSparkType(nonNull.head)._1, true)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  val SensorEventStruct: StructType = toStructType(parse(SensorEventAvro))
  val HourlyAggregateStruct: StructType = toStructType(parse(HourlyAggregateAvro))
}
