package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.contract.Schemas

/** Confluent-wire-format Avro decode as a custom Catalyst expression —
  * the one genuinely custom expression this engine needs (SURVEY.md
  * §2.1 S3/S4): the spark-avro module is not on the offline classpath,
  * avro-core 1.12 is.
  *
  * Wire format (`src/producer.py:74-77`, `docs/data-contracts.md:124-126`):
  * magic byte 0x00 + big-endian int32 schema id + Avro binary body.
  * The header strip is fused into the decode (the reference's separate
  * `substr(6, 100000)` projection silently truncates >100 KB messages —
  * `src/spark_consumer.py:109-111` — which this fusion avoids).
  *
  * Codegen keeps the surrounding stage fused: the generated code calls
  * the decode kernel through a reference object (each task deserializes
  * its own expression instance, so the reused decoder/record buffers
  * stay single-threaded).
  */
case class FromAvro(child: Expression, schemaJson: String, confluentWire: Boolean = true,
                    permissive: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val schema: Schema = Schemas.parse(schemaJson)
  @transient private lazy val struct: StructType = Schemas.toStructType(schema)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  @transient private var decoder: BinaryDecoder = _
  @transient private var record: GenericRecord = _

  override def dataType: DataType = Schemas.toStructType(Schemas.parse(schemaJson))
  override def nullable: Boolean = true

  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"from_avro expects BINARY, got ${other.catalogString}")
  }

  /** permissive=true is the long-job posture: a corrupt record decodes
    * to a NULL struct (filter with `IS NOT NULL`) instead of failing
    * the task — one bad Kafka message must not kill a multi-hour scan.
    * permissive=false (FAILFAST) surfaces the decode error. */
  override def nullSafeEval(input: Any): Any =
    decodeKernel(input.asInstanceOf[Array[Byte]])

  /** Shared by eval and codegen; null on corrupt input iff permissive. */
  def decodeKernel(bytes: Array[Byte]): InternalRow =
    if (permissive) {
      try decode(bytes)
      catch { case _: Exception => null }
    } else decode(bytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fromAvro", this, classOf[FromAvro].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.decodeKernel($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  private def decode(bytes: Array[Byte]): InternalRow = {
    val (off, len) =
      if (confluentWire) {
        require(bytes.length >= 5 && bytes(0) == 0x00.toByte,
          s"not Confluent wire format (len=${bytes.length})")
        (5, bytes.length - 5)
      } else (0, bytes.length)
    decoder = DecoderFactory.get.binaryDecoder(bytes, off, len, decoder)
    record = reader.read(record, decoder)
    toInternalRow(record)
  }

  private def toInternalRow(rec: GenericRecord): InternalRow = {
    val vals = new Array[Any](struct.length)
    var i = 0
    while (i < struct.length) {
      vals(i) = toCatalyst(rec.get(i), struct(i).dataType)
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                => null
    case (s: CharSequence, _: StringType) => UTF8String.fromString(s.toString)
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (x, _)                   => x // int/long/float/double/boolean pass through
  }

  override protected def withNewChildInternal(newChild: Expression): FromAvro =
    copy(child = newChild)
  override def prettyName: String = "from_avro"
}

/** Producer-side encode as an expression: struct -> Confluent-wire Avro
  * binary (magic 0x00 + big-endian schema id + body) — the symmetric
  * inverse of FromAvro, so the full producer contract
  * (`src/producer.py:74-82`) is expressible inside a Catalyst plan. */
case class ToAvro(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression {

  @transient private lazy val schema: Schema = Schemas.parse(schemaJson)
  @transient private lazy val struct: StructType = Schemas.toStructType(schema)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val expect = Schemas.toStructType(Schemas.parse(schemaJson))
    child.dataType match {
      case s: StructType if s.length == expect.length =>
        // positional per-field type check (names may differ — Avro
        // writes by position); nullability is allowed to widen.
        s.fields.zip(expect.fields).find { case (in, ex) => in.dataType != ex.dataType } match {
          case Some((in, ex)) => TypeCheckFailure(
            s"to_avro field '${ex.name}' expects ${ex.dataType.catalogString}, " +
              s"got ${in.dataType.catalogString}")
          case None => TypeCheckSuccess
        }
      case other => TypeCheckFailure(
        s"to_avro expects a ${expect.length}-field struct matching the Avro schema, " +
          s"got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    encodeKernel(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toAvro", this, classOf[ToAvro].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeKernel($c);")
  }

  def encodeKernel(row: InternalRow): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < struct.length) {
      val dt = struct(i).dataType
      val v =
        if (row.isNullAt(i)) null
        else dt match {
          case _: StringType => row.getUTF8String(i).toString
          case LongType      => java.lang.Long.valueOf(row.getLong(i))
          case IntegerType   => java.lang.Integer.valueOf(row.getInt(i))
          case FloatType     => java.lang.Float.valueOf(row.getFloat(i))
          case DoubleType    => java.lang.Double.valueOf(row.getDouble(i))
          case BooleanType   => java.lang.Boolean.valueOf(row.getBoolean(i))
          case BinaryType    => ByteBuffer.wrap(row.getBinary(i))
          case other => throw new IllegalArgumentException(s"unsupported: $other")
        }
      rec.put(i, v)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(0x00)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = EncoderFactory.get.binaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): ToAvro =
    copy(child = newChild)
  override def prettyName: String = "to_avro"
}

object AvroCodec {

  /** Column API for the decode expression. */
  def from_avro(c: Column, schemaJson: String, confluentWire: Boolean = true,
                permissive: Boolean = false): Column =
    GraftBridge.column(FromAvro(GraftBridge.expression(c), schemaJson, confluentWire, permissive))

  /** Column API for the encode expression. */
  def to_avro(c: Column, schemaJson: String, schemaId: Int = 1): Column =
    GraftBridge.column(ToAvro(GraftBridge.expression(c), schemaJson, schemaId))

  /** Producer-side encode (test + generator path, mirroring the
    * reference producer's AvroSerializer): Avro binary body with the
    * 5-byte Confluent header. Plain Scala — used from mapPartitions /
    * test fixtures, not as an expression. */
  def encodeConfluent(schema: Schema, schemaId: Int)(fields: Map[String, Any]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fields.foreach { case (k, v) => rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    out.write(0x00)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = EncoderFactory.get.binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
