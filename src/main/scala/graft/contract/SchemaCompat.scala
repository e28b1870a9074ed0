package graft.contract

import org.apache.avro.Schema

import scala.jdk.CollectionConverters._

/** BACKWARD-compatibility gate replicating the reference's Schema
  * Registry policy (`docs/data-contracts.md:70-92,172-180,252-275`):
  * a new (reader) schema is backward compatible iff it can read data
  * written with the old (writer) schema —
  *   - field removed: OK (reader ignores it)
  *   - optional field added (has default): OK
  *   - required field added (no default): REJECTED
  *   - type changed: REJECTED unless an allowed Avro promotion
  *     (int->long, int/long->float/double, float->double).
  */
object SchemaCompat {

  final case class Incompatibility(field: String, reason: String)

  def isBackwardCompatible(writer: Schema, reader: Schema): Boolean =
    check(writer, reader).isEmpty

  def check(writer: Schema, reader: Schema): Seq[Incompatibility] = {
    require(writer.getType == Schema.Type.RECORD && reader.getType == Schema.Type.RECORD)
    reader.getFields.asScala.toSeq.flatMap { rf =>
      Option(writer.getField(rf.name())) match {
        case None =>
          if (rf.hasDefaultValue) Nil
          else Seq(Incompatibility(rf.name(), "added without default"))
        case Some(wf) =>
          if (canRead(wf.schema(), rf.schema())) Nil
          else Seq(Incompatibility(rf.name(),
            s"type ${wf.schema()} not readable as ${rf.schema()}"))
      }
    }
  }

  private def nonNull(s: Schema): Seq[Schema] =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.toSeq.filter(_.getType != Schema.Type.NULL)
    else Seq(s)

  private def nullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Can data written as `w` be read as `r`? Flat subset of Avro's
    * resolution rules + numeric promotions. */
  private[contract] def canRead(w: Schema, r: Schema): Boolean = {
    if (nullable(w) && !nullable(r)) return false
    (nonNull(w), nonNull(r)) match {
      case (Seq(wb), Seq(rb)) => promotable(wb.getType, rb.getType)
      case _ => false
    }
  }

  import Schema.Type._
  private def promotable(w: Schema.Type, r: Schema.Type): Boolean =
    w == r || ((w, r) match {
      case (INT, LONG) | (INT, FLOAT) | (INT, DOUBLE) => true
      case (LONG, FLOAT) | (LONG, DOUBLE)             => true
      case (FLOAT, DOUBLE)                            => true
      case (STRING, BYTES) | (BYTES, STRING)          => true
      case _                                          => false
    })
}
