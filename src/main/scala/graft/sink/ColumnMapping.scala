package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** COLUMN MAPPING — logical→physical name indirection (the Delta
  * column-mapping discipline) that makes `ALTER TABLE RENAME COLUMN` /
  * `DROP COLUMN` METADATA-ONLY operations on immutable files:
  *
  *  - every data file stores columns under stable PHYSICAL names;
  *  - the committed schema's fields carry their physical name in
  *    field metadata (`graft.physical`), absent = physical == logical
  *    (the unmapped fast path every pre-mapping table stays on);
  *  - a RENAME changes only the logical name (files untouched), a
  *    DROP removes the field from the logical schema (the physical
  *    column stays in the files, invisible to every read);
  *  - once a table is mapped, ADDED columns get UUID-fresh physical
  *    names, so re-adding a dropped column's name can never resurrect
  *    the old data (the whole point of the indirection);
  *  - time travel keeps old shapes for free — each commit pins its
  *    own schema, mapping included.
  *
  * Read side: scans plan under the PHYSICAL schema and surface the
  * LOGICAL names by position (a pure rename — zero row work in the
  * DSv2 path, one aliasing projection in the V1 path). Write side:
  * incoming logical frames rename to physical before the parquet
  * write. Stats, dictionaries, blooms, buckets, and DV keys are all
  * keyed by PHYSICAL name, so committed metadata survives any rename
  * verbatim. */
object ColumnMapping {

  val PhysKey = "graft.physical"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  def hasMapping(s: StructType): Boolean =
    s.fields.exists(_.metadata.contains(PhysKey))

  /** logical name -> physical name for every field. */
  def physOf(s: StructType): Map[String, String] =
    s.fields.map(f => f.name -> physicalName(f)).toMap

  /** The schema as the FILES store it: physical names, no mapping
    * metadata, same field order/types/nullability. */
  def physicalSchema(s: StructType): StructType =
    StructType(s.fields.map(f =>
      StructField(physicalName(f), f.dataType, f.nullable)))

  /** Strip the mapping metadata (the user-facing logical schema). */
  def stripMapping(s: StructType): StructType =
    StructType(s.fields.map { f =>
      if (!f.metadata.contains(PhysKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata).remove(PhysKey)
        f.copy(metadata = mb.build())
      }
    })

  /** Stamp EVERY field with an explicit physical name (its current
    * one) — the upgrade step the first rename/drop performs, pinning
    * the file-side names forever after. */
  def stampAll(s: StructType): StructType =
    StructType(s.fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
        .putString(PhysKey, physicalName(f))
      f.copy(metadata = mb.build())
    })

  /** A fresh physical name for a column ADDED to a mapped table:
    * UUID-salted so it can never collide with a live or dropped
    * column's physical name. */
  def freshPhysical(logical: String): String =
    s"${logical}_${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  def withPhysical(f: StructField, phys: String): StructField = {
    val mb = new MetadataBuilder().withMetadata(f.metadata).putString(PhysKey, phys)
    f.copy(metadata = mb.build())
  }

  /** Rename a logical frame's columns to their physical names (the
    * write-side step on mapped tables). Unknown columns are rejected —
    * a mapped table's writes must match the schema exactly. */
  def toPhysicalDf(df: DataFrame, schema: StructType): DataFrame = {
    val phys = physOf(schema)
    df.select(df.columns.toSeq.map { c =>
      col(c).as(phys.getOrElse(c, throw new IllegalArgumentException(
        s"column $c is not in the mapped table schema ${schema.simpleString}")))
    }: _*)
  }

  /** Aliasing projection physical → logical (the V1 read-side step). */
  def toLogicalCols(schema: StructType): Seq[Column] =
    schema.fields.toSeq.map(f => col(physicalName(f)).as(f.name))

  /** The logical field whose physical name is `phys`, if still live. */
  def logicalOfPhysical(schema: StructType, phys: String): Option[StructField] =
    schema.fields.find(f => physicalName(f) == phys)
}
