package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.types._

import graft.sink.ManifestSink

/** One axis of a committed partition layout, carried into the
  * REPLACEMENT WRITE of a row-level DML (round 18 single-write CoW):
  * the V2 transform Spark clusters and sorts the replacement plan by
  * (resolved through the catalog's FunctionCatalog to the SAME bound
  * function the SPJ read path compares — the write-side placement
  * and the declared transform must be one function or co-partitioning
  * would silently lie), plus the row-local evaluator computing the
  * synthetic partition value the staged write rotates files on. The
  * evaluators DELEGATE to those very bound functions
  * ([[GraftBucketBound]], [[GraftTimeBound]], [[GraftTruncBound]]),
  * so write placement, pruning, and join planning can never drift
  * apart. */
sealed trait LayoutAxisSpec extends Serializable {
  /** The spec's source column as stored in the data files. */
  def col: String
  /** The V2 transform over the write plan's column name. */
  def transform(logicalCol: String): Transform
  /** True when [[transform]] is the identity — its sort IS the raw
    * column sort, so callers skip the duplicate ordering key. */
  def isIdentity: Boolean = false
  /** The synthetic partition field's type for a source column type. */
  def fieldType(colType: DataType): DataType
  /** Row-local partition-value evaluator over rows whose field
    * `colIdx` holds the source column. NOT thread-safe (carries a
    * reusable buffer) — build one per writer. */
  def mkEval(colIdx: Int, colType: DataType): InternalRow => Any
  /** Refusal for null layout values (placeByKey's contract — the
    * same rule INSERT enforces). */
  def nullMsg: String
}

final case class BucketAxis(col: String, n: Int) extends LayoutAxisSpec {
  override def transform(l: String): Transform = Expressions.bucket(n, l)
  override def fieldType(ct: DataType): DataType = IntegerType
  override def mkEval(i: Int, ct: DataType): InternalRow => Any = {
    val bound = new GraftBucketBound(ct)
    val buf = new GenericInternalRow(2)
    buf.update(0, n)
    row =>
      if (row.isNullAt(i)) null
      else { buf.update(1, row.get(i, ct)); bound.produceResult(buf) }
  }
  override def nullMsg: String = s"bucketed layout: null bucket key $col"
}

final case class TimeAxis(col: String, unit: String) extends LayoutAxisSpec {
  override def transform(l: String): Transform =
    Expressions.apply(unit, Expressions.column(l))
  override def fieldType(ct: DataType): DataType = IntegerType
  override def mkEval(i: Int, ct: DataType): InternalRow => Any = {
    val bound = new GraftTimeBound(unit, ct)
    val buf = new GenericInternalRow(1)
    row =>
      if (row.isNullAt(i)) null
      else { buf.update(0, row.get(i, ct)); bound.produceResult(buf) }
  }
  override def nullMsg: String =
    s"time layout: null partition value in $col"
}

final case class IdentAxis(col: String, width: Option[Int])
  extends LayoutAxisSpec {
  override def transform(l: String): Transform = width match {
    case Some(w) => Expressions.apply("truncate",
      Expressions.literal(w), Expressions.column(l))
    case None => Expressions.identity(l)
  }
  override def isIdentity: Boolean = width.isEmpty
  override def fieldType(ct: DataType): DataType = width match {
    case Some(_) => if (ct == StringType) StringType else LongType
    case None => ct
  }
  override def mkEval(i: Int, ct: DataType): InternalRow => Any = width match {
    case Some(w) =>
      val bound = new GraftTruncBound(ct)
      val buf = new GenericInternalRow(2)
      buf.update(0, w)
      row =>
        if (row.isNullAt(i)) null
        else { buf.update(1, row.get(i, ct)); bound.produceResult(buf) }
    case None =>
      row => if (row.isNullAt(i)) null else row.get(i, ct)
  }
  override def nullMsg: String =
    s"identity/truncate layout: null partition value in $col"
}

object LayoutWrite {

  /** The committed layout of `baseEpoch` as write axes, mirroring
    * [[ManifestSink.layoutForBase]]'s composition cases (the sort-
    * leading axis first). Empty when the epoch carries no
    * fully-covering layout — the replacement write then stages flat,
    * exactly the unpartitioned-table behavior. */
  def axesFor(spark: SparkSession, dir: String,
              baseEpoch: Int): Seq[LayoutAxisSpec] = {
    if (baseEpoch <= 0) return Nil
    val b = ManifestSink.bucketSpec(spark, dir, baseEpoch)
    val t = ManifestSink.ptimeSpec(spark, dir, baseEpoch)
    val i = ManifestSink.identSpec(spark, dir, baseEpoch)
    (b, t, i) match {
      case (Some(bs), Some(ts), None) =>
        Seq(TimeAxis(ts.col, ts.unit), BucketAxis(bs.keyCol, bs.numBuckets))
      case (Some(bs), None, None) => Seq(BucketAxis(bs.keyCol, bs.numBuckets))
      case (None, Some(ts), None) => Seq(TimeAxis(ts.col, ts.unit))
      case (None, None, Some(is)) => Seq(IdentAxis(is.col, is.width))
      case (Some(bs), None, Some(is)) =>
        Seq(IdentAxis(is.col, is.width), BucketAxis(bs.keyCol, bs.numBuckets))
      case (None, Some(ts), Some(is)) =>
        Seq(TimeAxis(ts.col, ts.unit), IdentAxis(is.col, is.width))
      case _ => Nil
    }
  }

  /** Required sort for a laid-out replacement write: the transforms
    * first (the dynamic-partition writer rotates files on value
    * CHANGE — unsorted input explodes the file count), then the raw
    * source columns so zone maps stay tight within each file (skipped
    * for identity axes, whose transform IS the raw column). */
  def ordering(axes: Seq[(LayoutAxisSpec, String)]): Array[SortOrder] =
    (axes.map { case (a, l) =>
      Expressions.sort(a.transform(l), SortDirection.ASCENDING)
    } ++ axes.collect { case (a, l) if !a.isIdentity =>
      Expressions.sort(Expressions.column(l), SortDirection.ASCENDING)
    }).toArray
}

/** Appends the computed layout-partition values to each replacement
  * row — and strips the leading `__row_operation` column ReplaceData
  * prepends when the table declares no metadata attributes — feeding
  * Spark's dynamic-partition writer rows shaped `data ++ partition`.
  * A null layout value is refused (a row placed in any partition
  * directory would break the single-key contract SPJ plans against —
  * the same rule INSERT enforces). */
final class LayoutAppendingWriterFactory(
    delegate: DataWriterFactory,
    dataTypes: Array[DataType],
    axes: Array[(Int, LayoutAxisSpec)]) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long):
      DataWriter[InternalRow] = {
    val inner = delegate.createWriter(partitionId, taskId)
    val evals = axes.map { case (i, a) => (a.mkEval(i, dataTypes(i)), a.nullMsg) }
    val n = dataTypes.length
    val out = new GenericInternalRow(n + axes.length)
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        // rows arrive as [data...] or [__row_operation, data...]
        val off = row.numFields - n
        require(off == 0 || off == 1,
          s"replacement row has ${row.numFields} fields for a " +
            s"$n-column table — unexpected plan shape")
        var i = 0
        while (i < n) { out.update(i, row.get(i + off, dataTypes(i))); i += 1 }
        var j = 0
        while (j < evals.length) {
          val (ev, msg) = evals(j)
          val v = ev(out)
          if (v == null) throw new IllegalArgumentException(msg)
          out.update(n + j, v)
          j += 1
        }
        inner.write(out)
      }
      override def commit(): WriterCommitMessage = inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
  }
}
