package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing primitives used by the dedup /
  * fingerprinting operators. Implemented as native Catalyst expressions
  * (not Scala UDFs) so they stay inside Tungsten rows, avoid
  * serialization, and — for FNV — participate in whole-stage codegen.
  */
object HashExprs {

  /** FNV-1a 64-bit over a string's UTF-8 bytes. */
  @inline def fnv1a64Bytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fnv1a64Bytes(b, 0, b.length)
  }

  /** 64-bit SimHash of a token array: per-token FNV-1a hash, signed
    * bit-vote accumulation, sign -> bit. Classic Charikar scheme. */
  def simhash64(tokens: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv1a64(tokens.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** `fnv1a64(string) -> long` — codegen'd scalar expression. */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String].getBytes
    HashExprs.fnv1a64Bytes(u, 0, u.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashExprs.fnv1a64Bytes($c.getBytes(), 0, $c.getBytes().length)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 = copy(newChild)
  override def prettyName: String = "fnv1a64"
}

/** `simhash64(array<string>) -> long`. Interpreted eval (cheap relative
  * to the tokenize upstream); null array elements are skipped. */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val it = (0 until n).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).toString)
    HashExprs.simhash64(it)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
  override def prettyName: String = "simhash64"
}

object ColumnFns {
  def fnv1a64(c: Column): Column = GraftBridge.column(Fnv1a64(GraftBridge.expression(c)))
  def simhash64(c: Column): Column = GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
