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

  /** SimHash64 over a Catalyst string array — the single kernel shared
    * by SimHash64's interpreted eval AND its generated code (called as
    * a static from the codegen'd class). Hashes UTF-8 bytes directly,
    * no per-token String materialization; null elements are skipped. */
  def simhash64Array(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes
        val h = fnv1a64Bytes(b, 0, b.length)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
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

/** `simhash64(array<string>) -> long` — codegen'd scalar expression;
  * eval and generated code share the `HashExprs.simhash64Array` kernel,
  * so the simhash stage stays inside whole-stage codegen with the
  * tokenizer that feeds it. Null array elements are skipped. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashExprs.simhash64Array(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.simhash64Array($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
  override def prettyName: String = "simhash64"
}

object ColumnFns {
  def fnv1a64(c: Column): Column = GraftBridge.column(Fnv1a64(GraftBridge.expression(c)))
  def simhash64(c: Column): Column = GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
