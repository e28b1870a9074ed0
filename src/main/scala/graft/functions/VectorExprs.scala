package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused kernels for the vector / n-gram hot paths. The composable
  * higher-order-function formulations (`transform` + `zip_with` +
  * `aggregate`) are semantically identical but materialize an
  * intermediate array per lambda per row — on a 100 TB pair join that
  * allocation tax dominates the arithmetic. These expressions run the
  * same math as ONE primitive loop over ArrayData.
  */

/** `dot(array<float|double>, array<float|double>) -> double` —
  * sequential-order sum, bit-identical to
  * `aggregate(zip_with(a,b,(x,y)->x*y),0d,(acc,v)->acc+v)`. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // NULL is produced on dimension mismatch even for non-null inputs.
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot expects two float/double arrays, got $other")
  }

  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Mismatched dimensions -> NULL, matching the HOF spelling
    // (zip_with pads with null, null * x = null, the aggregate fold
    // returns null) — silent truncation would hide dimension bugs.
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  /** The same one-loop kernel inside whole-stage codegen: the fallback
    * bridge would box every row and break stage fusion in exactly the
    * per-row-hot similarity kernels. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getL = if (leftFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getR = if (rightFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $acc += $getL * $getR; }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(newLeft, newRight)
  override def prettyName: String = "dot_product"
}

/** `sorted_intersect_size(array<long>, array<long>) -> int` — the size
  * of the intersection of two SORTED-ascending distinct arrays by a
  * single merge scan, O(n+m) with zero allocation. Replaces the
  * `size(array_intersect(a,b))` spelling in the Jaccard verification
  * kernels: array_intersect builds a hash set and materializes the
  * intersection array per row — pure overhead when only the cardinality
  * is needed, and the near-dup joins evaluate this once per surviving
  * candidate pair (hundreds of thousands per corpus partition).
  * |A ∪ B| follows as |A| + |B| - |A ∩ B|, so union needs no kernel.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects two ARRAY<BIGINT>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |final int $nx = $x.numElements();
         |final int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xi = $x.getLong($i);
         |  final long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(newLeft, newRight)
  override def prettyName: String = "sorted_intersect_size"
}

object NgramHash {
  final val Mask31 = 0x7fffffffL
  private final val Space = ' '.toByte

  /** 31-bit FNV-1a hash of the word n-gram tokens(i..i+n-1) joined by a
    * single space — identical to fnv1a64(concat_ws(" ", ...)) & Mask31
    * without building the string. */
  def shingleHash(tokens: Array[Array[Byte]], start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var t = start
    val end = start + n
    while (t < end) {
      if (t > start) { h ^= (Space & 0xffL); h *= 0x100000001b3L }
      val bytes = tokens(t)
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      t += 1
    }
    h & Mask31
  }

  def tokensBytes(arr: ArrayData): Array[Array[Byte]] = {
    val n = arr.numElements()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
      i += 1
    }
    out
  }

  /** Distinct 31-bit shingle hashes of a token array (sorted). A doc
    * shorter than one shingle contributes its whole token run as the
    * single shingle; an empty doc contributes nothing. */
  def hashSet(arr: ArrayData, shingleSize: Int): Array[Long] = {
    val toks = tokensBytes(arr)
    val count = if (toks.length == 0) 0 else math.max(toks.length - shingleSize + 1, 1)
    val seen = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < count) {
      seen.add(shingleHash(toks, i, math.min(shingleSize, toks.length - i)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** MinHash coefficient family, seeded — 31-bit odd a, 31-bit b, so
    * a*h+b never overflows a long. */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      as(i) = (rnd.nextLong() & Mask31) | 1L
      bs(i) = rnd.nextLong() & Mask31
      i += 1
    }
    (as, bs)
  }
}

/** `shingle_hash_set(array<string>, n) -> array<long>` — sorted distinct
  * 31-bit hashes of the word n-grams; the exact-Jaccard currency. */
case class ShingleHashSet(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  def compute(arr: ArrayData): ArrayData =
    new GenericArrayData(NgramHash.hashSet(arr, shingleSize))
  // Kernel stays a Scala method; codegen just calls it via a reference
  // object, which keeps the surrounding stage fused (no fallback
  // eval-bridge row boxing).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashSet", this, classOf[ShingleHashSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingle_hash_set"
}

/** `shingle_minhash(array<string>, n, k, seed) -> array<long>` — the
  * full MinHash signature in one pass: shingle -> 31-bit hash ->
  * min over k linear permutations, no intermediate arrays. */
case class ShingleMinHash(child: Expression, shingleSize: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(shingleSize >= 1 && numHashes >= 1,
    s"shingle_minhash needs shingleSize >= 1 and numHashes >= 1, got $shingleSize/$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_minhash expects ARRAY<STRING>, got ${other.catalogString}")
  }

  @transient private lazy val (as, bs) = NgramHash.coefficients(numHashes, seed)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val hs = NgramHash.hashSet(arr, shingleSize)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var k = 0
      while (k < numHashes) {
        val v = as(k) * h + bs(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMinHash", this, classOf[ShingleMinHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingle_minhash"
}

/** `winnow(string, k, w) -> array<long>` — MOSS-style winnowing
  * document fingerprint: rolling polynomial hash over character
  * k-grams, then the minimum hash of each w-length window, de-duplicated
  * consecutively. Robust to local edits (an edit perturbs only nearby
  * windows), which makes it the shard-local near-dup prefilter at
  * corpus scale. One pass, O(len) amortized via a monotonic deque. */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(Winnow.fingerprints(s.getBytes, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[Winnow].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnow"
}

/** `winnow_pos_count(string, k, w) -> long` — the number of distinct
  * k-gram POSITIONS winnowing selects. This is the value with the
  * deterministic guarantee (ceil(windows/w) <= count <= windows), which
  * makes it the cross-engine-checkable face of the fingerprint path:
  * the oracle recomputes the window count from byte lengths and pins
  * the bounds. */
case class WinnowPosCount(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_pos_count needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_pos_count expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long =
    Winnow.posCount(s.getBytes, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowPosCount", this, classOf[WinnowPosCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnow_pos_count"
}

object Winnow {
  private final val Base = 1000003L

  /** Number of DISTINCT k-gram positions selected by winnowing — the
    * quantity the algorithm's guarantees speak about: with E emitted
    * windows (window size win = min(w, n)), every window selects one
    * position and a position can head at most win consecutive windows,
    * so ceil(E / w) <= posCount <= E deterministically. (The distinct
    * HASH count can legitimately drop below the position bound when the
    * text repeats k-grams, so the correctness gate is on positions.)
    * A selected position's reign is one contiguous run of windows — the
    * deque evicts it permanently on a <= hash or on window exit — so
    * counting head-index changes counts distinct positions exactly. */
  def posCount(bytes: Array[Byte], k: Int, w: Int): Long = {
    val n = bytes.length - k + 1
    if (n <= 0) return 0L
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val hs = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }
    val win = math.min(w, n)
    val deque = new Array[Int](n)
    var head = 0; var tail = 0
    var cnt = 0L
    var last = -1
    i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != last) { last = deque(head); cnt += 1 }
      i += 1
    }
    cnt
  }

  /** Sorted distinct window-min rolling hashes. */
  def fingerprints(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return Array.emptyLongArray
    // rolling hashes of all k-grams (wrapping long arithmetic)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val hs = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }
    // window minima via monotonic deque; record each new minimum once
    val win = math.min(w, n)
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) <= i - win) head += 1
      if (i >= win - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }
}

/** `max_equal_run(array<string>) -> int` — longest run of equal
  * adjacent elements. Over a SORTED array this is the maximum element
  * multiplicity, which turns the "most frequent token count" of the
  * repetition filter into a per-row kernel: sort_array + one fused
  * scan, instead of an explode -> (doc_id, token) count -> per-doc max
  * — i.e. zero shuffles on a 100 TB corpus scan. */
case class MaxEqualRun(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"max_equal_run expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    var best = 1
    var run = 1
    var prev = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && prev != null && cur.equals(prev)) {
        run += 1
        if (run > best) best = run
      } else run = 1
      prev = cur
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxEqualRun", this, classOf[MaxEqualRun].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "max_equal_run"
}

/** `zorder2(a, b) -> long` — Morton/Z-order interleave of the low 32
  * bits of two integer columns. Sorting (or range-partitioning) a table
  * by this value clusters BOTH dimensions at once, so parquet row-group
  * min/max stats prune scans filtered on either column — the lakehouse
  * answer to the reference's secondary index on `location`
  * (`cassandra/init.cql:81-82`, SURVEY §2.2 P11). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (LongType | IntegerType, LongType | IntegerType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two integer columns, got $other")
  }

  private def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long    => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(toLong(a), toLong(b))

  // Pure bit arithmetic, inlined (a Scala companion object has no Java
  // static forwarders the generated code could call) — fully fused.
  private def genSpread(v: String): String =
    s"""$v &= 0xffffffffL;
       |$v = ($v | ($v << 16)) & 0x0000ffff0000ffffL;
       |$v = ($v | ($v << 8))  & 0x00ff00ff00ff00ffL;
       |$v = ($v | ($v << 4))  & 0x0f0f0f0f0f0f0f0fL;
       |$v = ($v | ($v << 2))  & 0x3333333333333333L;
       |$v = ($v | ($v << 1))  & 0x5555555555555555L;""".stripMargin

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val za = ctx.freshName("za")
      val zb = ctx.freshName("zb")
      s"""
         |long $za = (long) $a;
         |long $zb = (long) $b;
         |${genSpread(za)}
         |${genSpread(zb)}
         |${ev.value} = $za | ($zb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(newLeft, newRight)
  override def prettyName: String = "zorder2"
}

object ZOrder2 {
  /** Spread the low 32 bits of x across the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Inverse of spread (for tests / debugging). */
  def compact(z0: Long): Long = {
    var z = z0 & 0x5555555555555555L
    z = (z | (z >> 1))  & 0x3333333333333333L
    z = (z | (z >> 2))  & 0x0f0f0f0f0f0f0f0fL
    z = (z | (z >> 4))  & 0x00ff00ff00ff00ffL
    z = (z | (z >> 8))  & 0x0000ffff0000ffffL
    z = (z | (z >> 16)) & 0x00000000ffffffffL
    z
  }
}

object VectorFns {
  def winnow(c: Column, k: Int = 5, w: Int = 4): Column =
    GraftBridge.column(Winnow(GraftBridge.expression(c), k, w))
  def winnowPosCount(c: Column, k: Int = 5, w: Int = 4): Column =
    GraftBridge.column(WinnowPosCount(GraftBridge.expression(c), k, w))
  def maxEqualRun(c: Column): Column =
    GraftBridge.column(MaxEqualRun(GraftBridge.expression(c)))
  def zorder2(a: Column, b: Column): Column =
    GraftBridge.column(ZOrder2(GraftBridge.expression(a), GraftBridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  def shingleHashSet(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(tokens), n))
  def shingleMinHash(tokens: Column, n: Int, k: Int, seed: Long = 42L): Column =
    GraftBridge.column(ShingleMinHash(GraftBridge.expression(tokens), n, k, seed))
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}
