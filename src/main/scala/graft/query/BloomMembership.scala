package graft.query

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(long) -> boolean` probing a pre-built Bloom
  * filter. The filter ships as its serialized bytes (compact, stable)
  * and is rebuilt lazily once per executor; the probe itself is a
  * codegen'd bit test, so a 100 TB scan pays two hash ops per row and
  * no shuffle. */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an integer key, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  def contains(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(input: Any): Any = input match {
    case i: java.lang.Integer => contains(i.toLong)
    case l: java.lang.Long    => contains(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains((long) $c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

/** Approximate-membership join pruning — the engine-level form of the
  * runtime row-level filtering Spark 3.3+ injects itself
  * (InjectRuntimeFilter), surfaced as an explicit operator: build a
  * Bloom filter over a join key on the build side (distributed
  * `stat.bloomFilter` aggregation, driver holds only the ~MB sketch),
  * broadcast it inside a codegen'd probe expression, and pre-filter the
  * probe side before any shuffle. At 100 TB this is how a fact scan
  * avoids shuffling rows that cannot join: false POSITIVES cost only
  * wasted shuffle (bounded by fpp), false negatives cannot happen.
  */
object BloomMembership {

  def mightContain(key: Column, bloom: BloomFilter): Column = {
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    GraftBridge.column(BloomMightContainLong(GraftBridge.expression(key), bytes.toByteArray))
  }

  /** The oracle-checkable face: every customer key flagged with EXACT
    * membership in orders (SQL-recomputable) plus two gates — the
    * per-row no-false-negative theorem, and a global measured-FPR bound
    * (<= `fprBound`, 3x the configured fpp; a broken hash or bit array
    * flips one of them). The Bloom verdict itself is engine-internal,
    * so it enters the output only through the gates. */
  def membershipReport(orders: DataFrame, customer: DataFrame,
                       fpp: Double = 0.03, fprBound: Double = 0.09): DataFrame = {
    val expected = math.max(orders.count(), 1L)
    val bloom = orders.stat.bloomFilter("o_custkey", expected, fpp)

    val memberDim = orders.select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("exact_member", lit(true))
    val flags = customer.select(col("c_custkey"))
      .join(memberDim, Seq("c_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("exact_member"), lit(false)).as("exact_member"),
        mightContain(col("c_custkey"), bloom).as("bloom_member"))
      .localCheckpoint() // evaluated twice: FPR gate + output rows

    val gateRow: Row = flags.agg(
      sum(when(col("bloom_member") && !col("exact_member"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("exact_member"), 1L).otherwise(0L)).as("neg")).head()
    val fp = gateRow.getLong(0)
    val neg = gateRow.getLong(1)
    val fprOk = neg == 0L || fp.toDouble / neg <= fprBound

    flags.select(
      col("c_custkey"),
      col("exact_member"),
      (!col("exact_member") || col("bloom_member")).as("no_false_negative_ok"),
      lit(fprOk).as("fpr_ok"))
      .orderBy("c_custkey")
  }
}
