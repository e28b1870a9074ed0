package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, AttributeSet, BaseOrdering, EqualTo,
  Expression, GenericInternalRow, GreaterThan, GreaterThanOrEqual,
  IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, PredicateHelper,
  RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator top-k-per-key: the engine's answer to the reference's
  * per-device "latest N" read pattern (`cassandra/init.cql:28-31` orders
  * rows `timestamp DESC` inside each partition exactly so `LIMIT N` per
  * device is cheap) generalized to all keys at once.
  *
  * Spark's own lowering of `row_number() <= k` (InferWindowGroupLimit,
  * Spark 3.5+) still SORTS every input partition before the partial
  * group-limit, shuffles, sorts again, and runs a full WindowExec to
  * recompute the rank it just bounded. This operator replaces the whole
  * pattern with:
  *
  *   TopKPerKeyPartialExec   per-partition bounded heaps, O(n log k),
  *                           NO pre-shuffle sort; emits <= k rows per
  *                           (key, partition)
  *   -> hash exchange on key (only the pruned survivors move)
  *   -> one sort of the survivors (<= k * partitions rows per key)
  *   TopKPerKeyFinalExec     streaming group scan, emits rank 1..k
  *
  * At 100 TB the pre-shuffle full sort is the dominant cost of the
  * built-in plan; the heap pass reads the scan once and shuffles k rows
  * per key per partition instead of every row. Correctness does not
  * depend on the partial: it is a pure prune (any row it drops is
  * provably outside its partition's top k, hence outside the global
  * top k for its key).
  */
final case class TopKPerKeyNode(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(partitionExprs.nonEmpty, "TopKPerKey needs at least one key (global top-k is TakeOrdered)")
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Optimizer rewrite: `Filter(rn <= k, Window([rn := row_number() OVER
  * (PARTITION BY p ORDER BY o)], p, o, child))` becomes
  * `TopKPerKeyNode(p, o, k, rn, child)` — the `rn` attribute keeps its
  * exprId, so every downstream reference (projections, sorts, the
  * user's `rn` output column) resolves unchanged.
  *
  * Guards: exactly one window expression, and it is a plain
  * `row_number()`; non-empty PARTITION BY (global top-k already has
  * TakeOrderedAndProject); non-empty ORDER BY; `rn` bound by `<=`/`<`
  * (or the mirrored `>=`/`>`) against an int literal. Any extra
  * conjuncts stay behind in a residual Filter above the new node.
  * A WindowGroupLimit the built-in rule may already have inserted
  * below the Window is dropped — the partial heap subsumes it.
  */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Upper bound on `rn` implied by one conjunct, plus whether the
    * conjunct must survive as a residual predicate. `rn <= n` variants
    * are fully absorbed by TopK(k = n); `rn = n` bounds to n but keeps
    * the equality as a residual over the emitted rank column (the
    * "exactly the nth row per key" pattern — n = 1 is keep-latest /
    * keep-first dedup). */
  private def boundOf(rn: Attribute, e: Expression): Option[(Int, Boolean)] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rn) => Some((n, false))
    case LessThan(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rn)        => Some((n - 1, false))
    case GreaterThanOrEqual(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rn) => Some((n, false))
    case GreaterThan(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rn)     => Some((n - 1, false))
    case EqualTo(a: Attribute, IntegerLiteral(n)) if a.semanticEquals(rn)         => Some((n, true))
    case EqualTo(IntegerLiteral(n), a: Attribute) if a.semanticEquals(rn)         => Some((n, true))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, w: Window) =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _))
            if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
               w.partitionSpec.forall(_.deterministic) &&
               w.orderSpec.forall(_.deterministic) =>
          val rn = alias.toAttribute
          val conjuncts = splitConjunctivePredicates(cond)
          val bounds = conjuncts.map(c => c -> boundOf(rn, c))
          if (!bounds.exists(_._2.isDefined)) f
          else {
            val k = bounds.collect { case (_, Some((n, _))) => n }.min
            // Residuals: non-bound conjuncts, plus equality bounds (they
            // re-filter the emitted rank column; pure upper bounds >= k
            // are implied by the operator and dropped).
            val rest = bounds.collect {
              case (c, None) => c
              case (c, Some((_, true))) => c
            }
            if (k <= 0) f // contradiction; leave for the empty-relation rules
            else {
              // The built-in InferWindowGroupLimit may already sit below.
              val input = w.child match {
                case WindowGroupLimit(_, _, _, _, gc) => gc
                case other => other
              }
              val topk = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, rn, input)
              if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            }
          }
        case _ => f
      }
  }
}

/** Library API: build the TopKPerKey node directly — no reliance on
  * the optimizer rewrite recognizing a window idiom. The session must
  * carry GraftExtensions (for TopKStrategy) or planning falls back to
  * Spark's error for an unplanned node.
  */
object TopK {
  import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.IntegerType

  /** Top `k` rows per `keys` group under `order` (use `col(...).desc`
    * / `.asc` Columns), with the rank emitted as `rankCol`. The order
    * Columns are resolved by planting them in a real sortWithinPartitions
    * and unwrapping the analyzed Sort node — the analyzer does the
    * Column -> resolved SortOrder conversion, so nulls-ordering and
    * expression sort keys all behave exactly as they do in df.sort. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
             rankCol: String = "rn"): DataFrame = {
    val (sortOrders, child) =
      GraftBridge.analyzed(df.sortWithinPartitions(order: _*)) match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
        case other => throw new IllegalStateException(s"expected a Sort node, got $other")
      }
    val keyAttrs: Seq[Expression] = keys.map { name =>
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"key column '$name' not in ${child.output.map(_.name).mkString(", ")}"))
    }
    val rn = AttributeReference(rankCol, IntegerType, nullable = false)()
    GraftBridge.ofRows(df.sparkSession, TopKPerKeyNode(keyAttrs, sortOrders, k, rn, child))
  }
}

object TopKStrategy extends SparkStrategy {
  /** Keys buffered per partition before the partial degrades to
    * pass-through (a safety valve: pathological key cardinality within
    * one partition stops pruning instead of OOMing — the final operator
    * alone is still exactly correct). 2^20 keys * k rows is the bound. */
  val MaxBufferedKeys: Int = 1 << 20

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rn, child) =>
      TopKPerKeyFinalExec(keys, order, k, rn,
        TopKPerKeyPartialExec(keys, order, k, MaxBufferedKeys, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Pre-shuffle prune: bounded max-heap of size k per key per input
  * partition. No sort of the input; emits buffered survivors at
  * end-of-partition. Falls back to passing rows through untouched once
  * `maxBufferedKeys` distinct keys are resident (correct because the
  * prune is optional).
  */
final case class TopKPerKeyPartialExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxBufferedKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // prunedRows quantifies what the heap pass saved the exchange;
  // passThroughRows > 0 flags a partition that hit the key-cardinality
  // safety valve (still correct, but un-pruned — a tuning signal).
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "prunedRows" -> SQLMetrics.createMetric(sparkContext, "rows pruned before the exchange"),
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext, "rows passed through unpruned (key-cap hit)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = partitionExprs
    val sortOrder = order
    val limit = k
    val maxKeys = maxBufferedKeys
    val childOutput = child.output
    val outRows = longMetric("numOutputRows")
    val pruned = longMetric("prunedRows")
    val passed = longMetric("passThroughRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: BaseOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // Max-heap under the sort order: peek() is the WORST retained row,
      // so a new row replaces it iff the new row sorts strictly before it.
      val heapOrd = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

      new Iterator[InternalRow] {
        private var passThrough: InternalRow = _
        private var flush: java.util.Iterator[java.util.PriorityQueue[InternalRow]] = _
        private var flushCur: java.util.Iterator[InternalRow] = _

        private def pump(): Unit = {
          while (passThrough == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              if (heaps.size() >= maxKeys) { passThrough = row; passed += 1; return }
              heap = new java.util.PriorityQueue[InternalRow](limit, heapOrd)
              heaps.put(key.copy(), heap)
            }
            if (heap.size() < limit) heap.add(row.copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy()); pruned += 1
            } else pruned += 1
          }
        }

        override def hasNext: Boolean = {
          if (passThrough != null) return true
          pump()
          if (passThrough != null) return true
          if (flush == null) flush = heaps.values().iterator()
          while ((flushCur == null || !flushCur.hasNext) && flush.hasNext) {
            flushCur = flush.next().iterator()
          }
          flushCur != null && flushCur.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          outRows += 1
          if (passThrough != null) { val r = passThrough; passThrough = null; r }
          else flushCur.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Post-shuffle finish: requires clustering on the keys and a
  * (keys, order) sort — Spark's EnsureRequirements inserts the exchange
  * and a spillable sort of the pruned survivors. One streaming pass
  * emits ranks 1..k per key group and appends the `rn` column under the
  * rewrite's original exprId.
  */
final case class TopKPerKeyFinalExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def groupOrder: Seq[SortOrder] =
    partitionExprs.map(SortOrder(_, Ascending)) ++ order

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs, requireAllClusterKeys = false, None) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(groupOrder)
  override def outputOrdering: Seq[SortOrder] = groupOrder

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = partitionExprs
    val limit = k
    val childOutput = child.output
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rnRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var curKey: UnsafeRow = null
      var rank = 0
      iter.flatMap { row =>
        val key = keyProj(row)
        if (curKey == null || key != curKey) { curKey = key.copy(); rank = 1 } else rank += 1
        if (rank <= limit) {
          rnRow.setInt(0, rank)
          outRows += 1
          Some(outProj(joined(row, rnRow)): InternalRow)
        } else None
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
