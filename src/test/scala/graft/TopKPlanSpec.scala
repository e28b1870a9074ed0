package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKeyFinalExec, TopKPerKeyNode, TopKPerKeyPartialExec}
import graft.query.ReadPath

/** The custom whole-operator top-k path: logical rewrite fires, the
  * physical pair replaces Sort+WindowGroupLimit+Window+Filter, and the
  * results are bit-identical to the window idiom's semantics. */
class TopKPlanSpec extends SparkTestBase {

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** AQE wraps finished stages in leaf QueryStageExec nodes; flatten
    * through them so plan-shape asserts see the whole physical tree. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan :: Nil
      case a: AdaptiveSparkPlanExec => a.executedPlan :: Nil
      case _ => Nil
    }
    p +: (p.children ++ through).flatMap(flatten)
  }

  private def topkEvents(k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id"))
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** NTZ ts column comes back as LocalDateTime; flatten to micros. */
  private def tsMicros(r: org.apache.spark.sql.Row, i: Int): Long = {
    val t = r.getAs[java.time.LocalDateTime](i)
    t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
  }

  test("rewrite replaces Filter+Window with TopKPerKey and results match the window semantics") {
    val df = topkEvents(5)
    assert(df.queryExecution.optimizedPlan.collect { case n: TopKPerKeyNode => n }.nonEmpty,
      s"TopKRewrite did not fire:\n${df.queryExecution.optimizedPlan}")
    val nodes = flatten(executed(df))
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyFinalExec]), s"no final exec:\n${nodes.head}")
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyPartialExec]), s"no partial exec:\n${nodes.head}")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"WindowExec should be gone:\n${nodes.head}")

    // Expected top-5 per user computed independently on the driver.
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id")).collect().toSeq
    val expected = rows.groupBy(_.getLong(2)).flatMap { case (uid, rs) =>
      rs.sortBy(r => (-tsMicros(r, 1), r.getLong(0))).take(5).zipWithIndex
        .map { case (r, i) => (r.getLong(0), uid, i + 1) }
    }.toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("exactly one shuffle: the partial runs before the exchange") {
    val nodes = flatten(executed(topkEvents(5)))
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.size == 1, s"expected exactly one exchange:\n${nodes.head}")
    // The partial must sit BELOW the exchange (pre-shuffle prune).
    val partialBelowExchange = flatten(exchanges.head)
      .exists(_.isInstanceOf[TopKPerKeyPartialExec])
    assert(partialBelowExchange, s"partial must be below the exchange:\n${nodes.head}")
  }

  test("rn = 1 keep-first pattern rewrites with a residual equality") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val df = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    assert(df.queryExecution.optimizedPlan.collect { case n: TopKPerKeyNode => n }.nonEmpty,
      s"equality pattern did not rewrite:\n${df.queryExecution.optimizedPlan}")
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id")).collect().toSeq
    val expected = rows.groupBy(_.getLong(2)).map { case (_, rs) =>
      rs.maxBy(r => (tsMicros(r, 1), r.getLong(0))).getLong(0)
    }.toSet
    assert(df.collect().map(_.getLong(0)).toSet == expected)
  }

  test("non-rank conjuncts survive as a residual filter above the operator") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("event_id") % 2 === 0)
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case n: TopKPerKeyNode => n }.nonEmpty, s"$opt")
    // Residual semantics: top-3 per key FIRST, then the parity filter.
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id")).collect().toSeq
    val expected = rows.groupBy(_.getLong(2)).flatMap { case (_, rs) =>
      rs.sortBy(r => (-tsMicros(r, 1), r.getLong(0))).take(3)
    }.map(_.getLong(0)).filter(_ % 2 == 0).toSet
    assert(df.collect().map(_.getLong(0)).toSet == expected)
  }

  test("global top-k (empty PARTITION BY) is left to TakeOrdered, not rewritten") {
    val w = Window.orderBy(col("ts").desc, col("event_id"))
    val df = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
    assert(df.queryExecution.optimizedPlan.collect { case n: TopKPerKeyNode => n }.isEmpty)
    assert(df.count() == 5)
  }

  test("partial heap prunes to k rows per key per partition; pass-through fallback stays correct") {
    import spark.implicits._
    val base = (1 to 1000).map(i => (i % 7, i)).toDF("k", "v").repartition(2)
    val child = base.queryExecution.sparkPlan
    val out = child.output
    val order = Seq(SortOrder(out(1), Ascending))

    // Normal mode: <= 3 rows per key per partition survive.
    val partial = TopKPerKeyPartialExec(Seq(out.head), order, 3, 1 << 20, child)
    val kept = partial.execute().map(_.copy()).collect()
    assert(kept.length <= 7 * 3 * 2, s"partial kept ${kept.length} rows")
    // Every global top-3 row must survive the partial (prune soundness).
    val globalTop = (1 to 1000).map(i => (i % 7, i)).groupBy(_._1)
      .flatMap { case (_, vs) => vs.map(_._2).sorted.take(3) }.toSet
    val keptVs = kept.map(_.getInt(1)).toSet
    assert(globalTop.subsetOf(keptVs), s"prune dropped a global top-3 row")

    // Degraded mode (maxBufferedKeys = 1): still sound, just less pruning.
    val degraded = TopKPerKeyPartialExec(Seq(out.head), order, 3, 1, child)
    val keptD = degraded.execute().map(_.copy()).collect().map(_.getInt(1)).toSet
    assert(globalTop.subsetOf(keptD))
  }

  test("direct TopK.perKey API builds the node without the rewrite and matches the window idiom") {
    val direct = graft.plans.TopK.perKey(
      Tables.events(spark, sf).select(col("event_id"), col("ts"), col("user_id")),
      Seq("user_id"), Seq(col("ts").desc, col("event_id")), 5)
    assert(direct.queryExecution.optimizedPlan.collect { case n: TopKPerKeyNode => n }.nonEmpty)
    val got = direct.collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    val viaWindow = topkEvents(5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(got == viaWindow)
    // Unknown columns fail fast with a readable message.
    intercept[IllegalArgumentException] {
      graft.plans.TopK.perKey(Tables.events(spark, sf), Seq("nope"), Seq(col("ts")), 3)
    }
  }

  test("registered q_topk_exec matches the plain-window computation row for row") {
    val viaOperator = Registry.defs("q_topk_exec").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getInt(5))).toList
    assert(viaOperator.nonEmpty)
    val nodes = flatten(executed(ReadPath.topkByType(Tables.events(spark, sf))))
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyFinalExec]), s"${nodes.head}")
  }

  test("batch ANN per-query top-k plans through TopKPerKey (no WindowExec)") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") % 50 === 0)
    for (df <- Seq(graft.llm.Similarity.annBatchTopK(e, q),
                   graft.llm.Similarity.batchTopKExact(e, q))) {
      val nodes = flatten(executed(df))
      assert(nodes.exists(_.isInstanceOf[TopKPerKeyFinalExec]),
        s"batch top-k lost the heap operator:\n${nodes.head}")
      assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
        s"WindowExec should be rewritten away:\n${nodes.head}")
    }
  }
}
