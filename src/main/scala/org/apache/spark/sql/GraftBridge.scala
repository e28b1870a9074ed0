package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversion for the
  * graft engine's custom Catalyst expressions (Spark 4 moved Column to a
  * ColumnNode representation; `classic.ExpressionUtils` is the supported
  * conversion point but is sql-package-private). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (classic.Dataset.ofRows
    * is sql-package-private) — the entry point for custom logical
    * nodes constructed by the library API rather than the optimizer
    * rewrite. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (to compose custom nodes
    * on top of resolved children). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Mark ONE leaf relation of a batch DataFrame `isStreaming = true` —
    * the contract MicroBatchExecution asserts on every v1
    * `Source.getBatch` result (the engine splices the batch plan into
    * the streaming query; `isStreaming` propagates up from any leaf).
    * FileStreamSource does the same with its per-batch file list.
    *
    * Deliberately ONE leaf, not all: a getBatch plan that contains a
    * join (the change-feed diff) must not present BOTH join sides as
    * streaming, or IncrementalExecution's StreamingJoinStrategy would
    * claim the join and demand watermark/state machinery the
    * already-materialized per-batch diff neither has nor needs — with
    * a single marked leaf the top-level flag holds and every join
    * stays batch-planned. `LogicalRelation`/`LocalRelation` are
    * sql-internal, hence bridged here. */
  def asStreamingScan(spark: SparkSession, df: DataFrame): DataFrame = {
    var marked = false
    val plan = analyzed(df).transform {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if !marked =>
        marked = true
        lr.copy(isStreaming = true)
      case loc: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if !marked =>
        marked = true
        loc.copy(isStreaming = true)
    }
    ofRows(spark, plan)
  }

  /** Rebase a v1 `Sink.addBatch` micro-batch DataFrame onto its
    * already-planned physical RDD as a plain BATCH frame — the same
    * move FileStreamSink makes: re-planning `data` in a fresh query
    * would re-execute the incremental plan (or refuse outright on a
    * streaming leaf), while the RDD is the batch's materialized rows. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val qe = df.asInstanceOf[classic.Dataset[Row]].queryExecution
    cs.internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = false)
  }

  /** The session's live autoBroadcastJoinThreshold in bytes (-1 =
    * disabled) — for operators that pick a join strategy from a size
    * bound the PLANNER cannot know (e.g. an iteratively-built edge
    * table bounded by k rows per node), so the decision stays
    * scale-adaptive instead of a hard-coded hint. */
  def autoBroadcastThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf.autoBroadcastJoinThreshold

  /** Register a temp SQL function on a live session (the
    * SparkSessionExtensions path only applies at session build time;
    * this covers already-built sessions and tests). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
