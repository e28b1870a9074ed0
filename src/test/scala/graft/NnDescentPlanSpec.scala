package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.NnDescent
import graft.plans.PlanProbe

/** Optimization-round pins for the NN-descent dataflow restructure
  * (round 18): every refinement round and every beam-search round runs
  * ONE shuffle exchange of the candidate table — the partition-by-src
  * (resp. query_id) established once carries the dedup, the vector
  * joins and the TopKPerKey window. The byte-stability and recall
  * pins in AnnIndexSpec prove the restructure computes the SAME graph;
  * this suite pins that it computes it with the claimed plan shape. */
class NnDescentPlanSpec extends SparkTestBase {

  private def capture(label: String)(run: => Unit): DataFrame = {
    var got: Option[DataFrame] = None
    graft.ops.PlanDump.sink = Some((l, df) => if (l == label && got.isEmpty) got = Some(df))
    try run finally graft.ops.PlanDump.sink = None
    got.getOrElse(fail(s"PlanDump never saw label '$label'"))
  }

  test("nn-descent build round: one exchange, broadcast joins, in-partition dedup+topk") {
    val emb = Tables.embeddings(spark, sf)
    val dir = tmpDir("graft_nnd_plan_")
    val round = capture("nnd_build_round") { NnDescent.buildGraph(emb, dir) }
    // run the captured round plan (AQE-final) and probe it
    round.write.format("noop").mode("overwrite").save()
    val shuffles = PlanProbe.shuffles(round)
    assert(shuffles.size == 1,
      s"build round should exchange once (the repartition by src), got ${shuffles.size}:\n" +
        round.queryExecution.executedPlan)
    // vector attach + neighbor expansion are broadcast joins at this
    // scale (the size bound fits the threshold) — no SMJ legs
    val smj = PlanProbe.deepCollect(round.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, s"no sort-merge join expected in a build round:\n${smj.mkString("\n")}")
  }

  test("nn-descent search round: one exchange, anti-join rides the query_id partitioning") {
    val emb = Tables.embeddings(spark, sf)
    val dir = NnDescent.graphDir(spark, sf, emb)
    val round = capture("nnd_search_round") {
      NnDescent.searchGraph(emb, dir, col("vec_id") % 50 === 7).collect(): Unit
    }
    round.write.format("noop").mode("overwrite").save()
    val shuffles = PlanProbe.shuffles(round)
    assert(shuffles.size <= 1,
      s"search round should exchange at most once (the beam window's TopK exchange), got ${shuffles.size}:\n" +
        round.queryExecution.executedPlan)
  }
}
