// :load from sbt console — round-10 plan audit: q_bm25 / q_rag_fusion /
// q_rag_fusion_ann (artifact-backed retrieval) + pagerank rows.
val spark = { val b = org.apache.spark.sql.SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false"); b.withExtensions(new graft.GraftExtensions).getOrCreate() }
spark.sparkContext.setLogLevel("ERROR")
val sf = "/root/testdata/sf0.01"
def audit(name: String): Unit = { val df = graft.SparkEntry.queries(name)(spark, sf); df.write.format("noop").mode("overwrite").save(); val p = df.queryExecution.executedPlan.toString; println(s"$name: bcastJoin=${"BroadcastHashJoin".r.findAllIn(p).length} bnlj=${"BroadcastNestedLoopJoin".r.findAllIn(p).length} smj=${"SortMergeJoin".r.findAllIn(p).length} shj=${"ShuffledHashJoin".r.findAllIn(p).length} cart=${"CartesianProduct".r.findAllIn(p).length} exch=${"Exchange hashpartitioning".r.findAllIn(p).length} range=${"Exchange rangepartitioning".r.findAllIn(p).length} topk=${"TopKPerKey".r.findAllIn(p).length} codegenSpans=${"WholeStageCodegen".r.findAllIn(p).length}") }
def full(name: String): Unit = { val df = graft.SparkEntry.queries(name)(spark, sf); df.write.format("noop").mode("overwrite").save(); println(s"\n========== $name ==========\n" + df.queryExecution.executedPlan.toString) }
audit("q_bm25")
audit("q_rag_fusion")
audit("q_rag_fusion_ann")
audit("q_pagerank_links")
audit("q_stream_ann_ingest")
audit("q_triangles")
audit("q_fuzzy_join")
audit("q_phrase_search")
full("q_bm25")
full("q_triangles")
full("q_fuzzy_join")
full("q_phrase_search")
