// :load from sbt console — round-10 batch-2 plan audit.
val spark = { val b = org.apache.spark.sql.SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false"); b.withExtensions(new graft.GraftExtensions).getOrCreate() }
spark.sparkContext.setLogLevel("ERROR")
val sf = "/root/testdata/sf0.01"
def audit(name: String): Unit = { try { val df = graft.SparkEntry.queries(name)(spark, sf); df.write.format("noop").mode("overwrite").save(); val p = df.queryExecution.executedPlan.toString; println(s"$name: bcastJoin=${"BroadcastHashJoin".r.findAllIn(p).length} bnlj=${"BroadcastNestedLoopJoin".r.findAllIn(p).length} smj=${"SortMergeJoin".r.findAllIn(p).length} shj=${"ShuffledHashJoin".r.findAllIn(p).length} cart=${"CartesianProduct".r.findAllIn(p).length} exch=${"Exchange hashpartitioning".r.findAllIn(p).length} range=${"Exchange rangepartitioning".r.findAllIn(p).length} topk=${"TopKPerKey".r.findAllIn(p).length}") } catch { case e: Throwable => println(s"$name AUDIT-FAIL: $e") } }
audit("q_media_dhash")
audit("q_sample_weighted")
audit("q_snapshot_diff")
audit("q_fuzzy_join2")
audit("q_pmi")
audit("q_manifest_publish")
audit("q_bm25_append")
