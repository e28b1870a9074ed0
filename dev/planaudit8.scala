// :load from sbt console — round-8 plan audit for the new operators
val spark = { val b = org.apache.spark.sql.SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false"); b.withExtensions(new graft.GraftExtensions).getOrCreate() }
spark.sparkContext.setLogLevel("ERROR")
val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = { df.write.format("noop").mode("overwrite").save(); val p = df.queryExecution.executedPlan.toString; println(s"$name: bcastJoin=${"BroadcastHashJoin".r.findAllIn(p).length} smj=${"SortMergeJoin".r.findAllIn(p).length} shj=${"ShuffledHashJoin".r.findAllIn(p).length} nlj=${"NestedLoop".r.findAllIn(p).length} exch=${"Exchange hash".r.findAllIn(p).length} codegenSpans=${"WholeStageCodegen".r.findAllIn(p).length}") }
audit("bigram", graft.llm.TextOps.bigramLogProb(docs))
audit("subapply", graft.llm.Dedup.substringDedupApply(docs))
audit("cdc", graft.llm.Curation.chunkCdc(docs))
audit("bpe_apply", graft.llm.Bpe.applyBpe(docs))
