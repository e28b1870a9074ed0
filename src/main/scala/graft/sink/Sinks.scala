package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink abstraction (SURVEY.md §2.1 S6/S7): the reference writes each
  * micro-batch through the Cassandra connector with a per-table
  * consistency level (`src/spark_consumer.py:147-153,197-203`). Offline,
  * the same Catalyst write plan lands in partitioned parquet laid out
  * like the Cassandra tables; in production the trait is implemented by
  * the connector and `consistencyLevel` becomes
  * `spark.cassandra.output.consistency.level`.
  */
trait Sink {
  def name: String
  /** Carried as metadata; a file sink has no quorum semantics. */
  def consistencyLevel: String
  def write(batch: DataFrame, batchId: Long): Unit
}

object Sinks {
  /** Write-then-read demo of the sink layout: events land bucketed +
    * clustered, and the read back routes to ONE bucket partition via
    * the derived bucket predicate — the engine analog of Cassandra
    * partition-key routing (`docs/baseline-architecture.md:106-108`). */
  def layoutRoundTrip(spark: org.apache.spark.sql.SparkSession, events: DataFrame,
                      path: String, probeKey: Int, buckets: Int = 8): DataFrame = {
    val dir = new java.io.File(path)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    val sink = new PartitionedParquetSink(path, "events_demo", "ONE", "user_id", "ts", buckets)
    sink.write(events, 0L)
    spark.read.parquet(path)
      // partition pruning: the probe key hashes with LONG width to
      // match the written column type (Murmur3 is type-width-sensitive)
      .filter(pmod(hash(lit(probeKey.toLong)), lit(buckets)) === col("bucket"))
      .filter(col("user_id") === probeKey)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }
}

/** Cassandra-table analog on files: hash-bucketed by entity key (NOT
  * one directory per device — 100k devices x dirs would melt the
  * namenode exactly like unbounded Cassandra partitions melt a node,
  * SURVEY.md §7), sorted within partitions by the clustering column
  * so per-device time scans are sequential.
  */
final class PartitionedParquetSink(
    path: String,
    override val name: String,
    override val consistencyLevel: String,
    keyCol: String,
    clusterCol: String,
    buckets: Int = 16)
    extends Sink {

  override def write(batch: DataFrame, batchId: Long): Unit = {
    // Empty-batch guard: the reference calls batch_df.count() twice —
    // recomputing the batch (`src/spark_consumer.py:139,154`); isEmpty
    // touches at most one partition.
    if (!batch.isEmpty) {
      batch
        .withColumn("bucket", pmod(hash(col(keyCol)), lit(buckets)))
        .repartition(col("bucket"))
        .sortWithinPartitions(col(keyCol), col(clusterCol).desc)
        .write
        .mode("append")
        .partitionBy("bucket")
        .parquet(path)
    }
  }
}
