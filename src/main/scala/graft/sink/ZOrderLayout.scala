package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.VectorFns

/** Z-ordered (Morton) data layout — the lakehouse answer to the
  * reference's secondary index on a non-key column
  * (`cassandra/init.cql:81-82`): instead of a second index structure,
  * lay the rows out so parquet row-group min/max statistics prune scans
  * filtered on EITHER dimension.
  *
  * Write path: z = interleave(bits(user_id), bits(hour(ts))), then
  * range-partition + sort by z — each output file covers a compact
  * rectangle of (device, hour) space. At cluster scale the same two
  * lines run unchanged; files per write scale with the data, and the
  * Morton curve keeps BOTH filter classes (per-device scans, per-hour
  * scans) at O(matching row groups) instead of O(table).
  */
object ZOrderLayout {

  /** Events' two query dimensions: device key and event-time hour. */
  private def hourCol: org.apache.spark.sql.Column =
    expr("unix_micros(cast(ts as timestamp)) div 3600000000").cast(LongType)

  /** Write `events` in Z-order across `files` parquet files (one row
    * group each at fixture scale — file stats ARE row-group stats).
    *
    * The Morton key interleaves EQUALIZED 8-bit bucket indices, not raw
    * values: raw interleave degenerates to a single-column sort when
    * one dimension spans more varying bits than the other (e.g. a
    * 9-bit hour range vs a 4-bit device range turns "z-order" into a
    * plain time sort). Each dimension is linearly scaled to 0..255 by
    * its own min/max — one tiny min/max aggregate (4 longs to the
    * driver), same trick as the range-bucketed z-order in lakehouse
    * table formats, and it runs unchanged at cluster scale. */
  def writeZOrdered(events: DataFrame, dir: String, files: Int = 16): Unit = {
    val keyed = events.withColumn("__h", hourCol)
    val Array(uMin, uMax, hMin, hMax) =
      keyed.agg(min(col("user_id")).cast(LongType), max(col("user_id")).cast(LongType),
          min(col("__h")), max(col("__h")))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    def scale(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else (c.cast(LongType) - lit(lo)) * 255L / lit(hi - lo)
    keyed
      .withColumn("__z", VectorFns.zorder2(
        scale(col("user_id"), uMin, uMax).cast(LongType),
        scale(col("__h"), hMin, hMax).cast(LongType)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__h")
      .write.mode("overwrite").parquet(dir)
  }

  /** Read back with a single-dimension predicate — the layout, not a
    * secondary index, keeps this cheap. */
  def readFiltered(spark: SparkSession, dir: String, deviceKey: Int): DataFrame =
    spark.read.parquet(dir)
      .filter(col("user_id") === deviceKey)
      .orderBy("event_id")

  /** Row-group pruning evidence from parquet footers: the fraction of
    * row groups whose [min,max] for `column` overlaps `lo..hi`. A
    * Z-ordered layout keeps this small for BOTH dimensions; a
    * single-column sort keeps it small for one and ~1.0 for the other. */
  def overlapFraction(dir: String, column: String, lo: Long, hi: Long): Double = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    var total = 0
    var overlapping = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        total += 1
        block.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .foreach { c =>
            val stats = c.getStatistics
            val mn = stats.genericGetMin.asInstanceOf[Number].longValue()
            val mx = stats.genericGetMax.asInstanceOf[Number].longValue()
            if (mx >= lo && mn <= hi) overlapping += 1
          }
      } finally reader.close()
    }
    require(total > 0, s"no parquet row groups under $dir")
    overlapping.toDouble / total
  }
}
