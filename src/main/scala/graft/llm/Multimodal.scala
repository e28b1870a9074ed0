package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * partition-wise batch transform (`mapPartitions` over a typed Dataset
  * — the Scala analog of `mapInPandas`: one JVM-side batch function per
  * partition, arbitrary library calls inside, schema declared up
  * front).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decode; the Spark-side plumbing —
  * schema, batching, partition distribution, output contract — is real
  * and is what the tests cover. A production build swaps `decodeStub`
  * for a real codec without touching the plan shape.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      features: Array[Double])

  /** Build the media table: binary payload column + metadata. (The
    * fixtures carry no real media, so text bytes stand in as payload.) */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("media"))

  /** Metadata projection — pure relational ops over the binary column. */
  def mediaMeta(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .select(col("doc_id"), col("mime"), length(col("media")).as("n_bytes"))
      .orderBy("doc_id")

  // ====================================================================
  // STUB: fake media decode. A real implementation would parse the
  // codec here (e.g. JPEG -> pixels). Deterministic so tests can assert
  // exact outputs; byte-driven so the data dependency is honest.
  // ====================================================================
  private[llm] def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val checksumLen = 8
    val w = 16 + (math.abs(bytes.length) % 64)            // fake "width"
    val h = 16 + (math.abs(bytes.map(_.toInt).sum) % 64)  // fake "height"
    val feats = Array.tabulate(checksumLen) { i =>
      var acc = 0L
      var j = i
      while (j < bytes.length) { acc += (bytes(j) & 0xff); j += checksumLen }
      acc.toDouble / math.max(bytes.length, 1)
    }
    (w, h, feats)
  }

  /** Partition-wise feature extraction over the media column. */
  def extractFeatures(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(documents).as[MediaRow].mapPartitions { rows =>
      // per-partition setup would open the codec once here
      rows.map { r =>
        val (w, h, feats) = decodeStub(r.media)
        MediaFeatures(
          r.doc_id,
          r.media.length,
          graft.functions.HashExprs.fnv1a64Bytes(r.media, 0, r.media.length),
          w, h, feats)
      }
    }
  }

  def mediaFeaturesQuery(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(spark, documents).toDF().orderBy("doc_id")

  // ====================================================================
  // STUB: fake resize — a real implementation decodes, bilinear-scales
  // to (w, h), re-encodes. The fake keeps the data dependency honest by
  // sampling the payload down to w*h bytes deterministically.
  // ====================================================================
  private[llm] def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(w * h, 1)
    if (bytes.isEmpty) new Array[Byte](0)
    else Array.tabulate(math.min(n, bytes.length))(i =>
      bytes((i.toLong * bytes.length / math.min(n, bytes.length)).toInt % bytes.length))
  }

  case class ResizedMedia(doc_id: Long, mime: String, width: Int, height: Int,
                          media: Array[Byte])

  /** Resize pipeline stage: same partition-wise batch shape as decode;
    * output stays an opaque binary column + typed size metadata, so
    * every downstream relational op treats it like any other column. */
  def resize(spark: SparkSession, documents: DataFrame, w: Int = 64, h: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    mediaTable(documents).as[MediaRow].mapPartitions { rows =>
      rows.map(r => ResizedMedia(r.doc_id, r.mime, w, h, resizeStub(r.media, w, h)))
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Frame-sampling stage for video-like payloads: split the payload
    * into fixed-size "frames", emit every strideth frame as its own row
    * (one-to-many — the explode/Generator shape, done partition-wise so
    * a real codec could seek rather than materialize). */
  def frameSample(spark: SparkSession, documents: DataFrame,
                  frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(documents).as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = math.max(r.media.length / frameBytes, 0)
        (0 until nFrames by stride).iterator.map { f =>
          val off = f * frameBytes
          val len = math.min(frameBytes, r.media.length - off)
          Frame(r.doc_id, f, len,
            graft.functions.HashExprs.fnv1a64Bytes(r.media, off, len))
        }
      }
    }
  }

  def frameSampleQuery(spark: SparkSession, documents: DataFrame): DataFrame =
    frameSample(spark, documents).toDF().orderBy("doc_id", "frame_idx")
}
