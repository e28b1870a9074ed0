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
  * Two codec tiers:
  *  - REAL: binary PGM (Netpbm P5) encode + parse, pure JVM — see
  *    `pgmFor`/`decodePgm`/`pgmStats` (q_media_decode). The DuckDB
  *    oracle recomputes pixel stats from the generating formula, so
  *    the parser is genuinely on the hook.
  *  - STUB: JPEG/audio-class codecs are absent from this container, so
  *    `decodeStub`/`resizeStub` are clearly-marked deterministic fakes;
  *    the Spark-side plumbing — schema, batching, partition
  *    distribution, output contract — is real and is what the tests
  *    cover. A production build swaps the stub for the codec call
  *    without touching the plan shape (exactly as `pgmStats` does).
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

  // ====================================================================
  // REAL codec path: binary PGM (Netpbm P5) — a production image format
  // simple enough to encode/decode in pure JVM, no codec libraries.
  // The engine builds actual P5 binaries (header + raw 8-bit pixels),
  // and decodePgm is a REAL parser: magic check, whitespace/comment
  // handling, maxval, raw pixel section. The oracle recomputes the
  // pixel statistics from the generating formula — if the encoder or
  // the parser mangled a single header byte or pixel offset, the
  // round-tripped stats would not match.
  // ====================================================================

  /** Deterministic pixel formula shared with the DuckDB oracle:
    * pixel(doc, i) = (doc_id*31 + i*7) % 256. */
  private[graft] def pgmFor(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val header = s"P5\n# graft synthetic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h) {
      out(header.length + i) = ((docId * 31 + i * 7) % 256).toByte
      i += 1
    }
    out
  }

  final case class Pgm(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** Parse a binary PGM (P5). Returns None for anything malformed —
    * wrong magic, truncated pixel section, oversized maxval — rather
    * than throwing, so a corrupt blob degrades to a skipped row (the
    * permissive-decode discipline the Avro path also follows). */
  private[graft] def decodePgm(bytes: Array[Byte]): Option[Pgm] = {
    var pos = 0
    def skipWs(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else in = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      if (pos == start) None
      else Some(new String(bytes, start, pos - start, "US-ASCII").toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5') return None
    pos = 2
    for {
      w <- readInt()
      h <- readInt()
      maxVal <- readInt()
      if maxVal > 0 && maxVal < 256 && w > 0 && h > 0
      // exactly ONE whitespace byte separates maxval from the raster
      if pos < bytes.length && { pos += 1; bytes.length - pos >= w * h }
    } yield Pgm(w, h, maxVal, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h))
  }

  case class PgmStats(doc_id: Long, width: Int, height: Int, n_pixels: Long,
                      pixel_sum: Long, pixel_max: Long)

  /** Real decode pipeline: build P5 binaries, parse them back, compute
    * stats from the DECODED pixels. Partition-wise like the stubs, but
    * nothing here is fake — the parser is on the hook for every value
    * the oracle checks. */
  def pgmStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.flatMap { id =>
        decodePgm(pgmFor(id)).map { img =>
          var sum = 0L
          var max = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = (img.pixels(i) & 0xff).toLong
            sum += v
            if (v > max) max = v
            i += 1
          }
          PgmStats(id, img.width, img.height, img.pixels.length.toLong, sum, max)
        }
      }
    }.toDF().orderBy("doc_id")
  }
}
