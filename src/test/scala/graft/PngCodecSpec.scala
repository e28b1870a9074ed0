package graft

import graft.llm.Multimodal

/** The real PNG (javax.imageio) encode/decode path behind
  * q_media_features / q_media_resize / q_media_frames. */
class PngCodecSpec extends SparkTestBase {

  test("the JDK registers a PNG reader (the premise of the codec tier)") {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    assert(readers.hasNext, "no PNG ImageReader registered")
  }

  test("encode -> ImageIO decode round-trips dimensions and every pixel") {
    (0L to 40L).foreach { id =>
      val img = Multimodal.decodeImage(Multimodal.pngFor(id))
        .getOrElse(fail(s"doc $id did not decode"))
      val (w, h) = Multimodal.pngDims(id)
      assert(img.getWidth == w && img.getHeight == h)
      var i = 0
      while (i < w * h) {
        val got = img.getRaster.getSample(i % w, i / w, 0)
        assert(got == ((id * 31 + i * 7) % 256).toInt, s"doc $id pixel $i")
        i += 1
      }
    }
  }

  test("undecodable blobs degrade to None, never throw") {
    assert(Multimodal.decodeImage(Array[Byte]()).isEmpty, "empty blob")
    assert(Multimodal.decodeImage("not an image at all".getBytes("US-ASCII")).isEmpty, "text blob")
    val truncated = Multimodal.pngFor(3L).take(20)
    assert(Multimodal.decodeImage(truncated).isEmpty, "truncated PNG")
  }

  test("nearest-neighbor resize matches the integer-division source mapping") {
    val id = 7L
    val (sw, sh) = Multimodal.pngDims(id)
    val thumbs = Multimodal.resize(spark, Tables.documents(spark, sf).filter(s"doc_id = $id"), 8, 8)
      .collect()
    assert(thumbs.length == 1)
    val img = Multimodal.decodeImage(thumbs.head.media).getOrElse(fail("thumb undecodable"))
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val srcIdx = (y * sh / 8) * sw + (x * sw / 8)
        val expected = ((id * 31 + srcIdx * 7) % 256).toInt
        assert(img.getRaster.getSample(x, y, 0) == expected, s"thumb pixel ($x,$y)")
      }
    }
  }

  test("dHash: banded candidate join equals all-pairs popcount (pigeonhole theorem)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val hashes = Multimodal.imageDHash(spark, docs).toDF()
    val a = hashes.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = hashes.select(col("doc_id").as("doc_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).as("dist"))
      .filter(col("dist") <= 2).orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val banded = Multimodal.dhashNearDupPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(banded == brute)
    assert(banded.nonEmpty, "fixture images must yield near-dup pairs")
    assert(banded.forall(p => p._1 < p._2 && p._3 <= 2))
  }

  test("dHash recomputes by hand from adjacent comparisons of the decoded raster") {
    // the hash is a pure function of adjacent-pixel comparisons of
    // the DECODED raster (gradients cancel global brightness — why
    // dHash is a perceptual hash); recompute one id by hand
    val id = 7L
    val img = Multimodal.decodeImage(Multimodal.pngFor(id)).get
    val (sw, sh) = (img.getWidth, img.getHeight)
    def px(r: Int, c: Int): Int =
      img.getRaster.getSample(c * sw / 9, r * sh / 8, 0)
    val bands = new Array[Int](4)
    for (r <- 0 until 8; c <- 0 until 8)
      if (px(r, c) < px(r, c + 1)) {
        val bit = r * 8 + c
        bands(bit / 16) |= 1 << (bit % 16)
      }
    val row = Multimodal.imageDHash(spark, Tables.documents(spark, sf))
      .filter(_.doc_id == id).collect().head
    assert((row.b0, row.b1, row.b2, row.b3) == (bands(0), bands(1), bands(2), bands(3)))
  }

  test("dHash table is a memoized artifact: second near-dup call re-decodes nothing") {
    val docs = Tables.documents(spark, sf)
    val d1 = Multimodal.dhashDir(spark, docs)
    def files = new java.io.File(s"$d1/hashes").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getPath, f.lastModified())).sorted.toSeq
    val before = files
    assert(before.nonEmpty)
    Multimodal.dhashNearDupPairs(spark, docs).collect()
    assert(Multimodal.dhashDir(spark, docs) == d1,
      "same session + corpus plan must reuse the hash artifact")
    assert(files == before, "a second pass must not re-decode/rewrite the hashes")
  }
}
