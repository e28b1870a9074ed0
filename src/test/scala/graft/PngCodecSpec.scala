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
}
