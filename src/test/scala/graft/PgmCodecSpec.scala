package graft

import graft.llm.Multimodal

/** The real PGM (Netpbm P5) encode/parse path behind q_media_decode. */
class PgmCodecSpec extends SparkTestBase {

  test("encode -> decode round-trips dimensions and every pixel") {
    (0L to 40L).foreach { id =>
      val img = Multimodal.decodePgm(Multimodal.pgmFor(id))
        .getOrElse(fail(s"doc $id did not parse"))
      assert(img.width == 8 + id % 9)
      assert(img.height == 8 + id % 7)
      assert(img.maxVal == 255)
      img.pixels.zipWithIndex.foreach { case (p, i) =>
        assert((p & 0xff) == ((id * 31 + i * 7) % 256).toInt, s"doc $id pixel $i")
      }
    }
  }

  test("parser handles comments and arbitrary header whitespace") {
    val pixels = Array.tabulate(6)(i => (i * 10).toByte)
    val bytes = ("P5 # inline\n# a full comment line\n  3\t2 \n255\n").getBytes("US-ASCII") ++ pixels
    val img = Multimodal.decodePgm(bytes).getOrElse(fail("did not parse"))
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == pixels.toSeq)
  }

  test("malformed inputs degrade to None, never throw") {
    val good = Multimodal.pgmFor(5L)
    assert(Multimodal.decodePgm("P6\n2 2\n255\n1234".getBytes("US-ASCII")).isEmpty, "wrong magic")
    assert(Multimodal.decodePgm(good.dropRight(1)).isEmpty, "truncated raster")
    assert(Multimodal.decodePgm("P5\n2 2\n999\n".getBytes("US-ASCII") ++ Array[Byte](1,2,3,4)).isEmpty,
      "16-bit maxval unsupported -> None")
    assert(Multimodal.decodePgm(Array[Byte]()).isEmpty, "empty blob")
    assert(Multimodal.decodePgm("P5\nnot numbers\n".getBytes("US-ASCII")).isEmpty, "garbage header")
  }

  test("pgmStats computes stats from the DECODED raster on the fixture") {
    val rows = Multimodal.pgmStats(spark, Tables.documents(spark, sf)).collect()
    assert(rows.length == 500)
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val w = 8 + id % 9; val h = 8 + id % 7
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val expectedSum = (0L until w * h).map(i => (id * 31 + i * 7) % 256).sum
      assert(r.getLong(4) == expectedSum, s"doc $id")
    }
  }
}
