package graft

import graft.llm.Multimodal

/** The real WAV/PCM (javax.sound.sampled) encode/decode path behind
  * q_media_audio. */
class WavCodecSpec extends SparkTestBase {

  test("encode -> decode round-trips format and every 16-bit sample") {
    (0L to 40L).foreach { id =>
      val audio = Multimodal.decodeWav(Multimodal.wavFor(id))
        .getOrElse(fail(s"doc $id did not decode"))
      assert(audio.sampleRate == 8000f)
      assert(audio.channels == 1)
      assert(audio.samples.length == 64 + id % 33)
      audio.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == Multimodal.wavSample(id, i), s"doc $id sample $i")
      }
    }
  }

  test("the container really is RIFF/WAVE and decode reads the header, not the formula") {
    val bytes = Multimodal.wavFor(7L)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    // flipping one PCM byte must change the decoded samples — the
    // decoder is on the hook for the actual payload
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x40).toByte
    val a = Multimodal.decodeWav(bytes).get.samples
    val b = Multimodal.decodeWav(corrupt).get.samples
    assert(!a.sameElements(b))
  }

  test("malformed inputs degrade to None, never throw") {
    assert(Multimodal.decodeWav(Array[Byte]()).isEmpty, "empty blob")
    assert(Multimodal.decodeWav("not audio at all".getBytes("US-ASCII")).isEmpty,
      "garbage bytes")
    assert(Multimodal.decodeWav(Multimodal.pgmFor(3L)).isEmpty,
      "PGM bytes are not a RIFF container")
  }

  test("resample decimates through a real re-encode/re-decode round trip") {
    val rows = Multimodal.audioResampleQuery(spark, Tables.documents(spark, sf))
      .collect()
    assert(rows.length == 500)
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id % 33).toInt
      val kept = (0 until n).filter(_ % 4 == 0).map(i => Multimodal.wavSample(id, i))
      assert(r.getInt(1) == 2000, s"doc $id resampled rate")
      assert(r.getInt(2) == kept.length, s"doc $id resampled count")
      assert(r.getLong(3) == kept.map(s => math.abs(s).toLong).sum, s"doc $id abs_sum")
      assert(r.getLong(4) == kept.map(s => math.abs(s).toLong).max, s"doc $id peak")
    }
  }

  test("audioFeatures computes stats from the DECODED samples on the fixture") {
    val rows = Multimodal.audioFeatures(spark, Tables.documents(spark, sf)).collect()
    assert(rows.length == 500)
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id % 33).toInt
      val samples = (0 until n).map(i => Multimodal.wavSample(id, i))
      assert(r.getInt(1) == n)
      assert(r.getInt(2) == 8000 && r.getInt(3) == 1)
      assert(r.getLong(4) == samples.map(s => math.abs(s).toLong).sum, s"doc $id abs_sum")
      assert(r.getLong(5) == samples.map(s => math.abs(s).toLong).max, s"doc $id peak")
      val zc = (1 until n).count(i => samples(i).toLong * samples(i - 1) < 0)
      assert(r.getLong(6) == zc.toLong, s"doc $id zero_crossings")
    }
  }
}
