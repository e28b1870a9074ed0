package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{HashExprs, NgramHash, Winnow}
import graft.llm.Dedup

/** Property-based invariants (SURVEY.md §5 item 4) via deterministic
  * scalacheck Gen sampling (scalatestplus isn't on the offline
  * classpath, so sampling is driven manually with fixed seeds). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val word = Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, word))

  test("fnv1a64 is deterministic and distinct-on-suffix-flip") {
    forSamples(word, 50) { w =>
      assert(HashExprs.fnv1a64(w) == HashExprs.fnv1a64(w))
      assert(HashExprs.fnv1a64(w + "a") != HashExprs.fnv1a64(w + "b"))
    }
  }

  test("shingle hash sets: size bounds, sortedness, non-emptiness") {
    forSamples(doc, 50) { words =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        words.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      val hs = NgramHash.hashSet(arr, 3)
      val expected = if (words.isEmpty) 0 else math.max(words.length - 2, 1)
      assert(hs.length <= expected)          // distinct can only shrink
      assert(hs.sameElements(hs.sorted))     // sorted contract
      assert(words.isEmpty || hs.nonEmpty)
    }
  }

  test("simhash hamming distance is a pseudo-metric under token-set identity") {
    forSamples(Gen.zip(doc, doc), 50) { case (a, b) =>
      val ha = HashExprs.simhash64(a.iterator)
      val hb = HashExprs.simhash64(b.iterator)
      assert(HashExprs.hamming64(ha, ha) == 0)
      assert(HashExprs.hamming64(ha, hb) == HashExprs.hamming64(hb, ha))
      if (a == b) assert(ha == hb)
    }
  }

  test("winnow fingerprints shrink with window size and are window-1-complete") {
    forSamples(Gen.choose(0, 60).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)), 50) { s =>
      val bytes = s.getBytes("UTF-8")
      val w4 = Winnow.fingerprints(bytes, 5, 4)
      val w8 = Winnow.fingerprints(bytes, 5, 8)
      assert(w8.length <= w4.length)  // bigger window selects fewer minima
      assert(w4.toSet.subsetOf(Winnow.fingerprints(bytes, 5, 1).toSet))
    }
  }

  test("windowed agg ≡ brute-force groupBy over random event sets") {
    val eventsGen = Gen.listOfN(60, for {
      user <- Gen.choose(1L, 4L)
      offsetMin <- Gen.choose(0, 300)
      value <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (user, 1704067200000L + offsetMin * 60000L, value))

    forSamples(eventsGen, 5) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, ts, v), i) =>
          (i.toLong, new java.sql.Timestamp(ts), u, "t", v, "{}")
        }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val windowed = graft.pipeline.EventPipeline.hourlyAgg(df)
        .select("user_id", "hour_bucket", "event_count").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = evs.groupBy(e => (e._1, e._2 / 3600000L * 3600L))
        .map { case ((u, hb), g) => (u, hb, g.size) }.toSet
      assert(windowed == brute)
    }
  }

  test("exact dedup is idempotent") {
    forSamples(Gen.listOfN(30, word), 5) { words =>
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val once = Dedup.exact(df).collect().toSeq
      // dedup of the survivors keyed the same way changes nothing
      val surv = df.join(Dedup.exact(df).select(col("keep_id").as("doc_id")), Seq("doc_id"))
      val twice = Dedup.exact(surv).collect().toSeq
      assert(once.map(_.getLong(0)) == twice.map(_.getLong(0)))
      twice.foreach(r => assert(r.getLong(1) == 1L))
    }
  }

  test("SQ8 quantization: codes in-grid and dequantization error <= scale/2 per dim") {
    import graft.llm.AnnIndex
    val vecGen = Gen.listOfN(16, Gen.choose(-1000, 1000))
    forSamples(Gen.listOfN(8, vecGen), 10) { rows =>
      val df = rows.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(x => x / 250.0f).toArray) }
        .toDF("vec_id", "u")
      val p = df.agg(
        array((0 until 16).map(i => min(element_at(col("u"), i + 1))): _*).as("mins"),
        array((0 until 16).map(i =>
          (max(element_at(col("u"), i + 1)) - min(element_at(col("u"), i + 1))) / 255.0): _*)
          .as("scales"))
      val out = df.crossJoin(p)
        .select(col("u"),
          AnnIndex.quantize(col("u"), col("mins"), col("scales")).as("codes"),
          AnnIndex.dequantize(
            AnnIndex.quantize(col("u"), col("mins"), col("scales")),
            col("mins"), col("scales")).as("dq"),
          col("scales"))
        .collect()
      out.foreach { r =>
        val u = r.getSeq[Float](0)
        val codes = r.getSeq[Int](1)
        val dq = r.getSeq[Double](2)
        val scales = r.getSeq[Double](3)
        codes.foreach(c => assert(c >= 0 && c <= 255, s"code $c out of int8 grid"))
        (0 until 16).foreach { i =>
          val bound = math.max(scales(i) / 2, 1e-12) + 1e-9
          assert(math.abs(dq(i) - u(i)) <= bound,
            s"dim $i: |${dq(i)} - ${u(i)}| > $bound (scale ${scales(i)})")
        }
      }
    }
  }
}
