package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("exact dedup keeps one survivor per distinct text") {
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("doc_id", "text")
    val out = Dedup.exact(df).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L), (3L, 1L)))
  }

  test("keepFirst picks the row_number()=1 winner deterministically") {
    val df = Seq((1L, "u1", 10L), (2L, "u1", 5L), (3L, "u2", 7L))
      .toDF("id", "key", "ts")
    val out = Dedup.keepFirst(df, Seq("key"), col("ts"), col("id"))
      .orderBy("key").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L, 3L))
  }

  test("minhash-LSH finds every >=0.5-jaccard pair the brute force finds (fixture corpus)") {
    val brute = Dedup.ngramJaccardAllPairs(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, 3, 32, 4, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain planted near-dups")
    // LSH verifies candidates exactly => precision 1; recall is the
    // LSH guarantee ((1-j^4)^32 miss prob < 1e-3 at j=0.5).
    assert(lsh.subsetOf(brute))
    assert(lsh == brute, s"missed pairs: ${brute -- lsh}")
  }

  test("minhash jaccard estimates agree with exact jaccard on found pairs") {
    val exact = Dedup.ngramJaccardAllPairs(docs, 3, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val found = Dedup.minhashPairs(docs, 3, 32, 4, 0.5).collect()
    found.foreach { r =>
      val ex = exact((r.getLong(0), r.getLong(1)))
      assert(r.getDouble(2) == ex) // verification recomputes EXACT jaccard
    }
  }

  test("simhash blocking finds pairs within hamming<=3 and verifies exactly") {
    val pairs = Dedup.simhashPairs(docs).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(2) <= 3))
  }
}
