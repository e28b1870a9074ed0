package graft

import org.apache.spark.sql.functions._

import graft.llm.FuzzyJoin

/** PassJoin edit-distance join: pigeonhole completeness against brute
  * force (the oracle's independent algorithm, replayed here in-engine),
  * edit-type coverage in both segment halves, and the tau bound. */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("finds deletion / insertion / substitution in either segment half, rejects distance 2") {
    val index = Seq(
      (0L, "abcdefgh"),
      (1L, "stuvwxyz")).toDF("clean_id", "s")
    val probes = Seq(
      (10L, "abcdefgh"),  // exact: dist 0
      (11L, "bcdefgh"),   // deletion in segment 1
      (12L, "abcdefg"),   // deletion in segment 2
      (13L, "axbcdefgh"), // insertion in segment 1
      (14L, "abcdefgxh"), // insertion in segment 2
      (15L, "Xbcdefgh"),  // substitution in segment 1
      (16L, "abcdefgX"),  // substitution in segment 2
      (17L, "XbcdefgX"),  // distance 2: must NOT match
      (18L, "qqqqqqqq")   // unrelated
    ).toDF("dirty_id", "q")
    val out = FuzzyJoin.editDistanceJoin(index, probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq(
      (10L, 0L, 0), (11L, 0L, 1), (12L, 0L, 1), (13L, 0L, 1),
      (14L, 0L, 1), (15L, 0L, 1), (16L, 0L, 1)))
  }

  test("fixture resolution equals brute-force length-band levenshtein (pigeonhole theorem)") {
    val docs = Tables.documents(spark, sf)
    val clean = docs
      .select($"doc_id".as("clean_id"),
        filter(split($"text", " "), t => length(t) > 0).as("t"))
      .filter(size($"t") >= 5)
      .select($"clean_id", array_join(slice($"t", 1, 5), " ").as("s"))
    val dirty = clean.filter($"clean_id" % 5 === 0)
      .select($"clean_id".as("dirty_id"),
        expr("concat(substring(s, 1, (clean_id div 5) % length(s))," +
          " substring(s, (clean_id div 5) % length(s) + 2))").as("q"))
    // brute force = the ORACLE's algorithm: every pair in the length
    // band, full levenshtein — tractable at fixture scale only
    val brute = dirty.crossJoin(clean)
      .filter(abs(length($"q") - length($"s")) <= 1)
      .select($"dirty_id", $"clean_id", expr("levenshtein(q, s)").as("dist"))
      .filter($"dist" <= 1)
      .orderBy("dirty_id", "clean_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val passjoin = FuzzyJoin.titleResolution(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(passjoin == brute)
    assert(passjoin.nonEmpty)
    // every dirty title matches at least its own clean source
    val dirtyIds = dirty.select("dirty_id").as[Long].collect().toSet
    val selfMatched = passjoin.filter(p => p._1 == p._2).map(_._1).toSet
    assert(selfMatched == dirtyIds, "each variant must resolve to its source")
  }

  test("probe enumeration stays bounded: <= 18 substrings per probe string") {
    // the blocking cost model: 3 lengths x 2 slots x 3 shifts
    val index = Seq((0L, "abcdefghij")).toDF("clean_id", "s")
    val probes = Seq((1L, "abcdefghij")).toDF("dirty_id", "q")
    // indirect pin via correctness on min-length strings (l = 2 edge)
    val tiny = FuzzyJoin.editDistanceJoin(
      Seq((0L, "ab")).toDF("clean_id", "s"),
      Seq((1L, "ab"), (2L, "b"), (3L, "abc"), (4L, "cd")).toDF("dirty_id", "q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(tiny == Seq((1L, 0L, 0), (2L, 0L, 1), (3L, 0L, 1)))
    assert(FuzzyJoin.editDistanceJoin(index, probes).count() == 1L)
  }

  test("tau=2: fixture two-deletion resolution equals brute force; distance 3 rejected") {
    val docs = Tables.documents(spark, sf)
    val clean = docs
      .select($"doc_id".as("clean_id"),
        filter(split($"text", " "), t => length(t) > 0).as("t"))
      .filter(size($"t") >= 5)
      .select($"clean_id", array_join(slice($"t", 1, 5), " ").as("s"))
    val d1 = clean.filter($"clean_id" % 5 === 0)
      .select($"clean_id".as("dirty_id"),
        expr("concat(substring(s, 1, (clean_id div 5) % length(s))," +
          " substring(s, (clean_id div 5) % length(s) + 2))").as("q1"))
    val dirty = d1.select($"dirty_id",
      expr("concat(substring(q1, 1, (dirty_id div 7) % length(q1))," +
        " substring(q1, (dirty_id div 7) % length(q1) + 2))").as("q"))
    val brute = dirty.crossJoin(clean)
      .filter(abs(length($"q") - length($"s")) <= 2)
      .select($"dirty_id", $"clean_id", expr("levenshtein(q, s)").as("dist"))
      .filter($"dist" <= 2)
      .orderBy("dirty_id", "clean_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val passjoin = FuzzyJoin.titleResolution2(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(passjoin == brute)
    assert(passjoin.nonEmpty)
    // unit: three edits must NOT match at tau=2
    val unit = FuzzyJoin.editDistanceJoin(
      Seq((0L, "abcdefghijkl")).toDF("clean_id", "s"),
      Seq((1L, "Xbcdefghijkl"), (2L, "XbcdefXhijkl"), (3L, "XbcXefXhijkl"))
        .toDF("dirty_id", "q"), tau = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(unit == Seq((1L, 0L, 1), (2L, 0L, 2)))
  }
}
