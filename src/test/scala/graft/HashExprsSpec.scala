package graft

import org.apache.spark.sql.functions._

import graft.functions.{ColumnFns, HashExprs}

class HashExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("fnv1a64 matches the published FNV-1a test vectors") {
    // Public FNV-1a 64 reference values (landmark test vectors).
    assert(HashExprs.fnv1a64("") == 0xcbf29ce484222325L)
    assert(HashExprs.fnv1a64("a") == 0xaf63dc4c8601ec8cL)
    assert(HashExprs.fnv1a64("foobar") == 0x85944171f73967e8L)
  }

  test("fnv1a64 expression agrees with the Scala implementation and codegen runs") {
    val df = Seq("", "a", "foobar", "the quick brown fox").toDF("s")
      .select(col("s"), ColumnFns.fnv1a64(col("s")).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == HashExprs.fnv1a64(r.getString(0)))
    }
  }

  test("simhash: identical token sets collide, disjoint ones do not") {
    val a = HashExprs.simhash64(Iterator("spark", "scala", "engine", "query", "fast"))
    val b = HashExprs.simhash64(Iterator("spark", "scala", "engine", "query", "fast"))
    val c = HashExprs.simhash64(Iterator("entirely", "different", "words", "here", "now"))
    assert(a == b)
    assert(HashExprs.hamming64(a, c) > 10)
  }

  test("simhash: near-identical documents land within small hamming distance") {
    val base = (1 to 50).map(i => s"token$i")
    val tweaked = base.updated(10, "changed")
    val h1 = HashExprs.simhash64(base.iterator)
    val h2 = HashExprs.simhash64(tweaked.iterator)
    assert(HashExprs.hamming64(h1, h2) <= 8)
  }

  test("winnowing fingerprints: edit-local stability, disjoint separation") {
    import graft.functions.Winnow
    def fp(s: String) = Winnow.fingerprints(s.getBytes("UTF-8"), 5, 4).toSet
    val base = "the quick brown fox jumps over the lazy dog again and again"
    assert(fp(base) == fp(base))
    val edited = base.replace("jumps", "leaps")
    val overlap = (fp(base) & fp(edited)).size.toDouble / fp(base).size
    assert(overlap > 0.5, s"local edit should preserve most fingerprints, got $overlap")
    val other = "completely different content with zero shared character grams"
    assert((fp(base) & fp(other)).isEmpty)
    assert(fp("abc") sameElements Set.empty) // shorter than one k-gram
  }

  test("zorder2 interleave round-trips and clusters both dimensions") {
    import graft.functions.ZOrder2
    // round trip
    for (a <- Seq(0L, 1L, 7L, 12345L, 0xffffffffL); b <- Seq(0L, 3L, 999L, 0xffffffffL)) {
      val z = ZOrder2.interleave(a, b)
      assert(ZOrder2.compact(z) == a)
      assert(ZOrder2.compact(z >> 1) == b)
    }
    // locality: points in the same 2^k-aligned tile share a z prefix,
    // so sorting by z clusters any small (a, b) rectangle contiguously
    val tile = for (a <- 8L to 11L; b <- 4L to 7L) yield ZOrder2.interleave(a, b)
    val all = for (a <- 0L to 31L; b <- 0L to 31L) yield ZOrder2.interleave(a, b)
    val sorted = all.sorted
    val (lo, hi) = (tile.min, tile.max)
    val span = sorted.count(z => z >= lo && z <= hi)
    assert(span == tile.size, s"the 4x4 tile must occupy one contiguous z-range, spans $span")

    // expression form
    val df = Seq((8L, 4L), (11L, 7L)).toDF("a", "b")
      .select(graft.functions.VectorFns.zorder2(col("a"), col("b")).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs(0) == ZOrder2.interleave(8L, 4L))
    assert(zs(1) == ZOrder2.interleave(11L, 7L))
  }

  test("simhash expression over array column") {
    val df = Seq(Seq("a", "b", "c"), Seq("a", "b", "c")).toDF("toks")
      .select(ColumnFns.simhash64(col("toks")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) == HashExprs.simhash64(Iterator("a", "b", "c")))
  }
}
