package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{NgramHash, VectorFns, Winnow, ZOrder2}

/** The custom kernels run inside whole-stage codegen (SparkTestBase
  * sets spark.sql.codegen.fallback=false, so a codegen bug aborts
  * rather than silently degrading) and agree with the interpreted /
  * direct-Scala forms.
  */
class CodegenSpec extends SparkTestBase {
  import spark.implicits._

  test("dot_product codegen equals the HOF spelling; dim mismatch is NULL") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (Array(0.5f, -1.5f, 2.5f), Array(1.0, 1.0, 1.0))
    ).toDF("f", "d")
    val rows = df.select(
      VectorFns.dot(col("f"), col("d")).as("dot"),
      aggregate(zip_with(col("f").cast(ArrayType(DoubleType)), col("d"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))

    val mism = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("dot")).collect()
    assert(mism.head.isNullAt(0), "dimension mismatch must yield NULL")
  }

  test("shingle_hash_set and shingle_minhash codegen match direct computation") {
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "a b", "").map(_.split(" ").filter(_.nonEmpty).toSeq).toDF("toks")
    val rows = docs.select(
      col("toks"),
      VectorFns.shingleHashSet(col("toks"), 3).as("hs"),
      VectorFns.shingleMinHash(col("toks"), 3, 16).as("sig")).collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
      assert(r.getSeq[Long](1) == NgramHash.hashSet(arr, 3).toSeq)
      assert(r.getSeq[Long](2).length == 16)
    }
  }

  test("winnow_pos_count and max_equal_run codegen match the direct kernels") {
    val texts = Seq("the quick brown fox the quick brown fox", "abc", "")
    val rows = texts.toDF("t").select(
      col("t"),
      VectorFns.winnowPosCount(col("t")).as("pos"),
      VectorFns.maxEqualRun(sort_array(split(col("t"), " "))).as("run")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == Winnow.posCount(t.getBytes, 5, 4))
      val sorted = t.split(" ", -1).sorted
      val direct = sorted.groupBy(identity).values.map(_.length).max
      assert(r.getInt(2) == direct)
    }
  }

  test("winnow codegen matches the direct fingerprint computation") {
    val texts = Seq("the quick brown fox jumps over the lazy dog again", "abc")
    val rows = texts.toDF("t")
      .select(col("t"), VectorFns.winnow(col("t"), 5, 4).as("fp")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) ==
        Winnow.fingerprints(r.getString(0).getBytes("UTF-8"), 5, 4).toSeq)
    }
  }

  test("zorder2 codegen matches the Scala interleave") {
    val rows = Seq((0L, 0L), (1L, 3L), (12345L, 999L), (0xffffffffL, 0xffffffffL))
      .toDF("a", "b")
      .select(col("a"), col("b"), VectorFns.zorder2(col("a"), col("b")).as("z")).collect()
    rows.foreach(r => assert(r.getLong(2) == ZOrder2.interleave(r.getLong(0), r.getLong(1))))
  }

  test("simhash64 codegen matches the iterator kernel and skips nulls") {
    import graft.functions.{ColumnFns, HashExprs}
    val rows = Seq(
      Seq("spark", "scala", "engine", "query", "fast"),
      Seq("a"),
      Seq.empty[String]
    ).toDF("toks")
      .select(col("toks"), ColumnFns.simhash64(col("toks")).as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == HashExprs.simhash64(r.getSeq[String](0).iterator))
    }
    // null elements are skipped, not hashed
    val withNull = Seq(1).toDF("i")
      .select(array(lit("x"), lit(null).cast("string"), lit("y")).as("toks"))
      .select(ColumnFns.simhash64(col("toks"))).collect()
    assert(withNull.head.getLong(0) == HashExprs.simhash64(Iterator("x", "y")))
    // and the stage is genuinely codegen'd (a non-foldable source, so
    // the projection isn't collapsed into a LocalTableScan)
    val plan = spark.range(4)
      .select(array(lit("a"), col("id").cast("string")).as("toks"))
      .select(ColumnFns.simhash64(col("toks"))).queryExecution.executedPlan.toString
    // "*(n)" prefixes a WholeStageCodegen stage in the simple plan string
    assert(plan.contains("*(1) Project [simhash64"), plan)
  }

  test("sorted_intersect_size codegen equals the array_intersect spelling") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L)),   // |inter| = 2
      (Array(1L, 2L), Array(3L, 4L)),                    // disjoint
      (Array[Long](), Array(1L, 2L)),                    // empty side
      (Array(7L, 8L, 9L), Array(7L, 8L, 9L))             // identical
    ).toDF("a", "b")
    val rows = df.select(
      VectorFns.sortedIntersectSize(col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).as("generic"),
      (size(col("a")) + size(col("b")) -
        VectorFns.sortedIntersectSize(col("a"), col("b"))).as("union_fused"),
      size(array_union(col("a"), col("b"))).as("union_generic")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"$r")
      assert(r.getInt(2) == r.getInt(3), s"$r")
    }
  }
}
