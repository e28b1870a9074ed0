package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Reading, SessionOut}

/** transformWithState sessionization: closes on gap, carries open
  * sessions across micro-batches in the typed ValueState. */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private val Min = 60000L

  test("sessions close on gap and survive across batches") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs a multi-column-family state store
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Reading]
    val ck = tmpDir("tws-ck")
    val collected = scala.collection.mutable.Set.empty[SessionOut]

    def run(): Unit = {
      val q = Sessionize.sessions(spark, mem.toDS())
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[SessionOut], _: Long) =>
          collected.synchronized { collected ++= ds.collect() }; ()
        }
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: two readings 10 min apart (one session), then a 40-min
    // gap reading -> first session closes, second stays open
    mem.addData(
      Reading("d1", 0L, 20f), Reading("d1", 10 * Min, 21f),
      Reading("d1", 50 * Min, 22f))
    run()
    assert(collected.toSet == Set(SessionOut("d1", 0L, 10 * Min, 2, 20f, 21f)))

    // batch 2: a reading 5 min after the open session extends it; a
    // 2-hour jump closes it
    mem.addData(Reading("d1", 55 * Min, 23f), Reading("d1", 180 * Min, 24f))
    run()
    assert(collected.contains(SessionOut("d1", 50 * Min, 55 * Min, 2, 22f, 23f)),
      s"open session should have continued across the batch boundary: $collected")

    prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
