package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KvStore
import graft.streaming.EventFlow

/** End-to-end deva `stream >> DB('table')`: a streaming flow drains
  * through foreachBatch into the KV upsert store; later batches
  * overwrite earlier values per key. Plus sketch-accuracy checks for
  * the approximate aggregates a 100 TB pipeline leans on.
  */
class StreamToStoreSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  test("streaming flow upserts into KvStore across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val path = Files.createTempDirectory("graft_skv").toString + "/t"
    val store = new KvStore(spark, path, Seq("k"), "v")
    val q = EventFlow(mem.toDF.toDF("k", "v", "payload"))
      .foreachBatchSink(
        Files.createTempDirectory("graft_skv_cp").toString,
        Trigger.ProcessingTime(0)) { (batch, _) => store.upsert(batch) }
    mem.addData(("a", 1L, "first"), ("b", 1L, "init"))
    q.processAllAvailable()
    mem.addData(("a", 2L, "second"))
    q.processAllAvailable()
    q.stop()
    val got = store.get().orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(("a", 2L, "second"), ("b", 1L, "init")))
  }

  test("approx_count_distinct within 5% of exact on events users") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
