package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.Flow
import graft.operators.Multimodal
import graft.sources.{KvStore, Sources}

/** Runnable tour of the library surface a reference (deva) user would
  * reach for — the README's examples, executable:
  *   sbt "runMain graft.Examples /root/testdata/sf0.001"
  */
object Examples {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(cores = 4, shufflePartitions = 8)

    // deva:  source | filter(p) | map(f) | accumulate(add) | sink(print)
    val running = Flow(Tables.orders(spark, dir))
      .filter(col("o_totalprice") > 1000)
      .accumulate(Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")),
        sum(col("o_totalprice")), "running_spend")
      .head(3, Seq(col("running_spend").desc))
      .toDF
    println("== accumulate (running spend, top 3) ==")
    running.show(truncate = false)

    // deva:  clicks.combine_latest(purchases)  — keyed as-of pairing
    val ev = Tables.events(spark, dir)
    val asof = Flow(ev.select(col("event_id"), col("user_id"), col("ts")))
      .combineLatest(
        Flow(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value").as("pvalue"))),
        "user_id", "ts", "pts", Seq("pvalue"))
      .toDF
    println("== combine_latest (events with last purchase value) ==")
    asof.orderBy("event_id").show(3)

    // deva:  stream >> DB('table')  — keyed upsert store
    import spark.implicits._
    val kvPath = Files.createTempDirectory("graft_demo_kv").toString + "/t"
    val store = new KvStore(spark, kvPath, Seq("k"), "v")
    store.upsert(Seq(("a", 1L, "first"), ("b", 1L, "init")).toDF("k", "v", "payload"))
    store.upsert(Seq(("a", 2L, "updated")).toDF("k", "v", "payload"))
    println("== KvStore (DBStream analogue, last-write-wins) ==")
    store.get().orderBy("k").show()

    // multimodal plumbing: binary payloads + stub decode
    val feats = Multimodal.decodeStub(Multimodal.fakeCorpus(spark, 4, "image"))
    println("== multimodal stub decode ==")
    feats.toDF().select("media_id", "kind", "n_bytes", "checksum").orderBy("media_id").show(truncate = false)

    // text source round-trip
    val tmp = Files.createTempDirectory("graft_demo_txt").toString
    Sources.toTextFile(Tables.nation(spark, dir).select(col("n_name")), tmp + "/nations")
    println(s"== to_textfile/from_textfile round-trip: ${Sources.textFile(spark, tmp + "/nations").count()} lines ==")

    spark.stop()
  }
}
