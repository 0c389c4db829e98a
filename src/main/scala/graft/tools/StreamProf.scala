package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Phase profiler for the streaming pairing machinery (guide §1:
  * measure first): decomposes one order-keyed pairing into its cost
  * phases so optimization targets the dominant one instead of the
  * visible one.
  *
  *   sbt "runMain graft.tools.StreamProf [sfDir] [reps]"
  *
  * Phases timed per rep:
  *   schema   — tableStream construction (footer read + fs stat)
  *   stream   — state pass: start → awaitTermination on the memory sink
  *   drain    — sink table localCheckpoint + view drop
  *   project  — the q224-style membership rebuild (groupBy max-struct
  *              + explode) counted WITHOUT a graph tail
  *   minimal  — floor: lineitem file-stream → count agg → memory sink
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val sp = spark
    import sp.implicits._

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val base = t("schema") {
        graft.streaming.Pairing.tableStream(spark, dir, "lineitem")
          .select(col("l_orderkey").as("ok"),
            col("l_linenumber").cast("long").as("ln"),
            col("l_partkey").as("m"))
      }
      // minimal floor: stateless agg over the same stream
      t("minimal") {
        graft.streaming.Pairing.withStreamShuffle(spark) {
          val q = base.groupBy(col("ok") % 32).count()
            .writeStream.format("memory").queryName(s"prof_min_$rep")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        graft.streaming.EventFlow.drainMemorySink(spark, s"prof_min_$rep").count()
      }
      // the full orderMembers state pass, expiry on (gate default)
      val ttl = Some(7L * 24 * 3600 * 1000)
      val st = base
        .withColumn("evt", graft.streaming.Pairing.orderkeyEventTime(col("ok")))
        .withWatermark("evt", "0 milliseconds")
        .as[graft.streaming.Pairing.LiPair]
      val name = s"prof_pair_$rep"
      var lastQ: org.apache.spark.sql.streaming.StreamingQuery = null
      t("stream") {
        graft.streaming.Pairing.withBigStateStore(spark) {
          graft.streaming.Pairing.withStreamShuffle(spark) {
            val out = st.groupByKey(_.ok)
              .flatMapGroupsWithState[(Long, Seq[Long]), (Long, Long, Seq[Long])](
                OutputMode.Append,
                org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
                (o, it, state) =>
                  if (state.hasTimedOut) { state.remove(); Iterator.empty }
                  else {
                    val ordered = it.toVector.sortBy(r => (r.ok, r.ln))
                    val s0 = state.getOption.getOrElse((0L, Seq.empty[Long]))
                    val seen = s0._1 + ordered.size
                    val ms = (s0._2 ++ ordered.map(_.m)).distinct.sorted
                    state.update((seen, ms))
                    ttl.foreach(h => state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + h))
                    if (ordered.isEmpty) Iterator.empty else Iterator((o, seen, ms))
                  }
              }
            val q = out.toDF("o", "seq", "ms").writeStream.format("memory")
              .queryName(name).outputMode("append")
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
            lastQ = q
          }
        }
      }
      // micro-batch anatomy: Structured Streaming's own duration map
      // (triggerExecution = whole batch; addBatch = the data plan;
      // walCommit/offsets the checkpoint log; state commit under
      // stateOperators) — the ground truth for "where does the
      // machinery floor go"
      lastQ.recentProgress.foreach { p =>
        println(s"[prof] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs} " +
          p.stateOperators.map(s => s"state(commit=${s.commitTimeMs}ms " +
            s"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
            s"removed=${s.numRowsRemoved})").mkString(" "))
      }
      val sink = t("drain") { graft.streaming.EventFlow.drainMemorySink(spark, name) }
      t("project") {
        sink.groupBy(col("o"))
          .agg(max(struct(col("seq"), col("ms"))).as("b"))
          .select(col("o"), explode(col("b.ms")).as("m")).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
