package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch investigator: run a gate query, then print its FINAL
  * adaptive executed plan (isFinalPlan=true) — the only place
  * runtime exchange/stage reuse is visible; the static explain
  * duplicates every shared subtree. Not part of the gate; edited
  * ad-hoc per investigation.
  *
  *   sbt "runMain graft.tools.Probe q105_tfidf_pairs [sfDir]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q105_tfidf_pairs")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        }
      }
    })
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    Thread.sleep(500) // let straggler task-end events drain
    println(s"[probe] $name bytesRead=${bytesRead.get} recordsRead=${recordsRead.get}")
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    def cnt(p: String) = p.r.findAllIn(plan).length
    val stageIds = "(ShuffleQueryStage|BroadcastQueryStage|TableCacheQueryStage) (\\d+)".r
      .findAllMatchIn(plan).map(m => m.group(1) + " " + m.group(2)).toSeq
    println(s"[probe] $name scans=${cnt("Scan parquet")} " +
      s"stageRefs=${stageIds.length} distinctStages=${stageIds.distinct.length} " +
      s"inMemory=${cnt("InMemoryTableScan")} shuffles=${cnt("Exchange hashpartitioning")}")
    println(s"[probe] stages: ${stageIds.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1).mkString(", ")}")
    spark.stop()
  }
}
