package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.{Sessions, Tables}
import graft.operators.{TextAnalysis => TA}

/** Scratch investigator (not part of the gate; edited ad-hoc per
  * investigation). Currently: where the q127 docs cache-build time
  * goes — tokenize below vs above the repartition exchange.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, wall, si.taskMetrics.executorRunTime, si.numTasks,
          si.rddInfos.map(r => r.scope.map(_.name).getOrElse("?")).distinct.mkString(",")))
      }
    })
    def run(tag: String)(df: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        stages.clear()
        val t0 = System.nanoTime()
        val d = df.persist()
        val n = d.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[probe] $tag rep$i: $sec%.2f s ($n rows)")
        stages.sortBy(-_._2).take(3).foreach { case (id, wall, run, tasks, scopes) =>
          println(f"[probe]    stage $id%3d wall=${wall / 1e3}%5.2f taskSum=${run / 1e3}%6.2f tasks=$tasks%3d $scopes")
        }
        d.unpersist(true)
      }
    }
    val np = spark.sessionState.conf.numShufflePartitions
    run("tok-below-exchange")(Tables.documents(spark, dir)
      .select(col("doc_id"), TA.tokens(col("text")).as("tk"))
      .repartition(np, col("doc_id"))
      .select(col("doc_id"), array_distinct(TA.shingles(col("tk"), 3)).as("ts"))
      .filter(size(col("ts")) > 0))
    run("text-below-exchange")(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(np, col("doc_id"))
      .select(col("doc_id"), TA.tokens(col("text")).as("tk"))
      .select(col("doc_id"), array_distinct(TA.shingles(col("tk"), 3)).as("ts"))
      .filter(size(col("ts")) > 0))
    spark.stop()
  }
}
