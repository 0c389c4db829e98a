package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Scratch investigator (not part of the gate; edited ad-hoc per
  * investigation). Currently: q118 stage timing.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
    }
    val gm = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
    time("gm-scan")(gm.count())
    val sets = gm.groupBy(col("o")).agg(sort_array(collect_set(col("s"))).as("ms"))
    time("collect_set")(sets.count())
    val edges = graft.operators.Triangles.cooccurrenceEdges(gm, "o", "s", minSupport = 5)
    time("edges")(edges.count())
    val tri = graft.operators.Triangles.triangles(edges)
    time("triangles")(tri.count())
    time("q118-full")(graft.SparkEntry.queries("q118_triangles")(spark, dir).count())
    spark.stop()
  }
}
