package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.CacheOnce.PersistFreshOps

/** Phase profiler for the co-occurrence graph kernels (guide §1):
  * where do q138/q249/q244/q118's seconds actually go — the edge
  * build, the persist of the bidirected frame, or the round loop?
  *
  *   sbt "runMain graft.tools.GraphProf [sfDir] [reps]"
  */
object GraphProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[gprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val op = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = graft.operators.Triangles.cooccurrenceEdges(op, "o", "p", minSupport = 2)
      t("edges_noop") {
        edges.write.format("noop").mode("overwrite").save()
      }
      val bidir = t("bidir_persist_count") {
        val b = edges.select(col("a").as("x"), col("b").as("y"))
          .unionByName(edges.select(col("b").as("x"), col("a").as("y")))
          .persistFresh()
        println(s"[gprof]   bidir rows=${b.count()}")
        b
      }
      val src = Tables.part(spark, dir)
        .filter(pmod(col("p_partkey"), lit(100L)) === 0)
        .select(col("p_partkey").as("n"))
      t("khop_expand") {
        graft.operators.KHop.expand(bidir, src, maxHops = 4)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      // full query for reference
      t("q138_full") {
        graft.SparkEntry.queries("q138_khop")(spark, dir).count()
      }
      spark.catalog.clearCache()
      t("q249_full") {
        graft.SparkEntry.queries("q249_kcore")(spark, dir).count()
      }
      spark.catalog.clearCache()
      t("q118_full") {
        graft.SparkEntry.queries("q118_triangles")(spark, dir).count()
      }
      spark.catalog.clearCache()
      t("q189_full") {
        graft.SparkEntry.queries("q189_pagerank_iter")(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
