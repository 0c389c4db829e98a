package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.CacheOnce.PersistFreshOps

/** A/B harness for KHop.expand round-bookkeeping variants (guide §1:
  * measure; §2.4: remove shuffles/jobs outright). Each variant must
  * return the same (n, hops) rows as the shipped kernel.
  *
  *   sbt "runMain graft.tools.KHopVariants [sfDir] [reps]"
  */
object KHopVariants {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[khv] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    def edgesOf(): DataFrame = {
      val op = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = graft.operators.Triangles.cooccurrenceEdges(op, "o", "p", minSupport = 2)
      e.select(col("a").as("x"), col("b").as("y"))
        .unionByName(e.select(col("b").as("x"), col("a").as("y")))
    }
    def srcOf(): DataFrame = Tables.part(spark, dir)
      .filter(pmod(col("p_partkey"), lit(100L)) === 0)
      .select(col("p_partkey").as("n"))

    /** V2: persist rounds lazily, no count, no width cap. */
    def expandV2(bidir: DataFrame, src: DataFrame, maxHops: Int): DataFrame = {
      var reached = src.select(col("n")).withColumn("hops", lit(0L)).persistFresh()
      var frontier = reached.select(col("n"))
      for (h <- 1 to maxHops) {
        val next = frontier.join(bidir, frontier("n") === bidir("x"))
          .select(col("y").as("n")).distinct()
          .join(reached.select(col("n")), Seq("n"), "left_anti")
          .withColumn("hops", lit(h.toLong))
          .persistFresh()
        reached = reached.unionByName(next)
        frontier = next.select(col("n"))
      }
      reached
    }

    /** V4: per-round eager localCheckpoint instead of persist+count. */
    def expandV4(bidir: DataFrame, src: DataFrame, maxHops: Int): DataFrame = {
      var reached = src.select(col("n")).withColumn("hops", lit(0L)).localCheckpoint(true)
      var frontier = reached.select(col("n"))
      for (h <- 1 to maxHops) {
        val next = frontier.join(bidir, frontier("n") === bidir("x"))
          .select(col("y").as("n")).distinct()
          .join(reached.select(col("n")), Seq("n"), "left_anti")
          .withColumn("hops", lit(h.toLong))
          .localCheckpoint(true)
        reached = reached.unionByName(next)
        frontier = next.select(col("n"))
      }
      reached
    }

    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val bidir = edgesOf().persistFresh()
      bidir.count()
      val src = srcOf()
      t("v1_shipped") {
        graft.operators.KHop.expand(bidir, src, maxHops = 4)
          .groupBy(col("n")).agg(min(col("hops"))).count()
      }
      spark.catalog.clearCache(); val b2 = edgesOf().persistFresh(); b2.count()
      t("v2_lazy_persist") {
        expandV2(b2, srcOf(), 4).groupBy(col("n")).agg(min(col("hops"))).count()
      }
      spark.catalog.clearCache(); val b4 = edgesOf().persistFresh(); b4.count()
      t("v4_localckpt") {
        expandV4(b4, srcOf(), 4).groupBy(col("n")).agg(min(col("hops"))).count()
      }
      spark.catalog.clearCache()
    }
    // equality check once
    val b = edgesOf().persistFresh(); b.count()
    val r1 = graft.operators.KHop.expand(b, srcOf(), 4)
      .groupBy(col("n")).agg(min(col("hops")).as("h"))
    val r2 = expandV2(b, srcOf(), 4).groupBy(col("n")).agg(min(col("hops")).as("h"))
    val diff = r1.exceptAll(r2).count() + r2.exceptAll(r1).count()
    println(s"[khv] v1 vs v2 diff rows = $diff")
    spark.stop()
  }
}
