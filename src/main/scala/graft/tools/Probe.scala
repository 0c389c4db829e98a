package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Scratch investigator (not part of the gate; edited ad-hoc per
  * investigation). Currently: pair-expansion formulations.
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
    val sets = gm.groupBy(col("o")).agg(sort_array(collect_set(col("s"))).as("ms"))
      .filter(size(col("ms")) > 1)
    // formulation A: interpreted nested-lambda in-order pairs
    time("lambda-pairs")(sets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))),
          y => struct(x.as("x"), y.as("y")))))).as("p"))
      .groupBy(col("p.x"), col("p.y")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 5).count())
    // formulation B: codegen'd double explode + filter
    time("explode2-pairs")(sets
      .select(col("ms"), explode(col("ms")).as("x"))
      .select(col("x"), explode(col("ms")).as("y"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 5).count())
    time("lambda-pairs-2")(sets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))),
          y => struct(x.as("x"), y.as("y")))))).as("p"))
      .groupBy(col("p.x"), col("p.y")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 5).count())
    time("explode2-pairs-2")(sets
      .select(col("ms"), explode(col("ms")).as("x"))
      .select(col("x"), explode(col("ms")).as("y"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 5).count())
    spark.stop()
  }
}
