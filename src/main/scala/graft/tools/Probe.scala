package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Scratch component-timer for profiling a query's stages in
  * isolation (not part of the gate; edited ad-hoc per investigation).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
    }
    val docs = Tables.documents(spark, dir)
    time("docs-count")(docs.count())
    time("uni-agg")(docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c")).count())
    time("uni-agg-2")(docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c")).count())
    time("bi-agg-transform")(docs
      .select(explode(when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => struct(element_at(toks, i).as("x"),
              element_at(toks, i + 1).as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy")).count())
    time("bi-agg-zip")(docs
      .select(explode(arrays_zip(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("bg"))
      .select(col("bg.0").as("x"), col("bg.1").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy")).count())
    time("tok-only-scan")(docs.select(explode(toks).as("tok")).count())
    spark.stop()
  }
}
