package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.Dedup

/** Stage profiler for the co-occurrence edge build (guide §1) — the
  * shared prelude of the whole basket/graph family. Times each prefix
  * of the shipped pipeline plus a join-shaped alternative.
  *
  *   sbt "runMain graft.tools.EdgeProf [sfDir] [reps]"
  */
object EdgeProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[eprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val op = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      t("scan") { noop(op) }
      val sets = op.groupBy(col("o")).agg(collect_set(col("p")).as("ms"))
        .filter(size(col("ms")) > 1)
      t("collect_set") { noop(sets) }
      val pairs = sets
        .withColumn("ms", Dedup.cappedMembers(col("ms"), 10000, "co-occurrence group"))
        .select(col("ms"), explode(col("ms")).as("x"))
        .select(col("x"), explode(Dedup.membersAbove(col("ms"), col("x"))).as("y"))
      t("pairs_explode") { noop(pairs) }
      val support = pairs.groupBy(col("x").as("a"), col("y").as("b"))
        .agg(count(lit(1)).as("support")).filter(col("support") >= 2)
      t("support_full_v1") { noop(support) }
      // V2: join-shaped pair generation (the oracle's shape) — all
      // codegen, no object agg, no interpreted lambda
      val os = op.distinct()
      val v2 = os.select(col("o"), col("p").as("a"))
        .join(os.select(col("o"), col("p").as("b")), "o")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
      t("support_full_v2_join") { noop(v2) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
