package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.{Dedup, TextAnalysis => TA}

/** Scratch investigator (not part of the gate; edited ad-hoc per
  * investigation). Currently: q90 stage timing.
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
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val classes = docs.withColumn("cls", md5(col("text")))
    val reps = classes.groupBy(col("cls"))
      .agg(min(col("doc_id")).as("rep_id"), min(col("text")).as("text"))
    time("reps")(reps.count())
    val repToks = reps.select(col("rep_id"), explode(TA.tokens(col("text"))).as("tok"))
    val fp = Dedup.simhash(repToks, "rep_id")
    time("simhash")(fp.count())
    val blocks = fp.select(col("rep_id"), col("simhash"),
      explode(sequence(lit(0), lit(4))).as("j"))
      .withColumn("bval", expr("(simhash >> (12 * j)) & 4095"))
    val candReps = blocks
      .groupBy(col("j"), col("bval"))
      .agg(sort_array(collect_list(struct(col("rep_id"), col("simhash")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))),
          y => struct(x.getField("rep_id").as("ra"), y.getField("rep_id").as("rb")))))).as("p"))
      .select(col("p.ra"), col("p.rb"))
      .distinct()
    time("candReps")(candReps.count())
    val rtxt = reps.select(col("rep_id"), col("cls"), col("text"))
    val verified = candReps
      .join(rtxt.select(col("rep_id").as("ra"), col("cls").as("cls_a"), col("text").as("a_text")), Seq("ra"))
      .join(rtxt.select(col("rep_id").as("rb"), col("cls").as("cls_b"), col("text").as("b_text")), Seq("rb"))
      .filter(abs(length(col("a_text")) - length(col("b_text"))) <= 10)
      .select(levenshtein(col("a_text"), col("b_text"), 10).as("lev"))
      .filter(col("lev") >= 0)
    time("afterLenPrune")(candReps
      .join(rtxt.select(col("rep_id").as("ra"), col("text").as("a_text")), Seq("ra"))
      .join(rtxt.select(col("rep_id").as("rb"), col("text").as("b_text")), Seq("rb"))
      .filter(abs(length(col("a_text")) - length(col("b_text"))) <= 10).count())
    time("verified")(verified.count())
    spark.stop()
  }
}
