package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Determinism

/** The native Hash60 expression must agree with the composed
  * builtins form (and therefore with the DuckDB oracle rendering)
  * on every input, and must run inside whole-stage codegen.
  */
class Hash60Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  test("native == composed on corpus tokens + edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "a", "你好", "😀", "x" * 10000)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("s")).limit(5000)
      .union(edge.toDF("s"))
    val diff = docs.select(
        Determinism.hash60(col("s")).as("a"),
        Determinism.hash60Composed(col("s")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("agreement on 10k random unicode strings (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val ss = Seq.fill(10000) {
      val len = rnd.nextInt(40)
      new String(Array.fill(len)((rnd.nextInt(0xD700) + 0x20).toChar))
    }
    val bad = ss.toDF("s")
      .select(Determinism.hash60(col("s")).as("a"),
        Determinism.hash60Composed(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("hash60 runs inside WholeStageCodegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Determinism.hash60(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    // executedPlan.toString marks whole-stage-codegen stages with "*(n)"
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), s"no codegen span:\n$plan")
  }

  test("values are non-negative 60-bit") {
    val mm = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Determinism.hash60(col("text")).as("h"))
      .agg(min("h"), max("h")).collect()(0)
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 60))
  }
}
