package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Determinism
import graft.operators.Sketches

/** KMV bottom-k aggregate: exact below k, bounded error above, and
  * mergeable across partitions (the property the test exercises by
  * aggregating over 4 shuffle partitions).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.01"

  test("KMV is exact when distinct count < k") {
    val sp = spark
    import sp.implicits._
    val k = 256
    val agg = new Sketches.BottomK(k).toColumn
    val hashes = Tables.events(spark, dir)
      .select(Determinism.hash60(col("user_id").cast("string")).as("h"))
      .as[Long]
    val bottom = hashes.select(agg).collect()(0)
    val exact = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(exact < k)
    assert(Sketches.kmvEstimate(bottom, k) == exact.toDouble)
  }

  test("KMV estimates within 25% when distinct count >> k") {
    val sp = spark
    import sp.implicits._
    val k = 64
    val agg = new Sketches.BottomK(k).toColumn
    val hashes = Tables.lineitem(spark, dir)
      .select(Determinism.hash60(col("l_orderkey").cast("string")).as("h"))
      .as[Long]
    val bottom = hashes.select(agg).collect()(0)
    val exact = Tables.lineitem(spark, dir).select("l_orderkey").distinct().count()
    val est = Sketches.kmvEstimate(bottom, k)
    assert(exact > 4 * k)
    assert(math.abs(est - exact) / exact < 0.25, s"exact=$exact est=$est")
  }
}
