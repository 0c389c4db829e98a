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

  test("HLL sketch REAGGREGATION: stored daily sketches union to the weekly answer without rescanning") {
    // the 100 TB pattern: a recurring ingest stores one tiny sketch
    // per (day, segment); ANY later rollup (weekly, monthly, all-time,
    // any segment subset) is a union of stored sketches — no second
    // pass over the corpus. Spark 4 exposes DataSketches HLL natively
    // (hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
        countDistinct(col("user_id")).as("exact_daily"))
    // the stored-sketch frame is day-sized; simulate "stored" by
    // materializing it before the rollup
    val stored = daily.collect()
    assert(stored.length > 5, "corpus should span multiple days")
    val rolled = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    val exact = Tables.events(spark, dir).select("user_id").distinct().count()
    // HLL at default lgK=12 has ~1.6% relative standard error; this
    // corpus's cardinality is tiny, so the estimate should be exact
    // or near-exact — allow 5%
    assert(math.abs(rolled - exact).toDouble / exact < 0.05,
      s"union-of-dailies $rolled vs exact $exact")
    // per-day estimates also land within band of their exact counts
    daily.select(expr("hll_sketch_estimate(sk)").as("est"), col("exact_daily"))
      .collect().foreach { r =>
        val (est, ex) = (r.getLong(0), r.getLong(1))
        assert(math.abs(est - ex).toDouble / math.max(ex, 1) < 0.05,
          s"daily estimate $est vs exact $ex")
      }
  }
}
