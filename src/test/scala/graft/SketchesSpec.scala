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

  /** Round 12 (VERDICT r11 item 1): q187's gate frame now hashes
    * ONLY exact-integer sufficient statistics (mk_len, kth_min,
    * mk_inter, exact_inter) — the float KMV set-operation estimates
    * moved HERE: they are pure functions of those integers, and this
    * is where the accuracy claim (estimated intersection within 50%
    * of exact) is asserted.
    */
  test("q187 KMV set-operation estimates derive from the hashed integers and hold tolerance") {
    val k = 64
    val rows = graft.queries.EventQueries.q187_kmv_overlap(spark, dir).collect()
    spark.catalog.clearCache()
    assert(rows.length == 10) // 5 labels choose 2
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_inter")
      val mkLen = r.getAs[Long]("mk_len")
      val kthMin = r.getAs[Long]("kth_min")
      val mkInter = r.getAs[Long]("mk_inter")
      // the estimate arithmetic q187 used to hash, replayed from the
      // integer surface (2^60 as the exact literal, the r10 lesson)
      val estUnion =
        if (mkLen < k) mkLen.toDouble
        else (k - 1).toDouble * 1152921504606846976.0d / kthMin.toDouble
      val jacc = mkInter.toDouble / k
      val estInter = jacc * estUnion
      assert(mkLen <= k && mkInter <= mkLen)
      assert(math.abs(estInter - exact.toDouble) / math.max(exact.toDouble, 1.0) <= 0.5,
        s"(${r.get(0)}, ${r.get(1)}): est=$estInter exact=$exact")
    }
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
