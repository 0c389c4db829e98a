package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.StatsQueries

/** Brute-force recounts for the round-9i statistical audit kit
  * (q149–q153). The DuckDB gate proves cross-engine value equality;
  * these re-derive each statistic a second, imperative way (collected
  * rows + scala.math) so a same-formula-both-sides oracle slip can't
  * hide.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  private def centsOf(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q149 z and Welch t equal a driver-side recomputation from raw events") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      val conv = if (es.exists(e => e._2 == "purchase" && centsOf(e._3) >= 20000)) 1L else 0L
      val cents = es.filter(_._2 == "purchase").map(e => centsOf(e._3)).sum
      (u, conv, cents)
    }.toVector
    // arm assignment via the SAME hash the query uses (portable md5-60)
    val arms = {
      val sp = spark
      import sp.implicits._
      perUser.map(_._1).toDF("user_id")
        .select(col("user_id"),
          graft.functions.Determinism.hash60(col("user_id").cast("string")).as("h"))
        .collect().map(r => r.getLong(0) -> (((r.getLong(1) % 2) + 2) % 2)).toMap
    }
    def stats(arm: Long) = {
      val rows = perUser.filter(p => arms(p._1) == arm)
      val n = rows.size.toDouble
      val x = rows.map(_._2).sum.toDouble
      val s = rows.map(_._3).sum.toDouble
      val ss = rows.map(t => t._3 * t._3).sum.toDouble
      (n, x, s, ss)
    }
    val (n0, x0, s0, ss0) = stats(0)
    val (n1, x1, s1, ss1) = stats(1)
    val pp = (x0 + x1) / (n0 + n1)
    val z = (x1 / n1 - x0 / n0) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    def varCents(n: Double, s: Double, ss: Double) = (ss * n - s * s) / (n * (n - 1.0))
    val t = (s1 / n1 / 100.0 - s0 / n0 / 100.0) /
      math.sqrt(varCents(n0, s0, ss0) / 10000.0 / n0 + varCents(n1, s1, ss1) / 10000.0 / n1)
    val r = StatsQueries.q149_ab_test(spark, dir).collect().head
    assert(r.getLong(0) == n0.toLong && r.getLong(1) == n1.toLong)
    assert(r.getLong(2) == x0.toLong && r.getLong(3) == x1.toLong)
    assert(math.abs(r.getAs[Double]("z_conv") - z) < 1e-9, s"z: got ${r.getAs[Double]("z_conv")} want $z")
    assert(math.abs(r.getAs[Double]("t_welch") - t) < 1e-9, s"t: got ${r.getAs[Double]("t_welch")} want $t")
  }

  test("q246 Mann–Whitney z and AUC equal a brute-force all-pairs recount") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._2 == "purchase").map(e => centsOf(e._3)).sum)
    }.toVector
    val arms = {
      val sp = spark
      import sp.implicits._
      perUser.map(_._1).toDF("user_id")
        .select(col("user_id"),
          graft.functions.Determinism.hash60(col("user_id").cast("string")).as("h"))
        .collect().map(r => r.getLong(0) -> (((r.getLong(1) % 2) + 2) % 2)).toMap
    }
    val a0 = perUser.filter(p => arms(p._1) == 0L).map(_._2)
    val a1 = perUser.filter(p => arms(p._1) == 1L).map(_._2)
    // the DEFINITION, not the rank identity: doubled U over all pairs
    var u2 = 0L
    for (x <- a1; y <- a0) u2 += (if (x > y) 2L else if (x == y) 1L else 0L)
    val n0 = a0.size.toLong
    val n1 = a1.size.toLong
    val tie3 = (a0 ++ a1).groupBy(identity).values
      .map { g => val t = g.size.toLong; t * t * t - t }.sum
    val nd = (n0 + n1).toDouble
    val z = (u2 - n0 * n1).toDouble /
      (2.0 * math.sqrt(n0.toDouble * n1.toDouble
        * (nd * nd * nd - nd - tie3.toDouble)
        / (12.0 * nd * (nd - 1.0))))
    val auc = u2.toDouble / (2.0 * n0.toDouble * n1.toDouble)
    val r = StatsQueries.q246_mann_whitney(spark, dir).collect().head
    assert(r.getLong(0) == n0 && r.getLong(1) == n1)
    assert(math.abs(r.getAs[Double]("z_u") - z) < 1e-12,
      s"z_u: got ${r.getAs[Double]("z_u")} want $z")
    assert(math.abs(r.getAs[Double]("auc") - auc) < 1e-12,
      s"auc: got ${r.getAs[Double]("auc")} want $auc")
    // sanity: AUC is a probability, and its complement mirrors a swap of arms
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("q252 median-test cells equal a sorted-values recount; chi2 consistent") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), centsOf(r.getDouble(1))))
    val sorted = ev.map(_._2).sorted
    val n = sorted.length
    val med2 = sorted((n - 1) / 2) + sorted(n / 2) // lo + hi middle elements
    val cells = ev.filter(e => 2 * e._2 != med2)
      .groupBy(e => (e._1, if (2 * e._2 > med2) "above" else "below"))
      .map { case (k, v) => k -> v.size.toLong }
    val rows = StatsQueries.q252_median_test(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(key), s"obs mismatch at $key")
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == cells.keySet)
    // chi2 equals the textbook recount over the same cells
    val tot = cells.values.sum.toDouble
    val rts = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum.toDouble }
    val cts = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum.toDouble }
    val chi2 = cells.map { case ((s, b), o) =>
      val e = rts(s) * cts(b) / tot
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(rows.head.getAs[Double]("chi2") - chi2) < 1e-5,
      s"chi2: got ${rows.head.getAs[Double]("chi2")} want $chi2")
  }

  test("q262 Kruskal–Wallis H equals a classical midrank recount") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), centsOf(r.getDouble(1))))
    // classical definition: midranks over the pooled sorted values
    val sorted = ev.map(_._2).sorted
    val n = sorted.length
    val rankOf: Map[Long, Double] = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    val groups = ev.groupBy(_._1)
    val nd = n.toDouble
    val h = 12.0 / (nd * (nd + 1.0)) * groups.values.map { g =>
      val rbar = g.map(e => rankOf(e._2)).sum / g.length
      g.length.toDouble * (rbar - (nd + 1.0) / 2.0) * (rbar - (nd + 1.0) / 2.0)
    }.sum
    val tie3 = ev.map(_._2).groupBy(identity).values
      .map { g => val t = g.size.toLong; (t * t * t - t).toDouble }.sum
    val hTie = h / (1.0 - tie3 / (nd * nd * nd - nd))
    val rows = StatsQueries.q262_kruskal_wallis(spark, dir).collect()
    assert(rows.length == groups.size)
    rows.foreach { r =>
      assert(r.getLong(1) == groups(r.getString(0)).length.toLong,
        s"n_g mismatch for ${r.getString(0)}")
    }
    // the gate's H sums decq-quantized (1e-6-floored) contributions:
    // within k·1e-6 of the classical statistic
    val k = groups.size
    assert(math.abs(rows.head.getAs[Double]("h") - h) <= k * 1e-6 + 1e-12,
      s"h: got ${rows.head.getAs[Double]("h")} want $h")
    assert(math.abs(rows.head.getAs[Double]("h_tie") - hTie) <= (k * 1e-6) * 2 + 1e-12,
      s"h_tie: got ${rows.head.getAs[Double]("h_tie")} want $hTie")
    assert(rows.head.getAs[Long]("dof") == (k - 1).toLong)
    // the contribution envelope that readmitted the test (r13 rejected
    // the RAW rank-square form for int64 overflow): each normalized
    // term is ≤ H ≤ N−1, far inside decq's 9.2e12 @1e-6 edge
    assert(rows.map(_.getAs[Double]("contrib")).forall(c => c >= 0 && c <= nd))
  }

  test("q263 streaming Kruskal–Wallis is bit-identical to batch q262 (pairing #78)") {
    val batch = StatsQueries.q262_kruskal_wallis(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q263_stream_kruskal_wallis(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q264 KS statistic equals a classical two-ECDF recount") {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, es) =>
        (u, es.filter(_._2 == "purchase").map(e => centsOf(e._3)).sum)
      }.toVector
    // arm assignment via the SAME hash the query uses (portable md5-60)
    val arms = {
      val sp = spark
      import sp.implicits._
      perUser.map(_._1).toDF("user_id")
        .select(col("user_id"),
          graft.functions.Determinism.hash60(col("user_id").cast("string")).as("h"))
        .collect().map(r => r.getLong(0) -> (((r.getLong(1) % 2) + 2) % 2)).toMap
    }
    val a0 = perUser.filter(p => arms(p._1) == 0L).map(_._2).sorted
    val a1 = perUser.filter(p => arms(p._1) == 1L).map(_._2).sorted
    val (n0, n1) = (a0.size.toLong, a1.size.toLong)
    // classical definition: D = sup over the pooled support of the
    // ECDF gap; exact integer numerator n1·F0·n0 − n0·F1·n1
    val gaps = (a0 ++ a1).distinct.sorted.map { v =>
      (v, math.abs(n1 * a0.count(_ <= v) - n0 * a1.count(_ <= v)))
    }
    val dnum = gaps.map(_._2).max
    val d = dnum.toDouble / (n0.toDouble * n1.toDouble)
    val ks = math.sqrt(n0.toDouble * n1.toDouble / (n0.toDouble + n1.toDouble)) * d
    val atC = gaps.filter(_._2 == dnum).map(_._1).min
    val row = StatsQueries.q264_ks_test(spark, dir).collect().head
    assert(row.getAs[Long]("n0") == n0, s"n0: got ${row.getAs[Long]("n0")} want $n0")
    assert(row.getAs[Long]("n1") == n1, s"n1: got ${row.getAs[Long]("n1")} want $n1")
    // d is a single division of the same exact integers — bit-equal
    assert(row.getAs[Double]("d") == d, s"d: got ${row.getAs[Double]("d")} want $d")
    assert(math.abs(row.getAs[Double]("ks") - ks) < 1e-12,
      s"ks: got ${row.getAs[Double]("ks")} want $ks")
    assert(row.getAs[Long]("at_c") == atC,
      s"at_c: got ${row.getAs[Long]("at_c")} want $atC")
  }

  test("q265 streaming KS is bit-identical to batch q264 (pairing #79)") {
    val batch = StatsQueries.q264_ks_test(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q265_stream_ks_test(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q266 Spearman rho equals a classical Pearson-on-midranks recount") {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).toVector.map { case (_, es) =>
        // toVector FIRST: mapping a Map to (x, y) pairs would re-key
        // (and silently dedup) by x
        (es.length.toLong,
          es.filter(_._2 == "purchase").map(e => centsOf(e._3)).sum)
      }
    // classical midranks over each marginal
    def midranks(vs: Vector[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    }
    val mrx = midranks(perUser.map(_._1))
    val mry = midranks(perUser.map(_._2))
    val rxs = perUser.map(p => mrx(p._1))
    val rys = perUser.map(p => mry(p._2))
    val n = perUser.length.toDouble
    val (mx, my) = (rxs.sum / n, rys.sum / n)
    val sxy = rxs.zip(rys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sxx = rxs.map(a => (a - mx) * (a - mx)).sum
    val syy = rys.map(b => (b - my) * (b - my)).sum
    val rho = sxy / (math.sqrt(sxx) * math.sqrt(syy))
    val row = StatsQueries.q266_spearman(spark, dir).collect().head
    assert(row.getAs[Long]("n") == perUser.length.toLong)
    // the gate's moments are exact ints of DOUBLED ranks: 4× the
    // classical float moments (doubling cancels in rho)
    assert(math.abs(row.getAs[Double]("sxy") - 4.0 * sxy) < 1e-6 * math.abs(4.0 * sxy) + 1e-6,
      s"sxy: got ${row.getAs[Double]("sxy")} want ${4.0 * sxy}")
    assert(math.abs(row.getAs[Double]("rho") - rho) < 1e-12,
      s"rho: got ${row.getAs[Double]("rho")} want $rho")
  }

  test("q267 streaming Spearman is bit-identical to batch q266 (pairing #80)") {
    val batch = StatsQueries.q266_spearman(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q267_stream_spearman(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q274 Wilcoxon signed-rank equals a classical midrank recount") {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3)))
      .groupBy(_._1).toVector.map { case (_, es) =>
        def half(par: Long) = es.filter { e =>
          val micros = Math.floorDiv(e._4.getTime, 1000L) * 1000000L +
            e._4.getNanos / 1000L
          e._2 == "purchase" && Math.floorDiv(micros, 86400000000L) % 2 == par
        }.map(e => centsOf(e._3)).sum
        half(0L) - half(1L)
      }.filter(_ != 0L)
    val n = perUser.length
    val sortedAbs = perUser.map(math.abs).sorted
    val rankOf: Map[Long, Double] = sortedAbs.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    val wPlus = perUser.filter(_ > 0).map(d => rankOf(math.abs(d))).sum
    val nd = n.toDouble
    val tie3 = perUser.map(math.abs).groupBy(identity).values
      .map { g => val t = g.size.toLong; (t * t * t - t).toDouble }.sum
    val z = (wPlus - nd * (nd + 1.0) / 4.0) /
      math.sqrt(nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0 - tie3 / 48.0)
    val rb = (4.0 * wPlus - nd * (nd + 1.0)) / (nd * (nd + 1.0))
    val row = StatsQueries.q274_wilcoxon(spark, dir).collect().head
    assert(row.getAs[Long]("np") == perUser.count(_ > 0).toLong)
    assert(row.getAs[Long]("nm") == perUser.count(_ < 0).toLong)
    assert(math.abs(row.getAs[Double]("z_w") - z) < 1e-10,
      s"z: got ${row.getAs[Double]("z_w")} want $z")
    assert(math.abs(row.getAs[Double]("rb") - rb) < 1e-12,
      s"rb: got ${row.getAs[Double]("rb")} want $rb")
  }

  test("q275 streaming Wilcoxon is bit-identical to batch q274 (pairing #86)") {
    val batch = StatsQueries.q274_wilcoxon(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q275_stream_wilcoxon(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q253 streaming median test is bit-identical to batch q252 (pairing #69)") {
    val batch = StatsQueries.q252_median_test(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q253_stream_median_test(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q150 chi-square equals the naive contingency recomputation; margins consistent") {
    val rows = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val obs = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toDouble
    val rt = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val ct = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val naiveChi2 = obs.map { case ((s, p), o) =>
      val e = rt(s) * ct(p) / n
      (o - e) * (o - e) / e
    }.sum
    val got = StatsQueries.q150_chi_square(spark, dir).collect()
    assert(got.length == obs.size)
    val chi2 = got.head.getAs[Double]("chi2")
    assert(math.abs(chi2 - naiveChi2) < 1e-4, s"chi2 got $chi2 want $naiveChi2")
    assert(got.head.getAs[Long]("dof") == (rt.size - 1).toLong * (ct.size - 1))
    got.foreach { r =>
      assert(r.getAs[Long]("obs") == obs((r.getString(0), r.getString(1))))
    }
  }

  test("q151 digit counts equal a string-derived recount; shares sum to ~1") {
    val prices = Tables.lineitem(spark, dir).select(col("l_extendedprice"))
      .collect().map(r => centsOf(r.getDouble(0)))
    val want = prices.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    val got = StatsQueries.q151_benford(spark, dir).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("obs") == want(r.getInt(0).toLong),
        s"digit ${r.getInt(0)}")
    }
    assert(math.abs(got.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-12)
    // Benford expectation shares are a (near-)distribution
    assert(math.abs(got.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-9)
  }

  test("q152 expectations: FK and PK checks equal set-based recounts; all checks present") {
    val got = StatsQueries.q152_expectations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got.size == 12)
    val custKeys = Tables.customer(spark, dir).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    val ordKeys = Tables.orders(spark, dir).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val ordCust = Tables.orders(spark, dir).select(col("o_custkey"))
      .collect().map(_.getLong(0))
    val liOrd = Tables.lineitem(spark, dir).select(col("l_orderkey"))
      .collect().map(_.getLong(0))
    val ordKeySet = ordKeys.toSet
    assert(got(("orders", "fk_customer"))._1 == ordCust.count(!custKeys(_)))
    assert(got(("lineitem", "fk_orders"))._1 == liOrd.count(!ordKeySet(_)))
    assert(got(("orders", "pk_unique"))._1 == (ordKeys.length - ordKeySet.size).toLong)
    // totals carry the right table sizes
    assert(got(("orders", "pk_unique"))._2 == ordKeys.length.toLong)
    assert(got(("lineitem", "fk_orders"))._2 == liOrd.length.toLong)
    // pass flag is exactly violations == 0
    StatsQueries.q152_expectations(spark, dir).collect().foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(2) == 0L))
    }
  }

  test("q153 skew stats for events.user_id equal a sorted-counts recount") {
    val counts = Tables.events(spark, dir).select(col("user_id"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.size.toLong).toVector.sorted
    val nKeys = counts.size
    def pctl(p: Int): Long = counts((p * nKeys + 99) / 100 - 1)
    val r = StatsQueries.q153_skew_profile(spark, dir)
      .filter(col("col_name") === "events.user_id").collect().head
    assert(r.getAs[Long]("n_keys") == nKeys.toLong)
    assert(r.getAs[Long]("rows") == counts.sum)
    assert(r.getAs[Long]("max_cnt") == counts.max)
    assert(r.getAs[Long]("p50_cnt") == pctl(50))
    assert(r.getAs[Long]("p90_cnt") == pctl(90))
    assert(r.getAs[Long]("p99_cnt") == pctl(99))
    val avg = counts.sum.toDouble / nKeys
    assert(math.abs(r.getAs[Double]("max_over_avg") - counts.max / avg) < 1e-9)
  }

  test("q209 streaming chi-square is bit-identical to batch q150 (pairing #29)") {
    val batch = StatsQueries.q150_chi_square(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q209_stream_chi_square(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q210 streaming Benford is bit-identical to batch q151 (pairing #30)") {
    val batch = StatsQueries.q151_benford(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q210_stream_benford(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q216 streaming k-anonymity is bit-identical to batch q177 (pairing #36)") {
    val batch = StatsQueries.q177_k_anonymity(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q216_stream_k_anonymity(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }
}
