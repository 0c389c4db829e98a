package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{ReportQueries, StreamQueries}

/** Brute-force recounts for the round-9 reporting/reconciliation
  * family (q137–q144) + the q143≡q140 batch-stream parity. The DuckDB
  * gate proves cross-engine value equality; these re-derive each
  * semantic a second, imperative way so a same-bug-both-sides oracle
  * slip can't hide.
  */
class ReportSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  private def centsOf(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  private def eventRows: Seq[(Long, Long, String, Long, java.time.LocalDate, Long)] =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDate(4).toLocalDate, centsOf(r.getDouble(5))))
      .toSeq

  test("q137 gap-fill equals a per-user LOCF replay over the full calendar") {
    val ev = eventRows
    val d0 = ev.map(_._5).min
    val d1 = ev.map(_._5).max
    val days = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toVector
    val daily: Map[(Long, java.time.LocalDate), Long] = ev
      .filter(_._3 == "purchase")
      .groupBy(e => (e._1, e._5))
      .map { case (k, es) => k -> es.map(_._6).sum }
    val want = ev.map(_._1).distinct.sorted.flatMap { u =>
      var lastVal: Option[Long] = None
      var lastDay: Option[java.time.LocalDate] = None
      days.map { day =>
        val obs = daily.get((u, day))
        obs.foreach { v => lastVal = Some(v); lastDay = Some(day) }
        (u, day,
          lastVal.map(_.toDouble / 100.0),
          if (obs.isDefined) 1 else 0,
          lastDay.map(ld => java.time.temporal.ChronoUnit.DAYS.between(ld, day)))
      }
    }
    val got = ReportQueries.q137_gap_fill(spark, dir).collect().toSeq.map { r =>
      (r.getLong(0), r.getDate(1).toLocalDate,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got == want)
  }

  test("q138 k-hop frontier equals an in-memory BFS over the same edges") {
    val edges = graft.operators.Triangles.cooccurrenceEdges(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")),
      "o", "p", minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val src = Tables.part(spark, dir)
      .filter(col("p_partkey") % 100 === 0)
      .collect().map(_.getLong(0)).toSet
    var dist = src.map(_ -> 0L).toMap
    var frontier = src
    for (h <- 1 to 4) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    val got = ReportQueries.q138_khop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == dist.toSeq.sortBy(_._1))
  }

  test("q139 median/MAD/outlier counts equal a sort-based recount") {
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val want = eventRows.groupBy(_._3).toSeq.map { case (t, es) =>
      val cs = es.map(_._6)
      val m2 = med2(cs)
      val ds = cs.map(c => math.abs(2 * c - m2))
      val a2 = med2(ds)
      (t, cs.size.toLong, m2, a2, cs.count(c => 2 * math.abs(2 * c - m2) > 3 * a2).toLong)
    }.sortBy(_._1)
    val got = ReportQueries.q139_mad_outliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("q140 last-touch attribution equals an imperative per-user replay") {
    val want = eventRows
      .groupBy(_._1).toSeq
      .flatMap { case (_, es) =>
        var ch = "direct"
        es.sortBy(e => (e._4, e._2)).flatMap { e =>
          if (e._3 != "purchase") { ch = e._3; None }
          else Some((ch, e._6))
        }
      }
      .groupBy(_._1).toSeq
      .map { case (ch, ps) => (ch, ps.size.toLong, ps.map(_._2).sum.toDouble / 100) }
      .sortBy(_._1)
    val got = ReportQueries.q140_attribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("q143 streaming attribution is bit-identical to batch q140") {
    val batch = ReportQueries.q140_attribution(spark, dir).collect().toSeq
    val stream = StreamQueries.q143_stream_attribution(spark, dir).collect().toSeq
    assert(stream == batch)
  }

  test("q200 streaming conversion lag is bit-identical to batch q146 (pairing #22)") {
    val batch = ReportQueries.q146_conversion_lag(spark, dir).collect().toSeq
    val stream = StreamQueries.q200_stream_conversion_lag(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q204 streaming MAD outliers are bit-identical to batch q139 (pairing #26)") {
    val batch = ReportQueries.q139_mad_outliers(spark, dir).collect().toSeq
    val stream = StreamQueries.q204_stream_mad(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q203 streaming gap-fill is bit-identical to batch q137 (pairing #25)") {
    val batch = ReportQueries.q137_gap_fill(spark, dir).collect().toSeq
    val stream = StreamQueries.q203_stream_gap_fill(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q141 grouping sets equal recounts at each of the three levels") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getString(1), centsOf(r.getDouble(2)))).toSeq
    def agg(gf: ((String, String, Long)) => (Option[String], Option[String])) =
      li.groupBy(gf).map { case ((rf, ls), es) =>
        (rf, ls, es.size.toLong, es.map(_._3).sum.toDouble / 100)
      }.toSet
    val want =
      agg(e => (Some(e._1), Some(e._2))).map { case (rf, ls, n, s) => (rf, ls, 0L, 0L, n, s) } ++
      agg(e => (Some(e._1), None)).map { case (rf, ls, n, s) => (rf, ls, 0L, 1L, n, s) } ++
      agg(_ => (None, None)).map { case (rf, ls, n, s) => (rf, ls, 1L, 1L, n, s) }
    val got = ReportQueries.q141_grouping_sets(spark, dir).collect().map { r =>
      (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    }.toSet
    assert(got == want)
  }

  test("q142 flags exactly the buckets containing the lost replica slice") {
    val keys = Tables.lineitem(spark, dir).select(col("l_orderkey"))
      .collect().map(_.getLong(0)).toSeq
    val lostBuckets = keys.filter(_ % 997 == 13).map(_ % 64).toSet
    val got = ReportQueries.q142_bucket_diff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(5))).toSeq
    assert(got.map(_._1) == (0L until 64L))
    val flagged = got.filter(_._4 == 1).map(_._1).toSet
    assert(flagged == lostBuckets)
    // count deltas localize the loss: per flagged bucket, n_primary -
    // n_replica equals the number of lost keys hashing there
    val lostPerBucket = keys.filter(_ % 997 == 13).groupBy(_ % 64).view.mapValues(_.size.toLong).toMap
    got.foreach { case (b, np, nr, _) =>
      assert(np - nr == lostPerBucket.getOrElse(b, 0L), s"bucket $b")
    }
  }

  test("q145 top-20 rules equal a brute-force support/confidence/lift recount") {
    val os = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nOrders = os.map(_._1).distinct.size.toLong
    val sup = os.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairSup = os.groupBy(_._1).values.toSeq
      .flatMap { es =>
        val ps = es.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3L)
    val rules = pairSup.toSeq.flatMap { case ((a, b), sab) =>
      Seq((a, b, sab, sup(a), sup(b)), (b, a, sab, sup(b), sup(a)))
    }.map { case (ant, cons, sab, sa, sb) =>
      (ant, cons, sab, sab.toDouble / sa, (sab.toDouble * nOrders) / (sa.toDouble * sb))
    }
    val want = rules.sortBy { case (ant, cons, _, _, lift) => (-lift, ant, cons) }.take(20)
    val got = ReportQueries.q145_assoc_rules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("q146 conversion-lag quantiles equal a sort-based per-weekday recount") {
    val ev = eventRows
    val lags = ev.filter(_._3 == "view").groupBy(_._1).toSeq.flatMap { case (u, vs) =>
      val vUs = vs.map(_._4).min
      val ps = ev.filter(e => e._1 == u && e._3 == "purchase" && e._4 > vUs)
      if (ps.isEmpty) None
      else {
        val dow = java.time.Instant.ofEpochSecond(Math.floorDiv(vUs, 1000000L))
          .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue % 7 // Mon=1..Sun=7 -> Sun=0
        Some((dow.toLong, (ps.map(_._4).min - vUs) / 1000000L))
      }
    }
    val want = lags.groupBy(_._1).toSeq.flatMap { case (dow, es) =>
      val s = es.map(_._2).sorted
      val n = s.size.toLong
      Seq(50L, 90L, 99L).map(p => (dow, p, s(((p * n + 99) / 100).toInt - 1), n))
    }.sortBy(t => (t._1, t._2))
    val got = ReportQueries.q146_conversion_lag(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("q147 weighted median equals a sorted cumulative-mass recount") {
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), centsOf(r.getDouble(1)), centsOf(r.getDouble(2)))).toSeq
    val want = rows.groupBy(_._1).toSeq.map { case (rf, es) =>
      val sorted = es.map(e => (e._2, e._3)).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val tw = sorted.map(_._2).sum
      def at(target: Long): Long = {
        var cum = 0L
        sorted.find { case (_, w) => cum += w; cum >= target }.get._1
      }
      (rf, at((tw + 1) / 2) + at((tw + 2) / 2), tw)
    }.sortBy(_._1)
    val got = ReportQueries.q147_weighted_median(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("q148 unpivot round-trips the per-(user, type) totals") {
    val want = eventRows.groupBy(e => (e._1, e._3)).view
      .mapValues(_.map(_._6).sum).toMap
    val got = ReportQueries.q148_unpivot(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val users = eventRows.map(_._1).distinct
    assert(got.size == users.size * 5, "every user emits all five type rows")
    got.foreach { case (u, t, total) =>
      assert(total == want.getOrElse((u, t), 0L).toDouble / 100, s"($u, $t)")
    }
  }

  test("q144 gini equals the pairwise mean-absolute-difference form, bit for bit") {
    val rows = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), centsOf(r.getDouble(1)))).toSeq
    val want = rows.groupBy(_._1).toSeq.map { case (rn, es) =>
      val xs = es.map(_._2)
      val n = BigInt(xs.size)
      val sx = xs.map(BigInt(_)).sum
      val pairSum = (for (a <- xs; b <- xs) yield BigInt((a - b).abs)).sum
      // rank identity: 2*(s2 - (n+1)sx) = pairSum, so the query's
      // numerator is exactly pairSum/2 — same integer, same IEEE cast
      (rn, xs.size.toLong, (pairSum / 2).toDouble / (sx * n).toDouble)
    }.sortBy(_._1)
    val got = ReportQueries.q144_gini(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("q238 streaming bucket diff is bit-identical to batch q142 (pairing #58)") {
    val batch = ReportQueries.q142_bucket_diff(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q238_stream_bucket_diff(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q227 streaming association rules are bit-identical to batch q145 (pairing #47)") {
    val batch = ReportQueries.q145_assoc_rules(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q227_stream_assoc_rules(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q228 streaming item-item CF is bit-identical to batch q174 (pairing #48)") {
    val batch = ReportQueries.q174_item_cf(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q228_stream_item_cf(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q245 streaming bounded SSSP is bit-identical to batch q244 (pairing #64)") {
    val batch = ReportQueries.q244_sssp(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q245_stream_sssp(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q250 streaming k-core is bit-identical to batch q249 (pairing #67)") {
    val batch = ReportQueries.q249_kcore(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q250_stream_kcore(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q229 streaming k-hop BFS is bit-identical to batch q138 (pairing #49)") {
    val batch = ReportQueries.q138_khop(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q229_stream_khop(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q224 streaming component census is bit-identical to batch q180 (pairing #44)") {
    val batch = ReportQueries.q180_component_census(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q224_stream_component_census(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q223 streaming share-of-parent is bit-identical to batch q176 (pairing #43)") {
    val batch = ReportQueries.q176_share_of_parent(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q223_stream_share_of_parent(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q212 streaming weighted median is bit-identical to batch q147 (pairing #32)") {
    val batch = ReportQueries.q147_weighted_median(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q212_stream_weighted_median(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q211 streaming Gini is bit-identical to batch q144 (pairing #31)") {
    val batch = ReportQueries.q144_gini(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q211_stream_gini(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }
}
