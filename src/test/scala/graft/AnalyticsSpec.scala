package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.{AnalyticsQueries, EventQueries}
import graft.functions.Determinism._

/** Brute-force recounts + plan-shape guards for the round-8 analytics
  * family (q115–q121). Value-level cross-engine verification runs
  * through the DuckDB gate; these specs re-derive the semantics a
  * second way in local Scala so a same-bug-both-sides oracle slip
  * can't hide.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  test("q115 trailing-7-day distinct equals a per-day brute-force recount") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSeq
    val got = AnalyticsQueriesSpecHelper.rows(
      EventQueries.q115_sliding_distinct(spark, dir),
      r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = events.map(_._2).distinct
    val want = days.sorted.map { end =>
      val lo = end.minusDays(6)
      end -> events.filter { case (_, d) =>
        !d.isBefore(lo) && !d.isAfter(end)
      }.map(_._1).distinct.size.toLong
    }
    assert(got == want)
  }

  test("q116 inter-arrival buckets equal a per-user brute-force recount") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val want = events.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._4, e._2)).sliding(2).collect {
        case Seq(a, b) => (b._3, java.lang.Long.toBinaryString(b._4 - a._4).length.toLong)
      }
    }.groupBy(identity).map { case ((t, b), g) => (t, b, g.size.toLong) }
      .toSeq.sorted
    val got = AnalyticsQueriesSpecHelper.rows(
      EventQueries.q116_interarrival_hist(spark, dir),
      r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == want)
  }

  test("q117 exact quantiles: brute-force sorted-rank recount + monotone p50<=p90<=p99") {
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), dec2(col("value")).as("v"))
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toSeq
    val want = vals.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val sorted = g.map(_._2).sorted((a: java.math.BigDecimal, b: java.math.BigDecimal) => a.compareTo(b))
      Seq(50L, 90L, 99L).map { p =>
        // ceil(p*n/100)-th smallest, 1-indexed — the query's integer rank rule
        val rank = ((p * sorted.size + 99) / 100).toInt
        (t, p, sorted(rank - 1).doubleValue)
      }
    }.sortBy(x => (x._1, x._2))
    val got = AnalyticsQueriesSpecHelper.rows(
      AnalyticsQueries.q117_exact_quantiles(spark, dir),
      r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == want)
    got.groupBy(_._1).values.foreach { g =>
      val byP = g.map(x => x._2 -> x._3).toMap
      assert(byP(50L) <= byP(90L) && byP(90L) <= byP(99L))
    }
  }

  test("q118 triangles: degree-oriented count equals a brute-force adjacency enumeration") {
    val os = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    os.groupBy(_._1).values.foreach { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- (i + 1) until ss.size) {
        val e = (ss(i), ss(j))
        support(e) = support.getOrElse(e, 0) + 1
      }
    }
    // NB: `support.collect { case (e, c) => e }` would re-build a Map
    // (pairs collapse key-wise) — keep the keySet form.
    val edges = support.filter(_._2 >= 5).keySet.toSet
    assert(edges.nonEmpty, s"brute-force graph empty (supports: ${support.values.take(5)})")
    val nbrs = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2).toSet }
    val nation = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = edges.toSeq.flatMap { case (a, b) =>
      // a<b; c>b closing both — counts each triangle once at its min node a
      nbrs.getOrElse(a, Set.empty).intersect(nbrs.getOrElse(b, Set.empty))
        .filter(_ > b).toSeq.map(_ => nation(a))
    }.groupBy(identity).map { case (n, g) => (n, g.size.toLong) }.toSeq.sorted
    val got = AnalyticsQueriesSpecHelper.rows(
      AnalyticsQueries.q118_triangles(spark, dir)
        .select(col("s_nationkey").cast("long"), col("n_tri")),
      r => (r.getLong(0), r.getLong(1)))
    assert(got == want)
  }

  test("q119 profile: approx_count_distinct (the 100 TB swap-in) lands within 5% of each exact distinct") {
    val exact = AnalyticsQueries.q119_profile(spark, dir)
      .filter(col("metric") === "distinct")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val approx = Tables.documents(spark, dir).agg(
      approx_count_distinct(col("doc_id")).as("doc_id"),
      approx_count_distinct(col("text")).as("text"),
      approx_count_distinct(col("lang")).as("lang"),
      approx_count_distinct(col("source")).as("source"),
      approx_count_distinct(col("n_chars")).as("n_chars")).collect()(0)
    Seq("doc_id", "text", "lang", "source", "n_chars").foreach { c =>
      val a = approx.getAs[Long](c).toDouble
      val e = exact(c).toDouble
      assert(math.abs(a - e) <= 0.05 * e + 2, s"$c: approx $a vs exact $e")
    }
  }

  test("q119 profile: every emitted metric equals a brute-force recount") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect()
    def nn(i: Int) = docs.filter(!_.isNullAt(i))
    val want: Map[(String, String), Long] = Map(
      ("_table", "rows") -> docs.length.toLong,
      ("doc_id", "nulls") -> docs.count(_.isNullAt(0)).toLong,
      ("doc_id", "distinct") -> nn(0).map(_.getLong(0)).distinct.length.toLong,
      ("text", "nulls") -> docs.count(_.isNullAt(1)).toLong,
      ("text", "distinct") -> nn(1).map(_.getString(1)).distinct.length.toLong,
      ("text", "min_len") -> nn(1).map(_.getString(1).length).min.toLong,
      ("text", "max_len") -> nn(1).map(_.getString(1).length).max.toLong,
      ("lang", "nulls") -> docs.count(_.isNullAt(2)).toLong,
      ("lang", "distinct") -> nn(2).map(_.getString(2)).distinct.length.toLong,
      ("source", "nulls") -> docs.count(_.isNullAt(3)).toLong,
      ("source", "distinct") -> nn(3).map(_.getString(3)).distinct.length.toLong,
      ("n_chars", "nulls") -> docs.count(_.isNullAt(4)).toLong,
      ("n_chars", "distinct") -> nn(4).map(_.getLong(4)).distinct.length.toLong,
      ("n_chars", "min") -> nn(4).map(_.getLong(4)).min,
      ("n_chars", "max") -> nn(4).map(_.getLong(4)).max,
      ("n_chars", "sum") -> nn(4).map(_.getLong(4)).sum)
    val got = AnalyticsQueries.q119_profile(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("q120 pivot: per-cell counts and sums equal a brute-force recount") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val evs = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"), dec2(col("value")).as("v"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getDecimal(2)))
    val byDay = evs.groupBy(_._1)
    val got = AnalyticsQueries.q120_pivot_wide(spark, dir).collect()
    assert(got.map(_.getDate(0).toLocalDate).toSeq == byDay.keySet.toSeq.sorted)
    got.foreach { r =>
      val cell = byDay(r.getDate(0).toLocalDate)
      types.foreach { t =>
        val slice = cell.filter(_._2 == t)
        assert(r.getAs[Long](s"${t}_n") == slice.length.toLong, s"$t count")
        val wantAmt = if (slice.isEmpty) None
          else Some(slice.map(_._3).reduce(_ add _).doubleValue)
        val gotAmt = if (r.isNullAt(r.fieldIndex(s"${t}_amt"))) None
          else Some(r.getAs[Double](s"${t}_amt"))
        assert(gotAmt == wantAmt, s"$t amount")
      }
    }
  }

  test("q124 streaming snapshot is bit-identical to the q121 batch compaction") {
    val batch = AnalyticsQueries.q121_latest_snapshot(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q124_stream_snapshot(spark, dir).collect().toSeq
    assert(stream == batch)
  }

  test("q121 snapshot: struct-max agg equals the window row_number form, and plans no Window") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"), col("event_id").as("last_event"),
        col("event_type").as("last_type"), dec2(col("value")).cast("double").as("last_value"))
      .orderBy(col("user_id"))
    val got = AnalyticsQueries.q121_latest_snapshot(spark, dir)
    assert(got.collect().toSeq == viaWindow.collect().toSeq)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), "compaction must aggregate, not sort-and-rank")
    // the agg must run in two phases (map-side partial before the
    // exchange) — that is the operator's whole scale claim
    val phys = got.queryExecution.executedPlan.toString
    assert(phys.contains("partial_max"),
      s"no map-side partial max phase in:\n$phys")
  }
  // ---- round-9 additions (q125–q130) --------------------------------

  /** Shared brute-force event replay: (user, type, cents, ts_us, id)
    * sorted the way every windowed query orders (ts, event_id).
    */
  private lazy val evReplay: Seq[(Long, String, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(4) * 100 + 0.5).toLong, r.getLong(2), r.getLong(3)))

  test("q125 SCD2 intervals equal a per-key compress-and-stitch replay") {
    val want = evReplay.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((u, t), es) =>
      val ordered = es.sortBy(e => (e._4, e._5))
      // change compression
      val changes = ordered.foldLeft(Vector.empty[(Long, Long)]) { (acc, e) =>
        if (acc.nonEmpty && acc.last._1 == e._3) acc else acc :+ (e._3, e._4)
      }
      // interval stitching
      changes.zipWithIndex.map { case ((cents, from), i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._2) else None
        (u, t, cents.toDouble / 100.0, from, to, to.isEmpty)
      }
    }.sortBy(x => (x._1, x._2, x._4))
    val got = AnalyticsQueriesSpecHelper.rows(
      AnalyticsQueries.q125_scd2(spark, dir),
      r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000,
        Option(r.getTimestamp(4)).map(t => t.getTime * 1000 + t.getNanos / 1000 % 1000),
        r.getBoolean(5)))
    assert(got == want)
  }

  test("q125 plans ONE hash exchange: compression and stitching windows share it") {
    val phys = AnalyticsQueries.q125_scd2(spark, dir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(phys).size
    assert(hashExchanges == 1,
      s"expected the two windows to share one hash exchange, found $hashExchanges in:\n$phys")
    assert("Window".r.findAllIn(phys).size >= 2, "both window phases must be present")
  }

  test("q126 EWMA equals a per-user integer-weight replay, bit-for-bit") {
    val weights = EventQueries.ewmaWeights
    val want = evReplay.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._4, e._5))
      var window = List.empty[Long]
      ordered.map { e =>
        window = (window :+ e._3).takeRight(10)
        var num = 0L; var den = 0L
        window.zipWithIndex.foreach { case (c, i) =>
          val w = weights(window.length - 1 - i); num += c * w; den += w
        }
        (u, e._5, e._4,
          java.lang.Double.doubleToLongBits(num.toDouble / (den * 100).toDouble))
      }
    }.sortBy(x => (x._1, x._3, x._2))
    val got = AnalyticsQueriesSpecHelper.rows(
      EventQueries.q126_ewma(spark, dir),
      r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
    assert(got == want)
  }

  test("q130 streaming EWMA is bit-identical to the q126 batch smoother") {
    val batch = EventQueries.q126_ewma(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q130_stream_ewma(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q133 closed-form CUSUM equals the sequential max(0, S+d) recursion, bit-for-bit") {
    // the query computes S_t = cum_t - min(0, running_min(cum)); this
    // replay runs Page's literal recursion — equality proves the
    // prefix-decomposition that makes CUSUM a window aggregate
    val byType = evReplay.groupBy(_._2)
    val mu = byType.map { case (t, es) =>
      val sum = es.map(_._3).sum; val n = es.size
      t -> (2 * sum + n) / (2 * n)
    }
    val want = byType.toSeq.flatMap { case (t, es) =>
      var s = 0L
      es.sortBy(e => (e._4, e._5)).map { e =>
        val d = e._3 - mu(t) - 100L
        s = math.max(0L, s + d)
        (t, e._5, java.lang.Double.doubleToLongBits(s.toDouble / 100.0), s > 50000L)
      }
    }.sortBy(x => (x._1, x._2))
    val got = AnalyticsQueriesSpecHelper.rows(
      AnalyticsQueries.q133_cusum(spark, dir),
      r => (r.getString(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r.getBoolean(4)))
      .sortBy(x => (x._1, x._2))
    assert(got == want)
  }

  test("q134 streaming CUSUM is bit-identical to the q133 batch closed form") {
    val batch = AnalyticsQueries.q133_cusum(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q134_stream_cusum(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q188 streaming retention is bit-identical to batch q112 (pairing #15)") {
    val batch = graft.queries.EventQueries.q112_cohort_retention(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q188_stream_retention(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q191 streaming journey automata are bit-identical to batch q190 regex counts (pairing #16)") {
    val batch = graft.queries.EventQueries.q190_journey_patterns(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q191_stream_journeys(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q194 streaming overlap is bit-identical to batch q187 (pairing #17)") {
    val batch = graft.queries.EventQueries.q187_kmv_overlap(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q194_stream_overlap(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q195 streaming Theil-Sen is bit-identical to batch q193 (pairing #18)") {
    val batch = graft.queries.TimeSeriesQueries.q193_theil_sen(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q195_stream_theil_sen(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q197 streaming timed conversions are bit-identical to batch q196 (pairing #19)") {
    val batch = graft.queries.EventQueries.q196_timed_conversion(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q197_stream_timed_conversion(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q207 streaming Neyman allocation is bit-identical to batch q205 (pairing #27)") {
    val batch = graft.queries.TextQueries.q205_neyman_sample(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q207_stream_neyman(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q208 streaming quantile normalization is bit-identical to batch q206 (pairing #28)") {
    val batch = graft.queries.TextQueries.q206_quantile_normalize(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q208_stream_quantile_normalize(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q225 streaming clustering coefficient is bit-identical to batch q186 (pairing #45)") {
    val batch = graft.queries.AnalyticsQueries.q186_clustering_coeff(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q225_stream_clustering_coeff(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q241 streaming unpivot is bit-identical to batch q148 (pairing #61)") {
    val batch = graft.queries.ReportQueries.q148_unpivot(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q241_stream_unpivot(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q242 streaming snapshot diff is bit-identical to batch q183 (pairing #62)") {
    val batch = graft.queries.AnalyticsQueries.q183_snapshot_diff(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q242_stream_snapshot_diff(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q240 streaming split census is bit-identical to batch q71 (pairing #60)") {
    val batch = graft.queries.TextQueries.q71_train_split(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q240_stream_train_split(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q239 streaming exact dedup is bit-identical to batch q43 (pairing #59)") {
    val batch = graft.queries.TextQueries.q43_dedup_exact(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q239_stream_dedup_exact(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q235 streaming rollup is bit-identical to batch q33 (pairing #55)") {
    val batch = graft.queries.RelationalQueries.q33_rollup(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q235_stream_rollup(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q236 streaming cube is bit-identical to batch q96 (pairing #56)") {
    val batch = graft.queries.RelationalQueries.q96_cube(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q236_stream_cube(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q237 streaming grouping sets are bit-identical to batch q141 (pairing #57)") {
    val batch = graft.queries.ReportQueries.q141_grouping_sets(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q237_stream_grouping_sets(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q233 streaming set reconcile is bit-identical to batch q136 (pairing #53)") {
    val batch = graft.queries.AnalyticsQueries.q136_set_reconcile(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q233_stream_set_reconcile(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q234 streaming wide pivot is bit-identical to batch q120 (pairing #54)") {
    val batch = graft.queries.AnalyticsQueries.q120_pivot_wide(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q234_stream_pivot_wide(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q231 streaming sketch-distinct audit is bit-identical to batch q58 (pairing #51)") {
    val batch = graft.queries.EventQueries.q58_sketch_distinct(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q231_stream_sketch_distinct(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q232 streaming SCD2 build is bit-identical to batch q125 (pairing #52)") {
    val batch = graft.queries.AnalyticsQueries.q125_scd2(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q232_stream_scd2(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q230 streaming triangle count is bit-identical to batch q118 (pairing #50)") {
    val batch = graft.queries.AnalyticsQueries.q118_triangles(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q230_stream_triangles(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q273 streaming HITS is bit-identical to batch q272 (pairing #85)") {
    val batch = graft.queries.AnalyticsQueries.q272_hits(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q273_stream_hits(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q226 streaming PageRank is bit-identical to batch q189 (pairing #46)") {
    val batch = graft.queries.AnalyticsQueries.q189_pagerank_iter(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q226_stream_pagerank(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q213 streaming correlation matrix is bit-identical to batch q169 (pairing #33)") {
    val batch = graft.queries.AnalyticsQueries.q169_corr_matrix(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q213_stream_corr_matrix(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q198 streaming skew profile is bit-identical to batch q153 (pairing #20)") {
    val batch = graft.queries.StatsQueries.q153_skew_profile(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q198_stream_skew(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q201 streaming A/B readout is bit-identical to batch q149 (pairing #23)") {
    val batch = graft.queries.StatsQueries.q149_ab_test(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q201_stream_ab_test(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q247 streaming Mann–Whitney is bit-identical to batch q246 (pairing #65)") {
    val batch = graft.queries.StatsQueries.q246_mann_whitney(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q247_stream_mann_whitney(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q248 streaming cosine top-k is bit-identical to batch q50 (pairing #66)") {
    val batch = graft.queries.VectorQueries.q50_ann_topk(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q248_stream_ann_topk(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q251 streaming IVF top-k is bit-identical to batch q51 (pairing #68)") {
    val batch = graft.queries.VectorQueries.q51_ivf_topk(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q251_stream_ivf_topk(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q271 streaming semantic dedup is bit-identical to batch q86 (pairing #84)") {
    val batch = graft.queries.VectorQueries.q86_semdedup(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q271_stream_semdedup(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q282 streaming IVF+PQ serve is bit-identical to batch q166 (pairing #93)") {
    val batch = graft.queries.VectorQueries.q166_ivf_pq(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q282_stream_ivf_pq(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q254 streaming Zipf monitor is bit-identical to batch q100 (pairing #70)") {
    val batch = graft.queries.TextQueries.q100_zipf_slope(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q254_stream_zipf(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q255 streaming CMS heavy hitters are bit-identical to batch q59 (pairing #71)") {
    val batch = graft.queries.TextQueries.q59_heavy_hitters(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q255_stream_heavy_hitters(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q256 streaming PMI collocations are bit-identical to batch q104 (pairing #72)") {
    val batch = graft.queries.TextQueries.q104_pmi_collocations(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q256_stream_pmi(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q257 streaming vocab coverage is bit-identical to batch q79 (pairing #73)") {
    val batch = graft.queries.TextQueries.q79_vocab_coverage(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q257_stream_vocab_coverage(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q258 streaming tf-idf pairs are bit-identical to batch q105 (pairing #74)") {
    val batch = graft.queries.TextQueries.q105_tfidf_pairs(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q258_stream_tfidf_pairs(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q259 streaming bigram perplexity is bit-identical to batch q107 (pairing #75)") {
    val batch = graft.queries.TextQueries.q107_bigram_perplexity(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q259_stream_bigram_perplexity(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q268 streaming BM25 is bit-identical to batch q89 (pairing #81)") {
    val batch = graft.queries.TextQueries.q89_bm25(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q268_stream_bm25(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q269 streaming JS divergence is bit-identical to batch q101 (pairing #82)") {
    val batch = graft.queries.TextQueries.q101_js_divergence(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q269_stream_js_divergence(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q270 streaming decontamination is bit-identical to batch q75 (pairing #83)") {
    val batch = graft.queries.TextQueries.q75_decontaminate(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q270_stream_decontaminate(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q276 streaming MinHash-LSH pairs are bit-identical to batch q45 (pairing #87)") {
    val batch = graft.queries.TextQueries.q45_minhash_lsh_pairs(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q276_stream_minhash_pairs(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q277 streaming dedup clusters are bit-identical to batch q54 (pairing #88)") {
    val batch = graft.queries.TextQueries.q54_dedup_clusters(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q277_stream_dedup_clusters(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q278 streaming source overlap is bit-identical to batch q95 (pairing #89)") {
    val batch = graft.queries.TextQueries.q95_source_overlap(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q278_stream_source_overlap(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q279 streaming BPE pairs are bit-identical to batch q92 (pairing #90)") {
    val batch = graft.queries.TextQueries.q92_bpe_pairs(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q279_stream_bpe_pairs(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q280 streaming curation funnel is bit-identical to batch q99 (pairing #91)") {
    val batch = graft.queries.TextQueries.q99_funnel(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q280_stream_funnel(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q283 streaming mixture apply is bit-identical to batch q98 (pairing #94)") {
    val batch = graft.queries.TextQueries.q98_mixture_apply(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q283_stream_mixture_apply(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q281 streaming exact-quota mixture is bit-identical to batch q102 (pairing #92)") {
    val batch = graft.queries.TextQueries.q102_mixture_exact(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q281_stream_mixture_exact(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q260 streaming edit-distance pairs are bit-identical to batch q90 (pairing #76)") {
    val batch = graft.queries.TextQueries.q90_edit_pairs(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q260_stream_edit_pairs(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q261 streaming prefix-filter join is bit-identical to batch q127 (pairing #77)") {
    val batch = graft.queries.TextQueries.q127_prefix_join(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q261_stream_prefix_join(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q202 streaming session paths are bit-identical to batch q132 (pairing #24)") {
    val batch = graft.queries.EventQueries.q132_top_paths(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q202_stream_paths(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q129 drift profile equals a two-pass replay, and halves partition the data") {
    val rows = AnalyticsQueriesSpecHelper.rows(
      AnalyticsQueries.q129_profile_drift(spark, dir),
      r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val us = evReplay.map(_._4)
    val mid = (us.min + us.max) / 2
    val want = evReplay.groupBy(_._2).toSeq.map { case (t, es) =>
      val (o, n) = es.partition(_._4 < mid)
      (t, o.size.toLong, n.size.toLong,
        o.map(_._1).distinct.size.toLong, n.map(_._1).distinct.size.toLong)
    }.sortBy(_._1)
    assert(rows == want)
    assert(rows.map(r => r._2 + r._3).sum == evReplay.size)
  }
}

/** Tiny collect helpers kept out of the test bodies. */
object AnalyticsQueriesSpecHelper {
  def rows[T](df: org.apache.spark.sql.DataFrame, f: org.apache.spark.sql.Row => T): Seq[T] =
    df.collect().toSeq.map(f)
}
