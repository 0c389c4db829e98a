package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.OpsQueries

/** Brute-force recounts for the round-9l operational reporting kit
  * (q162–q164).
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  private def centsOf(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q162 SLA shares and percentiles equal a sorted-latency recount") {
    val lats = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sorted }
    val got = OpsQueries.q162_sla(spark, dir).collect()
    assert(got.length == lats.size)
    got.foreach { r =>
      val v = lats(r.getString(0))
      val n = v.length
      assert(r.getAs[Long]("n_items") == n.toLong)
      assert(r.getAs[Double]("pct_30d") == v.count(_ <= 30).toDouble / n)
      assert(r.getAs[Double]("pct_90d") == v.count(_ <= 90).toDouble / n)
      def pctl(p: Int): Long = v((p * n + 99) / 100 - 1)
      assert(r.getAs[Long]("p50_days") == pctl(50), s"${r.getString(0)} p50")
      assert(r.getAs[Long]("p90_days") == pctl(90), s"${r.getString(0)} p90")
      assert(r.getAs[Long]("p99_days") == pctl(99), s"${r.getString(0)} p99")
    }
  }

  test("q163 trend classes equal a naive per-part regression sign test") {
    val monthly = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        ((year(col("l_shipdate")) - 1995) * 12 + month(col("l_shipdate")) - 1).cast("long"),
        col("l_extendedprice"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), centsOf(r.getDouble(2))))
      .groupBy(_._1).map { case (k, v) => (k._1, k._2, v.map(_._2).sum) }
    val brands = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // .toVector BEFORE the map: a Map.map producing 2-tuples would
    // collapse back into a Map keyed by brand (the q118-recount
    // footgun VERDICT r8 found)
    val classes = monthly.groupBy(_._1).toVector.map { case (pk, rows) =>
      val n = rows.size.toLong
      val cls = if (n < 6) "short" else {
        val sx = rows.map(_._2).sum
        val sy = rows.map(_._3).sum
        val sxx = rows.map(t => t._2 * t._2).sum
        val sxy = rows.map(t => t._2 * t._3).sum
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        if (num > 100 * den) "rising"
        else if (num < -100 * den) "falling"
        else "flat"
      }
      (brands(pk), cls)
    }
    val want = classes.groupBy(_._1).map { case (b, v) =>
      b -> (v.size.toLong,
        v.count(_._2 == "rising").toLong, v.count(_._2 == "falling").toLong,
        v.count(_._2 == "flat").toLong, v.count(_._2 == "short").toLong)
    }
    val got = OpsQueries.q163_part_trend(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, ris, fal, fla, sho) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        == ((n, ris, fal, fla, sho)), s"brand ${r.getString(0)}")
    }
  }

  test("q165 stream funnel is bit-identical to the q111 batch funnel") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0),
        Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getLong(4))
    }.sortBy(_._1).toSeq
    val batch = canon(graft.queries.EventQueries.q111_funnel_steps(spark, dir))
    val stream = canon(graft.queries.StreamQueries.q165_stream_funnel(spark, dir))
    assert(stream == batch)
  }

  test("q166 IVF-PQ results lie in the probe's nearest cells with exact cosines") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]) = math.sqrt(dot(a, a))
    val got = graft.queries.VectorQueries.q166_ivf_pq(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (p, v) = (r.getLong(0), r.getLong(2))
      val want = dot(emb(p), emb(v)) / (nrm(emb(p)) * nrm(emb(v)))
      // the query computes the same double via the codegen'd kernel;
      // summation order matches the sequential fold
      assert(math.abs(r.getDouble(4) - want) < 1e-9, s"cosine p=$p v=$v")
    }
    // per probe: ranks are 1..k dense and cosine non-increasing
    got.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.size))
      val cos = sorted.map(_.getDouble(4)).toSeq
      assert(cos == cos.sorted.reverse, s"probe $p order")
    }
  }

  test("q167 chunks equal a per-doc imperative chunking replay") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    val want = docs.toSeq.flatMap { case (id, tk) =>
      if (tk.isEmpty) Nil
      else (0 to (tk.length - 1) / 48).map { cid =>
        val chunk = tk.slice(cid * 48, cid * 48 + 64)
        (id, cid.toLong, cid * 48L + 1, chunk.length.toLong, chunk.mkString(" "))
      }
    }.sortBy(x => (x._1, x._2))
    val got = graft.queries.TextQueries.q167_rag_chunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == want.length)
    // recompute the hash via the A/B composed form on the replayed text
    val sp = spark
    import sp.implicits._
    val wantH = want.toDF("doc_id", "chunk_id", "start_tok", "n_tokens", "ctext")
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tokens"),
        graft.functions.Determinism.hash60Composed(col("ctext")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == wantH.toSeq)
  }

  test("q168 stream sliding distinct is bit-identical to batch q115") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getDate(0).toString, r.getLong(1))).sortBy(_._1).toSeq
    val batch = canon(graft.queries.EventQueries.q115_sliding_distinct(spark, dir))
    val stream = canon(graft.queries.StreamQueries.q168_stream_sliding_distinct(spark, dir))
    assert(stream == batch)
  }

  test("q169 correlation matrix equals a naive double-pass Pearson within 1e-12") {
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .collect().map(r => Array(centsOf(r.getDouble(0)), centsOf(r.getDouble(1)),
        centsOf(r.getDouble(2)), centsOf(r.getDouble(3))))
    val names = Array("quantity", "price", "discount", "tax")
    def pearson(i: Int, j: Int): Double = {
      val n = rows.length.toDouble
      val (xs, ys) = (rows.map(_(i).toDouble), rows.map(_(j).toDouble))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      cov / (math.sqrt(vx) * math.sqrt(vy))
    }
    val got = graft.queries.AnalyticsQueries.q169_corr_matrix(spark, dir).collect()
    assert(got.length == 6)
    got.foreach { r =>
      val (a, b) = (names.indexOf(r.getString(0)), names.indexOf(r.getString(1)))
      assert(r.getLong(2) == rows.length.toLong)
      assert(math.abs(r.getDouble(3) - pearson(a, b)) < 1e-12,
        s"${r.getString(0)}~${r.getString(1)}")
    }
  }

  test("q170/q171/q172 streaming pairings are bit-identical to their batch twins") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(graft.queries.StreamQueries.q170_stream_quantiles(spark, dir)) ==
      canon(graft.queries.AnalyticsQueries.q117_exact_quantiles(spark, dir)))
    assert(canon(graft.queries.StreamQueries.q171_stream_interarrival(spark, dir)) ==
      canon(graft.queries.EventQueries.q116_interarrival_hist(spark, dir)))
    assert(canon(graft.queries.StreamQueries.q172_stream_transitions(spark, dir)) ==
      canon(graft.queries.EventQueries.q113_transition_matrix(spark, dir)))
  }

  test("q173 backtest MAE is bit-identical to an imperative Holt replay") {
    val series = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).map { case (t, v) => t -> v.sortBy(_._2).map(_._3) }
    val wantRaw = series.toSeq.filter(_._2.length >= 2).flatMap { case (tpe, xs) =>
      var l = xs(0); var b = xs(1) - xs(0)
      val states = Vector.newBuilder[(Double, Double)]
      states += ((l, b))
      for (i <- 1 until xs.length) {
        val v = xs(i)
        val nl = 0.5 * v + 0.5 * (l + b)
        val nb = 0.25 * (nl - l) + 0.75 * b
        l = nl; b = nb; states += ((l, b))
      }
      for {
        (st, t0) <- states.result().zipWithIndex; t = t0 + 1
        h <- 1 to 7 if t + h <= xs.length
      } yield ((tpe, h.toLong),
        math.floor(math.abs(st._1 + h.toDouble * st._2 - xs(t + h - 1)) * 1000000.0).toLong)
    }
    val want = wantRaw.groupBy(_._1).map { case (k, v) =>
      k -> (v.size.toLong, v.map(_._2).sum.toDouble / 1000000.0 / v.size)
    }
    val got = graft.queries.TimeSeriesQueries.q173_holt_backtest(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, mae) = want((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getDouble(3) == mae, s"${r.getString(0)} h=${r.getLong(1)}")
    }
  }

  test("q174 item-CF equals a brute-force basket cosine top-5") {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cx = baskets.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
    val pairCnt = baskets.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter(_._2 >= 3)
    val want = pairCnt.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .map { case (p, nb, c) => (p, nb, c, c.toDouble / math.sqrt((cx(p) * cx(nb)).toDouble)) }
      .groupBy(_._1).flatMap { case (p, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
          .map { case ((_, nb, c, cos), i) => (p, i + 1L, nb, c, cos) }
      }.toSet
    val got = graft.queries.ReportQueries.q174_item_cf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == want)
  }

  test("q175 multi-touch credit equals a per-user segment replay") {
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val credits = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var seg = 0L
      val tagged = ordered.map { e =>
        val t = (e._4, seg)
        if (e._4 == "purchase") seg += 1
        t
      }
      val purchaseSegs = tagged.filter(_._1 == "purchase").map(_._2).toSet
      val touches = tagged.filter(_._1 != "purchase")
      val k = touches.groupBy(_._2).map { case (s, v) => s -> v.size }
      touches.filter(t => purchaseSegs(t._2))
        // the query's decq edge: floor-int64 at scale 6 (round-11)
        .map(t => t._1 -> BigDecimal(math.floor(1.0 / k(t._2) * 1e6).toLong, 6))
    }
    val want = credits.groupBy(_._1).map { case (ch, v) =>
      ch -> (v.size.toLong, v.map(_._2).sum.toDouble)
    }
    val got = graft.queries.ReportQueries.q175_multitouch(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, c) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == c, r.getString(0))
    }
  }

  test("q176 shares are exact child/parent ratios and children cover each parent") {
    val got = graft.queries.ReportQueries.q176_share_of_parent(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
    val nations = got.filter(_._1 == "nation")
    val regions = got.filter(_._1 == "region").map(r => r._2 -> r._4).toMap
    val world = got.filter(_._1 == "region").map(_._4).sum
    nations.groupBy(_._3).foreach { case (reg, kids) =>
      assert(math.abs(kids.map(_._4).sum - regions(reg)) < 1e-6, reg)
      kids.foreach(k => assert(math.abs(k._5 - k._4 / regions(reg)) < 1e-12, k._2))
    }
    got.filter(_._1 == "region").foreach { r =>
      assert(math.abs(r._5 - r._4 / world) < 1e-12, r._2)
    }
  }

  test("q177 k-anonymity cells recount and the ladder nests") {
    val rows = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = graft.queries.StatsQueries.q177_k_anonymity(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)),
        r.getLong(3), r.getBoolean(4)))
    val l0 = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val l1 = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    got.foreach {
      case (0L, Some(n), Some(s), c, risk) =>
        assert(l0((n, s)) == c && risk == (c < 5))
      case (1L, Some(n), None, c, risk) =>
        assert(l1(n) == c && risk == (c < 5))
      case (2L, None, None, c, risk) =>
        assert(c == rows.length.toLong && risk == (c < 5))
      case other => fail(s"unexpected ladder row $other")
    }
    assert(got.count(_._1 == 0L) == l0.size && got.count(_._1 == 1L) == l1.size &&
      got.count(_._1 == 2L) == 1)
  }

  test("q178 streaming multi-touch is bit-identical to batch q175") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(canon(graft.queries.StreamQueries.q178_stream_multitouch(spark, dir)) ==
      canon(graft.queries.ReportQueries.q175_multitouch(spark, dir)))
  }

  test("q179 RRF fusion recounts from the two arms' independent rankings") {
    val text = graft.queries.TextQueries.q89_bm25(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap // doc -> bm25 rank (top-20 window)
    val got = graft.queries.TextQueries.q179_hybrid_rrf(spark, dir).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (rt, rv) = (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
      val want = rt.map(x => 1.0 / (60 + x).toDouble).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x).toDouble).getOrElse(0.0)
      assert(r.getDouble(4) == want, s"doc ${r.getLong(1)}")
      // where the doc is in BM25's own top-20, the text rank must agree
      text.get(r.getLong(1)).foreach(tr => rt.foreach(x => assert(x == tr)))
    }
    val rrfs = got.sortBy(_.getLong(0)).map(_.getDouble(4)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("q180 component census equals a union-find recount of the part graph") {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = baskets.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.toSeq.map(find).groupBy(identity).map(_._2.size)
      .groupBy(identity).map { case (sz, v) => sz.toLong -> v.size.toLong }
    val got = graft.queries.ReportQueries.q180_component_census(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q181 streaming regression is bit-identical to batch q131") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(graft.queries.StreamQueries.q181_stream_regression(spark, dir)) ==
      canon(graft.queries.AnalyticsQueries.q131_daily_regression(spark, dir)))
  }

  test("q182 PIT join equals a per-purchase interval replay, one row per purchase") {
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val hist = evs.filter(_._4 == "view").groupBy(_._1).map { case (u, v) =>
      val ordered = v.sortBy(e => (e._2.getTime, e._3))
      // change rows only (value differs from previous)
      val changes = ordered.foldLeft(Vector.empty[(java.sql.Timestamp, Long)]) { (acc, e) =>
        val cents = centsOf(e._5)
        if (acc.nonEmpty && acc.last._2 == cents) acc else acc :+ ((e._2, cents))
      }
      u -> changes
    }
    val purchases = evs.filter(_._4 == "purchase")
    val got = graft.queries.AnalyticsQueries.q182_pit_join(spark, dir).collect()
    assert(got.length == purchases.length)
    val byId = got.map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    purchases.foreach { case (u, ts, eid, _, _) =>
      val want = hist.getOrElse(u, Vector.empty)
        .takeWhile(_._1.getTime <= ts.getTime).lastOption
        .map(_._2.toDouble / 100)
      assert(byId(eid) == want, s"purchase $eid")
    }
  }

  test("q183 diff classes recount under the simulated snapshot rules") {
    val evs = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), centsOf(r.getDouble(2))))
    val classes = scala.collection.mutable.Map.empty[(String, String), Long]
    def bump(t: String, c: String): Unit = classes((t, c)) = classes.getOrElse((t, c), 0L) + 1
    evs.foreach { case (id, t, _) =>
      if (id % 97 == 0) bump(t, "deleted")
      else if (id % 101 == 0) bump(t, "updated")
      else bump(t, "unchanged")
      if (id % 103 == 0) bump(t, "added")
    }
    val got = graft.queries.AnalyticsQueries.q183_snapshot_diff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == classes.toMap)
  }

  test("q164 trailing windows equal a per-customer day scan") {
    val daily = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect().map(r => ((r.getLong(0), r.getDate(1).toLocalDate.toEpochDay), centsOf(r.getDouble(2))))
      .groupBy(_._1).map { case (k, v) => (k._1, k._2, v.map(_._2).sum, v.size.toLong) }
      .toVector
    val byCust = daily.groupBy(_._1)
    val want = byCust.flatMap { case (cust, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map { case (_, d, _, _) =>
        val win = sorted.filter(t => t._2 >= d - 29 && t._2 <= d)
        ((cust, d), (win.map(_._3).sum, win.map(_._4).sum))
      }
    }
    val got = OpsQueries.q164_trailing(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (cents, n) = want((r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      assert(r.getDouble(2) == cents.toDouble / 100.0,
        s"cust ${r.getLong(0)} day ${r.getDate(1)}")
      assert(r.getLong(3) == n)
    }
  }

  test("q215 streaming SLA report is bit-identical to batch q162 (pairing #35)") {
    val batch = graft.queries.OpsQueries.q162_sla(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q215_stream_sla(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q217 streaming part trend is bit-identical to batch q163 (pairing #37)") {
    val batch = graft.queries.OpsQueries.q163_part_trend(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q217_stream_part_trend(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q219 streaming trailing run rates are bit-identical to batch q164 (pairing #39)") {
    val batch = graft.queries.OpsQueries.q164_trailing(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q219_stream_trailing(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }
}
