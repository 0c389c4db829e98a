package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{StreamQueries, TimeSeriesQueries}

/** Brute-force recounts for the round-9j time-series kit
  * (q154–q157) + the q157≡q156 batch-stream parity. The DuckDB gate
  * proves cross-engine equality; these re-derive each statistic
  * imperatively so a same-formula-both-sides oracle slip can't hide.
  */
class TimeSeriesSpec extends AnyFunSuite {

  test("q218 streaming autocorrelation is bit-identical to batch q154 (pairing #38)") {
    val batch = graft.queries.TimeSeriesQueries.q154_acf(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q218_stream_acf(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q221 streaming seasonal decomposition is bit-identical to batch q155 (pairing #41)") {
    val batch = graft.queries.TimeSeriesQueries.q155_seasonal(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q221_stream_seasonal(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }

  test("q222 streaming Holt backtest is bit-identical to batch q173 (pairing #42)") {
    val batch = graft.queries.TimeSeriesQueries.q173_holt_backtest(spark, dir).collect().toSeq
    val stream = graft.queries.StreamQueries.q222_stream_holt_backtest(spark, dir).collect().toSeq
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"first diff: ${stream.zip(batch).find(p => p._1 != p._2)}")
  }
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  private def centsOf(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  /** (epochDay, revenueCents) of the daily order series, collected. */
  private lazy val daily: Vector[(Long, Long)] =
    Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, centsOf(r.getDouble(1))))
      .groupBy(_._1).map { case (d, rs) => (d, rs.map(_._2).sum) }
      .toVector.sortBy(_._1)

  test("q154 acf equals a naive lag-product recomputation over the daily series") {
    val byDay = daily.toMap
    val n = daily.size.toLong
    val sum = daily.map(_._2).sum
    val mu = (2 * sum + n) / (2 * n) // all-positive: matches integer div
    val dx = daily.map { case (d, c) => (d, c - mu) }
    val den = dx.map(t => BigInt(t._2) * BigInt(t._2)).sum
    val want = (1 to 7).map { k =>
      val pairs = dx.flatMap { case (d, v) =>
        byDay.get(d + k).map(cb => BigInt(v) * BigInt(cb - mu))
      }
      (k.toLong, pairs.size.toLong, pairs.sum.toDouble / den.toDouble)
    }
    val got = TimeSeriesQueries.q154_acf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"lag ${g._1} n_pairs")
      assert(math.abs(g._3 - w._3) < 1e-12, s"lag ${g._1}: got ${g._3} want ${w._3}")
    }
  }

  test("q155 seasonal indices equal a naive centered-MA recomputation") {
    val byDay = daily.toMap
    // 1995-01-01 = epoch day 9131, a Sunday
    val anchor = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val detr = daily.flatMap { case (d, c) =>
      val win = (-3 to 3).flatMap(off => byDay.get(d + off))
      if (win.size == 7) Some(((d - anchor) % 7, 7 * c - win.sum)) else None
    }
    val want = detr.groupBy(_._1).map { case (dow, vs) =>
      (dow, vs.size.toLong, vs.map(_._2).sum.toDouble / (700.0 * vs.size))
    }
    val got = TimeSeriesQueries.q155_seasonal(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == want.size)
    got.foreach { case (dow, nd, s) =>
      val (_, wn, ws) = want.find(_._1 == dow).map(t => (t._1, t._2, t._3)).get
      assert(nd == wn, s"dow $dow n_days")
      assert(math.abs(s - ws) < 1e-12, s"dow $dow: got $s want $ws")
    }
  }

  test("q156 holt equals the literal scala recursion, bit for bit") {
    val series = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    val want = series.collect { case (tpe, rows) if rows.size >= 2 =>
      val xs = rows.sortBy(_._2).map(_._3.toDouble).toVector
      var l = xs(0); var b = xs(1) - xs(0)
      var t = 1
      while (t < xs.length) {
        val lNew = 0.5 * xs(t) + 0.5 * (l + b)
        b = 0.25 * ((0.5 * xs(t) + 0.5 * (l + b)) - l) + 0.75 * b
        l = lNew
        t += 1
      }
      tpe -> (xs.length.toLong, l, b, l + 7.0 * b)
    }
    val got = TimeSeriesQueries.q156_holt(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (nd, l, b, f) = want(r.getString(0))
      assert(r.getLong(1) == nd)
      assert(r.getDouble(2) == l, s"${r.getString(0)} level") // bit-exact
      assert(r.getDouble(3) == b, s"${r.getString(0)} trend")
      assert(r.getDouble(4) == f, s"${r.getString(0)} forecast")
    }
  }

  test("q157 stream holt is bit-identical to the q156 batch fold") {
    val batch = TimeSeriesQueries.q156_holt(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val stream = StreamQueries.q157_stream_holt(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(stream.toSeq == batch.toSeq)
  }
}
