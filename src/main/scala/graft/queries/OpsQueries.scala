package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism._

/** Round-9l operational reporting kit: fulfillment-SLA compliance,
  * per-part trend classification, and trailing-window run rates —
  * the supply-chain/operations layer of the reporting surface. deva:
  * groupby + sliding_window + stats pipe chains; here each is one
  * declarative plan reusing the engine's exact-histogram, exact-
  * moment, and RANGE-frame idioms.
  */
object OpsQueries {

  /** q162 — fulfillment SLA report per order priority: item volume,
    * share shipped within 30/60/90 days of order placement, and the
    * exact p50/p90/p99 ship latency. The operational dashboard every
    * fulfillment team runs; latency joins the fact to its order
    * header (the dim-sized side broadcasts under AQE).
    *
    * Scale/shape: ONE aggregation collapses the joined corpus to the
    * (priority, latency-days) histogram — bounded by the latency
    * domain; SLA shares are exact integer conditional sums over the
    * histogram, and the percentiles run the q117 cumulative idiom,
    * windows partitioned by priority. No sort, no collect.
    */
  def q162_sla(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lat"))
    val hist = j.groupBy(col("priority"), col("lat")).agg(count(lit(1)).as("c"))
    slaFrom(hist)
  }

  /** The SLA tail over a (priority, lat, c) latency histogram —
    * shared verbatim by batch q162 and its streaming twin q215
    * (pairing #35): the threshold shares, the cumulative window, and
    * the exact rank-target percentile selection all replay over the
    * day-domain-bounded frame.
    */
  private[queries] def slaFrom(hist: DataFrame): DataFrame = {
    val shares = hist.groupBy(col("priority")).agg(
      sum(col("c")).as("n_items"),
      expr("CAST(SUM(CASE WHEN lat <= 30 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)")
        .as("pct_30d"),
      expr("CAST(SUM(CASE WHEN lat <= 60 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)")
        .as("pct_60d"),
      expr("CAST(SUM(CASE WHEN lat <= 90 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)")
        .as("pct_90d"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("priority")).orderBy(col("lat"))))
    val qs = cum.join(broadcast(shares.select(col("priority"), col("n_items"))), "priority")
      .select(col("priority"), col("lat"), col("cum"), col("n_items"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      .filter(col("cum") >= expr("(p * n_items + 99) div 100"))
      .groupBy(col("priority"), col("p")).agg(min(col("lat")).as("q"))
      .groupBy(col("priority")).agg(
        max(when(col("p") === 50, col("q"))).as("p50_days"),
        max(when(col("p") === 90, col("q"))).as("p90_days"),
        max(when(col("p") === 99, col("q"))).as("p99_days"))
    shares.join(qs, "priority").orderBy(col("priority"))
  }

  val q162_sla_sql: String =
    """WITH j AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(date_trunc('day', l_shipdate)::DATE - date_trunc('day', o_orderdate)::DATE AS BIGINT) AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |hist AS (SELECT priority, lat, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
      |shares AS (
      |  SELECT priority, CAST(SUM(c) AS BIGINT) AS n_items,
      |    CAST(SUM(CASE WHEN lat <= 30 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS pct_30d,
      |    CAST(SUM(CASE WHEN lat <= 60 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS pct_60d,
      |    CAST(SUM(CASE WHEN lat <= 90 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS pct_90d
      |  FROM hist GROUP BY 1),
      |cum AS (
      |  SELECT priority, lat, SUM(c) OVER (PARTITION BY priority ORDER BY lat) AS cum
      |  FROM hist),
      |qsel AS (
      |  SELECT c.priority, ps.pp AS p, CAST(MIN(c.lat) AS BIGINT) AS q
      |  FROM cum c JOIN shares s USING (priority)
      |  CROSS JOIN (SELECT * FROM (VALUES (50), (90), (99)) AS v(pp)) ps
      |  WHERE c.cum >= (ps.pp * s.n_items + 99) // 100
      |  GROUP BY 1, 2),
      |qs AS (
      |  SELECT priority,
      |    MAX(CASE WHEN p = 50 THEN q END) AS p50_days,
      |    MAX(CASE WHEN p = 90 THEN q END) AS p90_days,
      |    MAX(CASE WHEN p = 99 THEN q END) AS p99_days
      |  FROM qsel GROUP BY 1)
      |SELECT s.priority, s.n_items, s.pct_30d, s.pct_60d, s.pct_90d,
      |  q.p50_days, q.p90_days, q.p99_days
      |FROM shares s JOIN qs q USING (priority)
      |ORDER BY s.priority""".stripMargin

  /** q163 — per-part revenue TREND classification rolled up by
    * brand: fit the q131 exact-moment regression to each part's
    * monthly revenue series and classify rising / falling / flat /
    * short — the slow-mover & growth screen over the whole catalog.
    *
    * Scale/shape: per-part monthly totals in one aggregation (month
    * index is an exact integer), five integer moments per part in a
    * second — both shuffle on the part key; the CLASSIFICATION
    * avoids the slope double entirely: sign tests are exact integer
    * cross-multiplications (num vs ±thr·den), so no part can change
    * class by a float rounding. The brand rollup is label-bounded.
    */
  def q163_part_trend(spark: SparkSession, dir: String): DataFrame = {
    // thr (in partTrendFrom): |slope| ≤ $1/month in cents ⇒ flat
    val monthly = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        ((year(col("l_shipdate")) - 1995) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("x"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .groupBy(col("l_partkey"), col("x"))
      .agg(sum(col("cents")).as("y"))
    partTrendFrom(spark, dir, monthly)
  }

  /** The trend-classification tail over a (l_partkey, x, y) monthly
    * revenue frame — shared verbatim by batch q163 and its streaming
    * twin q217 (pairing #37): five integer moments per part, exact
    * cross-multiplied sign tests (no slope double), broadcast brand
    * rollup.
    */
  private[queries] def partTrendFrom(spark: SparkSession, dir: String,
      monthly: DataFrame): DataFrame = {
    val thr = 100L
    val moments = monthly.groupBy(col("l_partkey")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val classed = moments.select(col("l_partkey"),
      when(col("n") < 6, "short")
        .when(expr(s"n * sxy - sx * sy > $thr * (n * sxx - sx * sx)"), "rising")
        .when(expr(s"n * sxy - sx * sy < -$thr * (n * sxx - sx * sx)"), "falling")
        .otherwise("flat").as("cls"))
    classed.join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("cls") === "rising", 1L).otherwise(0L)).as("rising"),
        sum(when(col("cls") === "falling", 1L).otherwise(0L)).as("falling"),
        sum(when(col("cls") === "flat", 1L).otherwise(0L)).as("flat"),
        sum(when(col("cls") === "short", 1L).otherwise(0L)).as("short"))
      .orderBy(col("p_brand"))
  }

  val q163_part_trend_sql: String =
    """WITH monthly AS (
      |  SELECT l_partkey,
      |    CAST((year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS BIGINT) AS x,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM monthly GROUP BY 1),
      |cls AS (
      |  SELECT l_partkey,
      |    CASE WHEN n < 6 THEN 'short'
      |         WHEN n * sxy - sx * sy > 100 * (n * sxx - sx * sx) THEN 'rising'
      |         WHEN n * sxy - sx * sy < -100 * (n * sxx - sx * sx) THEN 'falling'
      |         ELSE 'flat' END AS cls
      |  FROM m)
      |SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(CASE WHEN cls = 'rising' THEN 1 ELSE 0 END) AS BIGINT) AS rising,
      |  CAST(SUM(CASE WHEN cls = 'falling' THEN 1 ELSE 0 END) AS BIGINT) AS falling,
      |  CAST(SUM(CASE WHEN cls = 'flat' THEN 1 ELSE 0 END) AS BIGINT) AS flat,
      |  CAST(SUM(CASE WHEN cls = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS short
      |FROM cls c JOIN part p ON c.l_partkey = p.p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q164 — trailing 30-day run rate per customer: for every active
    * order day, the customer's revenue and order count over the
    * preceding 30 calendar days — a RANGE-frame window (value-based
    * frame over the epoch-day key), the one window-frame kind the
    * inventory hadn't exercised (rows frames: q10/q108; interval
    * hybrid: q17). Partitioned by customer — per-key history depth,
    * never a global order.
    *
    * Determinism: the frame key is the exact integer epoch-day; the
    * trailing sums are long/decimal; dollars appear once at the end.
    */
  def q164_trailing(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .agg(sum((dec2(col("o_totalprice")) * 100).cast("long")).as("cents"),
        count(lit(1)).as("n"))
      .withColumn("epd", datediff(col("day"), lit("1995-01-01").cast("date")).cast("long"))
    trailingFrom(daily)
  }

  /** The trailing-run-rate tail over a per-customer daily frame
    * (o_custkey, day, cents, n, epd) — shared verbatim by batch q164
    * and its streaming twin q219 (pairing #39): the RANGE-frame
    * window runs over the calendar-bounded daily grid, partitioned
    * by customer.
    */
  private[queries] def trailingFrom(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("epd"))
      .rangeBetween(-29, Window.currentRow)
    daily.select(col("o_custkey"), col("day"),
        (sum(col("cents")).over(w).cast("double") / 100.0).as("t30_revenue"),
        sum(col("n")).over(w).as("t30_orders"))
      .orderBy(col("o_custkey"), col("day"))
  }

  val q164_trailing_sql: String =
    """WITH daily AS (
      |  SELECT o_custkey, date_trunc('day', o_orderdate)::DATE AS day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(date_trunc('day', o_orderdate)::DATE - DATE '1995-01-01' AS BIGINT) AS epd
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_custkey, day,
      |  CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS t30_revenue,
      |  CAST(SUM(n) OVER w AS BIGINT) AS t30_orders
      |FROM daily
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epd
      |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, day""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_sla" -> (q162_sla _),
    "q163_part_trend" -> (q163_part_trend _),
    "q164_trailing" -> (q164_trailing _))

  val oracles: Map[String, String] = Map(
    "q162_sla" -> q162_sla_sql,
    "q163_part_trend" -> q163_part_trend_sql,
    "q164_trailing" -> q164_trailing_sql)
}
