package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism._

/** Round-9k customer-lifecycle kit: engagement streaks
  * (gaps-and-islands), Kaplan–Meier retention survival, RFM
  * segmentation, and Pareto/ABC revenue classification — the
  * customer-analytics layer a warehouse serves marketing and
  * lifecycle teams with. deva composes these from groupby +
  * accumulate + sliding pipe chains; here each is one declarative
  * plan in its scale-safe shape.
  *
  * Scale discipline: per-user/per-part frames come from ONE corpus
  * aggregation; every ordering need is either a per-key window
  * (real partitions), a value-histogram cumulative (q117), a
  * calendar-bounded array fold (q156), or — for the one genuinely
  * global total order (ABC) — the two-pass range-partitioned prefix
  * sum in [[graft.operators.Sequence.globalPrefixSum]]. No global
  * single-task window anywhere.
  */
object LifecycleQueries {

  /** q158 — longest purchase-day STREAK per user (gaps-and-islands):
    * consecutive-calendar-day runs of purchase activity, the
    * engagement metric behind "7-day streak" product features. The
    * island key is the classic dayNumber − row_number constant —
    * both windows partition by user (user-bounded, never global).
    * Tie-break: longest run, then earliest start, via one min-struct
    * aggregation (no second window pass).
    */
  def q158_streaks(spark: SparkSession, dir: String): DataFrame = {
    val anchor = lit("2024-01-01").cast("date")
    val days = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("grp", datediff(col("day"), anchor) - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
    islands.groupBy(col("user_id"))
      .agg(min(struct((-col("len")).as("neg_len"), col("start").as("start"))).as("b"))
      .select(col("user_id"), (-col("b.neg_len")).as("best_len"),
        col("b.start").as("best_start"))
      .orderBy(col("user_id"))
  }

  val q158_streaks_sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day
      |  FROM events WHERE event_type = 'purchase'),
      |isl AS (
      |  SELECT user_id,
      |    (day - DATE '2024-01-01') - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp,
      |    day
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len, MIN(day) AS start
      |  FROM isl GROUP BY 1, 2),
      |best AS (
      |  SELECT user_id, len, start,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, start) AS rk
      |  FROM runs)
      |SELECT user_id, len AS best_len, start AS best_start
      |FROM best WHERE rk = 1 ORDER BY user_id""".stripMargin

  /** q159 — KAPLAN–MEIER survival per signup-week cohort for
    * time-to-first-`error` (the churn-signal event): t = days from a
    * user's first event to their first error, right-CENSORED at the
    * corpus horizon for users who never error. The at-risk counts
    * come from per-cohort cumulative windows over the day-bounded
    * (cohort, t) frame; the sequential survival product
    * S(t) = Π(1 − dᵢ/nᵢ) runs as the q156 calendar-bounded ARRAY
    * FOLD (appending curve points), mirrored bit-for-bit by a DuckDB
    * RECURSIVE CTE — the third fold≡recursion pairing (EWMA weights,
    * Holt, now KM).
    */
  def q159_survival(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    survivalFrom(
      ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"),
          min(when(col("event_type") === "error", to_date(col("ts")))).as("de")),
      ev.agg(max(to_date(col("ts"))).as("mx")))
  }

  /** q159's pipeline from the per-user lifetimes frame (user_id, d0
    * first-event day, de first-error day or null) + the 1-row corpus
    * horizon — shared with the streaming twin q199, whose per-user
    * state IS (d0, de, own-max-day) and whose horizon is the max of
    * the per-user maxima.
    */
  private[queries] def survivalFrom(life: DataFrame, mx: DataFrame): DataFrame = {
    val users = life.crossJoin(broadcast(mx)).select(
      expr("datediff(d0, DATE '2024-01-01') div 7").as("cohort"),
      when(col("de").isNotNull, datediff(col("de"), col("d0")))
        .otherwise(datediff(col("mx"), col("d0"))).cast("long").as("t"),
      col("de").isNull.cast("long").as("cens"))
    val byT = users.groupBy(col("cohort"), col("t"))
      .agg(sum(lit(1L) - col("cens")).as("d"), sum(col("cens")).as("c"))
    val wc = Window.partitionBy(col("cohort")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byT.groupBy(col("cohort")).agg(sum(col("d") + col("c")).as("ntot"))
    val steps = byT.join(broadcast(tot), "cohort")
      .withColumn("nrisk", col("ntot") - (sum(col("d") + col("c")).over(wc) - (col("d") + col("c"))))
      .filter(col("d") > 0)
      .select(col("cohort"), col("t"), col("d"), col("nrisk"))
    steps.groupBy(col("cohort"))
      .agg(expr("array_sort(collect_list(struct(t, d, nrisk)))").as("xs"))
      .select(col("cohort"), explode(expr(
        """aggregate(xs,
          |  CAST(array() AS ARRAY<STRUCT<t: BIGINT, d: BIGINT, n: BIGINT, s: DOUBLE>>),
          |  (acc, v) -> acc || array(named_struct(
          |    't', v.t, 'd', v.d, 'n', v.nrisk,
          |    's', (CASE WHEN size(acc) = 0 THEN CAST(1.0 AS DOUBLE)
          |          ELSE element_at(acc, -1).s END)
          |         * (1.0 - CAST(v.d AS DOUBLE) / CAST(v.nrisk AS DOUBLE)))))
          |""".stripMargin)).as("p"))
      .select(col("cohort"), col("p.t").as("t"), col("p.n").as("n_risk"),
        col("p.d").as("d"), col("p.s").as("survival"))
      .orderBy(col("cohort"), col("t"))
  }

  val q159_survival_sql: String =
    """WITH RECURSIVE life AS (
      |  SELECT user_id, MIN(date_trunc('day', ts)::DATE) AS d0,
      |    MIN(CASE WHEN event_type = 'error' THEN date_trunc('day', ts)::DATE END) AS de
      |  FROM events GROUP BY 1),
      |mx AS (SELECT MAX(date_trunc('day', ts)::DATE) AS mx FROM events),
      |users AS (
      |  SELECT (d0 - DATE '2024-01-01') // 7 AS cohort,
      |    CAST(CASE WHEN de IS NOT NULL THEN de - d0 ELSE mx - d0 END AS BIGINT) AS t,
      |    CASE WHEN de IS NULL THEN 1 ELSE 0 END AS cens
      |  FROM life CROSS JOIN mx),
      |byt AS (
      |  SELECT cohort, t, CAST(SUM(1 - cens) AS BIGINT) AS d,
      |    CAST(SUM(cens) AS BIGINT) AS c
      |  FROM users GROUP BY 1, 2),
      |tot AS (SELECT cohort, CAST(SUM(d + c) AS BIGINT) AS ntot FROM byt GROUP BY 1),
      |steps AS (
      |  SELECT b.cohort, b.t, b.d,
      |    t2.ntot - (SUM(b.d + b.c) OVER (PARTITION BY b.cohort ORDER BY b.t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (b.d + b.c)) AS nrisk
      |  FROM byt b JOIN tot t2 ON b.cohort = t2.cohort),
      |st AS (
      |  SELECT cohort, t, d, nrisk,
      |    ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY t) AS rn
      |  FROM steps WHERE d > 0),
      |km AS (
      |  SELECT cohort, rn, t, d, nrisk,
      |    1.0 - CAST(d AS DOUBLE) / CAST(nrisk AS DOUBLE) AS s
      |  FROM st WHERE rn = 1
      |  UNION ALL
      |  SELECT st.cohort, st.rn, st.t, st.d, st.nrisk,
      |    km.s * (1.0 - CAST(st.d AS DOUBLE) / CAST(st.nrisk AS DOUBLE))
      |  FROM km JOIN st ON st.cohort = km.cohort AND st.rn = km.rn + 1)
      |SELECT cohort, t, CAST(nrisk AS BIGINT) AS n_risk, d, s AS survival
      |FROM km ORDER BY cohort, t""".stripMargin

  /** q160 — RFM SEGMENTATION: per-customer recency / frequency /
    * monetary quintile scores, reported as segment cells. The
    * classic marketing cut — and the classic global-ntile trap: a
    * naive ntile(5) OVER (ORDER BY metric) is a single-task sort.
    * Here the quintile BREAKS come from the exact value-histogram
    * cumulative (q117 idiom; the three metric histograms union into
    * one frame, windows partition by metric) and each customer's
    * score is four broadcast comparisons — map-side, no global
    * order anywhere. Scores: R is reversed (recent = 5); boundary
    * semantics are exact integer comparisons against the break
    * values, identical in both engines.
    */
  def q160_rfm(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val mx = ord.agg(max(to_date(col("o_orderdate"))).as("mx"))
    val per = ord.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum((dec2(col("o_totalprice")) * 100).cast("long")).as("mon"))
      .crossJoin(broadcast(mx))
      .select(col("o_custkey"),
        datediff(col("mx"), col("last_day")).cast("long").as("rec"),
        col("freq"), col("mon"))
    rfmFrom(per)
  }

  /** The RFM tail over a (o_custkey, rec, freq, mon) per-customer
    * frame — shared verbatim by batch q160 and its streaming twin
    * q220 (pairing #40): the three value histograms, exact
    * rank-target quintile breaks, broadcast score cuts, and the
    * segment rollup all replay identically.
    */
  private[queries] def rfmFrom(per: DataFrame): DataFrame = {
    val vals = per.select(lit("rec").as("metric"), col("rec").as("v"))
      .unionByName(per.select(lit("freq").as("metric"), col("freq").as("v")))
      .unionByName(per.select(lit("mon").as("metric"), col("mon").as("v")))
    val hist = vals.groupBy(col("metric"), col("v")).agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col("metric")).agg(sum(col("c")).as("n"))
    val breaks = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("metric")).orderBy(col("v"))))
      .join(broadcast(tot), "metric")
      .select(col("metric"), col("v"), col("cum"), col("n"),
        explode(array(lit(20L), lit(40L), lit(60L), lit(80L))).as("p"))
      .filter(col("cum") >= expr("(p * n + 99) div 100"))
      .groupBy(col("metric"), col("p")).agg(min(col("v")).as("q"))
    val wide = breaks.agg(
      max(when(col("metric") === "rec" && col("p") === 20, col("q"))).as("r20"),
      max(when(col("metric") === "rec" && col("p") === 40, col("q"))).as("r40"),
      max(when(col("metric") === "rec" && col("p") === 60, col("q"))).as("r60"),
      max(when(col("metric") === "rec" && col("p") === 80, col("q"))).as("r80"),
      max(when(col("metric") === "freq" && col("p") === 20, col("q"))).as("f20"),
      max(when(col("metric") === "freq" && col("p") === 40, col("q"))).as("f40"),
      max(when(col("metric") === "freq" && col("p") === 60, col("q"))).as("f60"),
      max(when(col("metric") === "freq" && col("p") === 80, col("q"))).as("f80"),
      max(when(col("metric") === "mon" && col("p") === 20, col("q"))).as("m20"),
      max(when(col("metric") === "mon" && col("p") === 40, col("q"))).as("m40"),
      max(when(col("metric") === "mon" && col("p") === 60, col("q"))).as("m60"),
      max(when(col("metric") === "mon" && col("p") === 80, col("q"))).as("m80"))
    per.crossJoin(broadcast(wide))
      .select(col("o_custkey"), col("rec"), col("mon"),
        (lit(6L) - (lit(1L) + (col("rec") > col("r20")).cast("long")
          + (col("rec") > col("r40")).cast("long")
          + (col("rec") > col("r60")).cast("long")
          + (col("rec") > col("r80")).cast("long"))).as("r_score"),
        (lit(1L) + (col("freq") > col("f20")).cast("long")
          + (col("freq") > col("f40")).cast("long")
          + (col("freq") > col("f60")).cast("long")
          + (col("freq") > col("f80")).cast("long")).as("f_score"),
        (lit(1L) + (col("mon") > col("m20")).cast("long")
          + (col("mon") > col("m40")).cast("long")
          + (col("mon") > col("m60")).cast("long")
          + (col("mon") > col("m80")).cast("long")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("mon")).cast("decimal(38,0)").cast("double") / 100.0).as("monetary_dollars"),
        (sum(col("rec")).cast("double") / count(lit(1)).cast("double")).as("avg_recency_days"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q160_rfm_sql: String =
    """WITH mx AS (SELECT MAX(date_trunc('day', o_orderdate)::DATE) AS mx FROM orders),
      |per AS (
      |  SELECT o_custkey,
      |    CAST(mx - MAX(date_trunc('day', o_orderdate)::DATE) AS BIGINT) AS rec,
      |    CAST(COUNT(*) AS BIGINT) AS freq,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mon
      |  FROM orders CROSS JOIN mx GROUP BY o_custkey, mx),
      |vals AS (
      |  SELECT 'rec' AS metric, rec AS v FROM per
      |  UNION ALL SELECT 'freq', freq FROM per
      |  UNION ALL SELECT 'mon', mon FROM per),
      |hist AS (SELECT metric, v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2),
      |tot AS (SELECT metric, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
      |cum AS (
      |  SELECT metric, v, SUM(c) OVER (PARTITION BY metric ORDER BY v) AS cum
      |  FROM hist),
      |brk AS (
      |  SELECT c.metric, ps.pp AS p, MIN(c.v) AS q
      |  FROM cum c JOIN tot t USING (metric)
      |  CROSS JOIN (SELECT * FROM (VALUES (20), (40), (60), (80)) AS v(pp)) ps
      |  WHERE c.cum >= (ps.pp * t.n + 99) // 100
      |  GROUP BY 1, 2),
      |wide AS (
      |  SELECT
      |    MAX(CASE WHEN metric = 'rec' AND p = 20 THEN q END) AS r20,
      |    MAX(CASE WHEN metric = 'rec' AND p = 40 THEN q END) AS r40,
      |    MAX(CASE WHEN metric = 'rec' AND p = 60 THEN q END) AS r60,
      |    MAX(CASE WHEN metric = 'rec' AND p = 80 THEN q END) AS r80,
      |    MAX(CASE WHEN metric = 'freq' AND p = 20 THEN q END) AS f20,
      |    MAX(CASE WHEN metric = 'freq' AND p = 40 THEN q END) AS f40,
      |    MAX(CASE WHEN metric = 'freq' AND p = 60 THEN q END) AS f60,
      |    MAX(CASE WHEN metric = 'freq' AND p = 80 THEN q END) AS f80,
      |    MAX(CASE WHEN metric = 'mon' AND p = 20 THEN q END) AS m20,
      |    MAX(CASE WHEN metric = 'mon' AND p = 40 THEN q END) AS m40,
      |    MAX(CASE WHEN metric = 'mon' AND p = 60 THEN q END) AS m60,
      |    MAX(CASE WHEN metric = 'mon' AND p = 80 THEN q END) AS m80
      |  FROM brk),
      |scored AS (
      |  SELECT
      |    6 - (1 + CAST(rec > r20 AS BIGINT) + CAST(rec > r40 AS BIGINT)
      |         + CAST(rec > r60 AS BIGINT) + CAST(rec > r80 AS BIGINT)) AS r_score,
      |    1 + CAST(freq > f20 AS BIGINT) + CAST(freq > f40 AS BIGINT)
      |      + CAST(freq > f60 AS BIGINT) + CAST(freq > f80 AS BIGINT) AS f_score,
      |    1 + CAST(mon > m20 AS BIGINT) + CAST(mon > m40 AS BIGINT)
      |      + CAST(mon > m60 AS BIGINT) + CAST(mon > m80 AS BIGINT) AS m_score,
      |    rec, mon
      |  FROM per CROSS JOIN wide)
      |SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(mon) AS DOUBLE) / 100.0 AS monetary_dollars,
      |  CAST(SUM(rec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_recency_days
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q161 — PARETO / ABC revenue classification of parts: rank every
    * part by revenue, classify by cumulative share (A ≤ 70%,
    * B ≤ 90%, C the tail) — the inventory-policy cut. The part frame
    * scales with the catalog, so the global cumulative runs through
    * [[graft.operators.Sequence.globalPrefixSum]] — the two-pass
    * range-partitioned prefix sum (one parallel range exchange + one
    * map pass), NOT a single-task `sum OVER (ORDER BY …)`. Class
    * boundaries are exact integer comparisons (10·cum vs 7·total),
    * so no float rounding can move a part across a class edge.
    */
  def q161_abc(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((dec2(col("l_extendedprice")) * 100).cast("long")).as("cents"))
    abcFrom(rev)
  }

  /** The Pareto/ABC tail over a (l_partkey, cents) per-part revenue
    * frame — shared verbatim by batch q161 and its streaming twin
    * q214 (pairing #34): the range-partitioned global prefix sum,
    * the broadcast total, and the 70/90 class cuts all replay over
    * the entity-bounded frame.
    */
  private[queries] def abcFrom(rev: DataFrame): DataFrame = {
    val cum = graft.operators.Sequence.globalPrefixSum(
      rev, Seq(col("cents").desc, col("l_partkey")), "cents", "cum")
    val tot = rev.agg(sum(col("cents")).as("tot"))
    cum.crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(col("cum") * 10 <= col("tot") * 7, "A")
          .when(col("cum") * 10 <= col("tot") * 9, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        (sum(col("cents")).cast("decimal(38,0)").cast("double") / 100.0).as("revenue_dollars"),
        (sum(col("cents")).cast("double") / max(col("tot")).cast("double")).as("share"))
      .orderBy(col("abc_class"))
  }

  val q161_abc_sql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT l_partkey, cents,
      |    CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    (SELECT CAST(SUM(cents) AS BIGINT) FROM rev) AS tot
      |  FROM rev),
      |cls AS (
      |  SELECT CASE WHEN cum * 10 <= tot * 7 THEN 'A'
      |              WHEN cum * 10 <= tot * 9 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |    cents, tot
      |  FROM cum)
      |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue_dollars,
      |  CAST(SUM(cents) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE) AS share
      |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_streaks" -> (q158_streaks _),
    "q159_survival" -> (q159_survival _),
    "q160_rfm" -> (q160_rfm _),
    "q161_abc" -> (q161_abc _))

  val oracles: Map[String, String] = Map(
    "q158_streaks" -> q158_streaks_sql,
    "q159_survival" -> q159_survival_sql,
    "q160_rfm" -> q160_rfm_sql,
    "q161_abc" -> q161_abc_sql)
}
