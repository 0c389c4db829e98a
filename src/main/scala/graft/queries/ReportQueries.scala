package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism._
import graft.operators.CacheOnce.PersistFreshOps

/** Round-9 reporting / reconciliation family: the warehouse-facing
  * primitives an analytics stack publishes dashboards and data-quality
  * reports with — calendar gap-fill, bounded graph traversal, robust
  * outlier detection, marketing attribution, multi-level grouping,
  * anti-entropy table diff, and inequality metrics. deva serves these
  * through its stats/report pipe compositions (deva/core/pipe.py
  * windowing + accumulate + groupby chains); here each is one
  * declarative plan in its scale-safe shape.
  *
  * Shared discipline: order statistics (median, MAD, Gini ranks) come
  * from the VALUE-HISTOGRAM cumulative idiom (q117) — the corpus
  * collapses to a (group, value)-count frame bounded by the value
  * domain, so no per-row sort or row_number window ever runs; all
  * arithmetic is exact int64/decimal until one final IEEE cast.
  */
object ReportQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    (dec2(c) * 100).cast("long")

  /** q137 — calendar GAP-FILL with forward-fill (LOCF): per-user daily
    * purchase totals re-gridded onto the full (user × day) calendar
    * spine, missing days carrying the last observed value plus a
    * staleness counter — the snapshot-series shape every BI layer
    * expects (deva: sliding window + accumulate over a timer spine;
    * core/timer.py cadence + pipe.py:1270 sliding_window).
    *
    * Scale/shape: the only corpus-linear work is the (user, day)
    * aggregation with map-side partials. The day spine derives from a
    * 1-row global bound agg and BROADCASTS (days are calendar-bounded);
    * the users frame stays distributed, so the spine cross join is
    * map-side — |users|×|days| rows, dimension-sized, never shuffled
    * on its own. The LOCF window partitions by user ordered by day —
    * bounded by the calendar length, not the event count.
    */
  def q137_gap_fill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val days = ev.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val users = ev.select(col("user_id")).distinct()
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("s"))
    gapFillFrom(users, days, daily)
  }

  /** q137's spine join + LOCF windows from the three ingredient
    * frames — users (`user_id`), the day spine (`day`, broadcast by
    * the caller's construction: calendar-bounded), and the observed
    * daily frame (`user_id`, `day`, exact-decimal `s`). Shared
    * verbatim by the streaming twin q203 so batch and stream cannot
    * drift.
    */
  private[queries] def gapFillFrom(users: DataFrame, days: DataFrame,
      daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    users.crossJoin(broadcast(days))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("s"), ignoreNulls = true).over(w).cast("double").as("filled"),
        col("s").isNotNull.cast("int").as("observed"),
        datediff(col("day"),
          last(when(col("s").isNotNull, col("day")), ignoreNulls = true).over(w))
          .cast("long").as("days_stale"))
      .orderBy(col("user_id"), col("day"))
  }

  val q137_gap_fill_sql: String =
    """WITH ev AS (SELECT user_id, date_trunc('day', ts)::DATE AS day, event_type, value FROM events),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
      |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
      |users AS (SELECT DISTINCT user_id FROM ev),
      |daily AS (SELECT user_id, day, SUM(CAST(value AS DECIMAL(18,2))) AS s
      |          FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2),
      |sp AS (SELECT u.user_id, g.day, d.s
      |       FROM users u CROSS JOIN days g
      |       LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = g.day)
      |SELECT user_id, day,
      |  CAST(last_value(s IGNORE NULLS) OVER w AS DOUBLE) AS filled,
      |  CAST(s IS NOT NULL AS INTEGER) AS observed,
      |  CAST(day - last_value(CASE WHEN s IS NOT NULL THEN day END IGNORE NULLS) OVER w AS BIGINT) AS days_stale
      |FROM sp
      |WINDOW w AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day""".stripMargin

  /** q138 — bounded-depth BFS (k-hop reachability) over the part
    * co-occurrence graph (parts sharing ≥ 2 orders; the q118 edge
    * builder reused on the sparser part layer), from the seed set
    * `p_partkey % 100 = 0`, emitting each reached node's minimum hop
    * count ≤ 4. The iterative-traversal primitive behind "within N
    * degrees" audience / recall queries (deva: recursive traverse,
    * pipe.py:1013, bounded).
    *
    * Scale/shape: the traversal is [[graft.operators.KHop.expand]] —
    * exactly 4 plan iterations (no data-dependent driver loop); each
    * round is frontier⋈edges (shuffle on the frontier key), a
    * distinct, and an anti-join against the reached set — all hash
    * operations AQE can re-plan. Round frames are eager
    * localCheckpoints (1-round-deep lineage, flat final plan) and
    * their width is AQE's byte-based coalescing — scale-adaptive: a
    * catalog-sized reached set at 100× keeps advisory-sized parallel
    * tasks while sf0.1's tiny frames fold narrow (the r16 kernel
    * measurement; the r9 literal coalesce(1) stays gone). The oracle
    * proves the 4-round fixed point against DuckDB's recursive CTE.
    */
  def q138_khop(spark: SparkSession, dir: String): DataFrame =
    khopFrom(spark, dir, Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  /** The k-hop BFS tail over an (o, p) order-membership frame —
    * shared verbatim by batch q138 and its streaming twin q229
    * (pairing #49): co-occurrence edge build, symmetrization,
    * 4-hop frontier expansion from the sampled part sources.
    */
  private[queries] def khopFrom(spark: SparkSession, dir: String,
      op: DataFrame): DataFrame = {
    val edges = graft.operators.Triangles.cooccurrenceEdges(
      op, "o", "p", minSupport = 2)
    // ownership-aware cache (kcoreFrom builds the identical plan):
    // expand's rounds are eager localCheckpoints, so the edge cache is
    // unreachable past the call and can be released here (r16 — the
    // old persistFresh leaned on the caller's clearCache).
    val (bidir, releaseBidir) = graft.operators.CacheOnce.borrowPersist(
      edges.select(col("a").as("x"), col("b").as("y"))
        .unionByName(edges.select(col("b").as("x"), col("a").as("y"))))
    val src = Tables.part(spark, dir)
      .filter(pmod(col("p_partkey"), lit(100L)) === 0)
      .select(col("p_partkey").as("n"))
    val reached = graft.operators.KHop.expand(bidir, src, maxHops = 4)
    releaseBidir()
    reached.select(col("n").as("p_partkey"), col("hops")).orderBy(col("p_partkey"))
  }

  val q138_khop_sql: String =
    """WITH RECURSIVE os AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
      |e0 AS (SELECT a, b FROM (SELECT x.s AS a, y.s AS b, COUNT(*) AS c
      |        FROM os x JOIN os y ON x.o = y.o AND x.s < y.s GROUP BY 1, 2) WHERE c >= 2),
      |e AS (SELECT a AS x, b AS y FROM e0 UNION ALL SELECT b, a FROM e0),
      |src AS (SELECT p_partkey AS n FROM part WHERE p_partkey % 100 = 0),
      |r(n, hop) AS (SELECT n, 0 FROM src
      |  UNION SELECT e.y, r.hop + 1 FROM r JOIN e ON e.x = r.n WHERE r.hop < 4)
      |SELECT n AS p_partkey, CAST(MIN(hop) AS BIGINT) AS hops
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q244 — bounded WEIGHTED shortest paths (Bellman–Ford, 4
    * relaxation rounds) over the part co-purchase graph: edge cost
    * is INVERSE tie strength (1000 div shared-order count), so the
    * answer is each part's cheapest affinity path from the sampled
    * sources — the weighted generalization of q138's hop count
    * ("within N degrees" → "within N relaxations, preferring strong
    * ties"; deva: bounded recursive traverse, pipe.py:1013). A
    * 2-edge path through two strong ties can beat a 1-edge weak tie,
    * which is exactly what the hop metric cannot express.
    *
    * Scale/shape: the traversal is [[graft.operators.Sssp.relax]] —
    * exactly 4 plan iterations; each round one hash join against the
    * cached weighted edge frame + one min-agg shuffle, the dist
    * frame node-bounded and cut per round with an eager
    * localCheckpoint (dist side broadcasts; width is AQE's byte-based
    * coalescing — the r16 kernel measurement). Every cost is an int64
    * (div of positive ints); the oracle unrolls the same 4 rounds as
    * CTEs — same fixed point, no convergence test on either side.
    */
  def q244_sssp(spark: SparkSession, dir: String): DataFrame =
    ssspFrom(spark, dir, Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  /** The bounded-SSSP tail over an (o, p) order-membership frame —
    * shared verbatim by batch q244 and its streaming twin q245
    * (pairing #64): support-weighted co-occurrence edge build,
    * inverse-strength costs, symmetrization, 4 Bellman–Ford rounds
    * from the sampled part sources.
    */
  private[queries] def ssspFrom(spark: SparkSession, dir: String,
      op: DataFrame): DataFrame = {
    val sup = graft.operators.Triangles.cooccurrenceSupport(
        op, "o", "p", minSupport = 2)
      .withColumn("w", expr("1000 div support"))
    // ownership-aware cache (VERDICT r13 item 4): persist unless an
    // identical-plan entry is already live, and release only what THIS
    // call created — relax's result is an eager localCheckpoint
    // (lineage cut), so an owned edge cache is unreachable past it.
    val (bidir, releaseBidir) = graft.operators.CacheOnce.borrowPersist(
      sup.select(col("a").as("x"), col("b").as("y"), col("w"))
        .unionByName(sup.select(col("b").as("x"), col("a").as("y"), col("w"))))
    val src = Tables.part(spark, dir)
      .filter(pmod(col("p_partkey"), lit(100L)) === 0)
      .select(col("p_partkey").as("n"))
    val dist = graft.operators.Sssp.relax(bidir, src, rounds = 4)
    releaseBidir()
    dist.select(col("n").as("p_partkey"), col("d").as("dist"))
      .orderBy(col("p_partkey"))
  }

  val q244_sssp_sql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
      |e0 AS (SELECT a, b, c FROM (SELECT x.s AS a, y.s AS b, COUNT(*) AS c
      |        FROM os x JOIN os y ON x.o = y.o AND x.s < y.s GROUP BY 1, 2) WHERE c >= 2),
      |e AS (SELECT a AS x, b AS y, 1000 // c AS w FROM e0 UNION ALL SELECT b, a, 1000 // c FROM e0),
      |d0 AS (SELECT DISTINCT p_partkey AS n, CAST(0 AS BIGINT) AS d FROM part WHERE p_partkey % 100 = 0),
      |d1 AS (SELECT n, MIN(d) AS d FROM (SELECT n, d FROM d0 UNION ALL
      |        SELECT e.y AS n, d0.d + e.w AS d FROM d0 JOIN e ON e.x = d0.n) GROUP BY 1),
      |d2 AS (SELECT n, MIN(d) AS d FROM (SELECT n, d FROM d1 UNION ALL
      |        SELECT e.y AS n, d1.d + e.w AS d FROM d1 JOIN e ON e.x = d1.n) GROUP BY 1),
      |d3 AS (SELECT n, MIN(d) AS d FROM (SELECT n, d FROM d2 UNION ALL
      |        SELECT e.y AS n, d2.d + e.w AS d FROM d2 JOIN e ON e.x = d2.n) GROUP BY 1),
      |d4 AS (SELECT n, MIN(d) AS d FROM (SELECT n, d FROM d3 UNION ALL
      |        SELECT e.y AS n, d3.d + e.w AS d FROM d3 JOIN e ON e.x = d3.n) GROUP BY 1)
      |SELECT n AS p_partkey, d AS dist FROM d4 ORDER BY 1""".stripMargin

  /** q249 — k-CORE survivors (k=3, 4 peeling rounds) of the part
    * co-purchase graph: repeatedly remove parts with fewer than 3
    * qualifying co-purchase ties among survivors; what remains is
    * the structurally DENSE cluster set — the screen that separates
    * a genuinely dense community from a big-but-stringy component
    * (q180 counts components; this asks which of their nodes are
    * core). The dedup/curation layer's density question: q122's
    * contamination cliques require complete subgraphs, cores catch
    * the near-cliques spam/bot rings actually form.
    *
    * Scale/shape: the traversal is [[graft.operators.KCore.peel]] —
    * exactly 4 plan iterations; each round two hash joins of the
    * cached edge frame against the node-bounded survivor set (cut
    * per round with an eager localCheckpoint; survivors broadcast)
    * plus one count-agg shuffle. Output
    * is each final survivor with the integer degree the final filter
    * judged; the oracle unrolls the same 4 peels as CTEs.
    */
  def q249_kcore(spark: SparkSession, dir: String): DataFrame =
    kcoreFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  /** The k-core tail over an (o, p) order-membership frame — shared
    * verbatim by batch q249 and its streaming twin q250 (pairing
    * #67): co-occurrence edge build, symmetrization, 4 peeling
    * rounds at k=3.
    */
  private[queries] def kcoreFrom(op: DataFrame): DataFrame = {
    val edges = graft.operators.Triangles.cooccurrenceEdges(
      op, "o", "p", minSupport = 2)
    // ownership-aware cache: this bidir is the SAME canonicalized plan
    // as khopFrom's (identical construction over the same input), so a
    // prior k-hop invocation may hold it live — borrow, don't re-persist
    // (the CacheManager warning class) or steal-release (VERDICT r13
    // item 4). peel's result is an eager localCheckpoint, so an owned
    // cache is unreachable past it.
    val (bidir, releaseBidir) = graft.operators.CacheOnce.borrowPersist(
      edges.select(col("a").as("x"), col("b").as("y"))
        .unionByName(edges.select(col("b").as("x"), col("a").as("y"))))
    val core = graft.operators.KCore.peel(bidir, k = 3L, rounds = 4)
    releaseBidir()
    core.select(col("n").as("p_partkey"), col("d").as("core_deg"))
      .orderBy(col("p_partkey"))
  }

  val q249_kcore_sql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
      |e0 AS (SELECT a, b FROM (SELECT x.s AS a, y.s AS b, COUNT(*) AS c
      |        FROM os x JOIN os y ON x.o = y.o AND x.s < y.s GROUP BY 1, 2) WHERE c >= 2),
      |e AS (SELECT a AS x, b AS y FROM e0 UNION ALL SELECT b, a FROM e0),
      |s0 AS (SELECT DISTINCT x AS n FROM e),
      |d1 AS (SELECT e.x AS n, COUNT(*) AS d FROM e JOIN s0 a ON e.x = a.n JOIN s0 b ON e.y = b.n GROUP BY 1),
      |s1 AS (SELECT n FROM d1 WHERE d >= 3),
      |d2 AS (SELECT e.x AS n, COUNT(*) AS d FROM e JOIN s1 a ON e.x = a.n JOIN s1 b ON e.y = b.n GROUP BY 1),
      |s2 AS (SELECT n FROM d2 WHERE d >= 3),
      |d3 AS (SELECT e.x AS n, COUNT(*) AS d FROM e JOIN s2 a ON e.x = a.n JOIN s2 b ON e.y = b.n GROUP BY 1),
      |s3 AS (SELECT n FROM d3 WHERE d >= 3),
      |d4 AS (SELECT e.x AS n, COUNT(*) AS d FROM e JOIN s3 a ON e.x = a.n JOIN s3 b ON e.y = b.n GROUP BY 1)
      |SELECT n AS p_partkey, d AS core_deg FROM d4 WHERE d >= 3 ORDER BY 1""".stripMargin

  /** q139 — ROBUST outlier counts per event type: median / MAD
    * (median absolute deviation) with the |x − med| > 3·MAD rule —
    * the outlier detector that, unlike q108's mean/stddev z-score,
    * a single corrupted batch cannot drag (50% breakdown point).
    *
    * Exactness: medians come from the value-histogram cumulative
    * idiom (q117) — lo/hi middle elements selected by integer rank
    * targets, reported as med2 = lo + hi (twice the median, always
    * int64, no .5 rounding decision anywhere). Deviations are
    * half-cent integers d = |2c − med2|; their median mad2 = lo + hi
    * likewise. The outlier test 2·d > 3·mad2 is the exact integer
    * form of |x − med| > 3·MAD. Every number in the output is int64.
    *
    * Scale/shape: the corpus collapses FIRST to the (type, cents)
    * histogram (value-domain bounded); the d-histogram derives from
    * it by re-keying — no second corpus pass, no row-level window,
    * no sort. The med/mad frames are type-sized and broadcast.
    */
  def q139_mad_outliers(spark: SparkSession, dir: String): DataFrame =
    madFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), cents(col("value")).as("c"))
      .agg(count(lit(1)).as("cnt")))

  /** q139's med/MAD/outlier report from the (event_type, c, cnt)
    * value histogram. Shared verbatim by the streaming twin q204 so
    * batch and stream cannot drift.
    */
  private[queries] def madFrom(hist0: DataFrame): DataFrame = {
    val hist = hist0.persistFresh()
    hist.count() // eager: three consumers race a cold cache's partition locks otherwise (the q104 lesson)
    // med2 per type in ONE window + agg pass: the group total rides
    // the same exchange as the cumulative (an unbounded-frame sum —
    // no tot-frame join), and lo/hi collapse to conditional mins.
    // The first-shipped shape paid a pyramid of label-sized
    // broadcast-join jobs (tot joined 4×, lo⋈hi twice) — 7.4 s of
    // job overhead at sf0.1 for 5 output rows; this is 4 passes total.
    def med2Of(h: DataFrame, vCol: String): DataFrame = {
      val wc = Window.partitionBy(col("event_type")).orderBy(col(vCol))
      val wt = Window.partitionBy(col("event_type"))
      h.withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(wt))
        .groupBy(col("event_type"))
        .agg((min(when(col("cum") >= expr("(n + 1) div 2"), col(vCol)))
          + min(when(col("cum") >= expr("(n + 2) div 2"), col(vCol)))).as("m2"),
          max(col("n")).as("n"))
    }
    val med = med2Of(hist, "c").select(col("event_type"), col("m2").as("med2"), col("n"))
    val dhist = hist.join(broadcast(med.select(col("event_type"), col("med2"))), "event_type")
      .groupBy(col("event_type"), abs(lit(2) * col("c") - col("med2")).as("d"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = med2Of(dhist, "d").select(col("event_type"), col("m2").as("mad2"))
    val outs = hist.join(broadcast(med.select(col("event_type"), col("med2"))), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(sum(when(lit(2) * abs(lit(2) * col("c") - col("med2")) > lit(3) * col("mad2"),
        col("cnt")).otherwise(0L)).as("n_out"))
    med.join(broadcast(mad), "event_type").join(broadcast(outs), "event_type")
      .select(col("event_type"), col("n"), col("med2"), col("mad2"), col("n_out"))
      .orderBy(col("event_type"))
  }

  val q139_mad_outliers_sql: String =
    """WITH hist AS (SELECT event_type, CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS c, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cum AS (SELECT event_type, c, cnt, SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum FROM hist),
      |tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
      |lo AS (SELECT c.event_type, MIN(c.c) AS lo FROM cum c JOIN tot t USING (event_type)
      |       WHERE c.cum >= (t.n + 1) // 2 GROUP BY 1),
      |hi AS (SELECT c.event_type, MIN(c.c) AS hi FROM cum c JOIN tot t USING (event_type)
      |       WHERE c.cum >= (t.n + 2) // 2 GROUP BY 1),
      |med AS (SELECT event_type, lo + hi AS med2 FROM lo JOIN hi USING (event_type)),
      |dh AS (SELECT h.event_type, ABS(2*h.c - m.med2) AS d, CAST(SUM(h.cnt) AS BIGINT) AS cnt
      |       FROM hist h JOIN med m USING (event_type) GROUP BY 1, 2),
      |dcum AS (SELECT event_type, d, cnt, SUM(cnt) OVER (PARTITION BY event_type ORDER BY d) AS cum FROM dh),
      |dlo AS (SELECT c.event_type, MIN(c.d) AS lo FROM dcum c JOIN tot t USING (event_type)
      |        WHERE c.cum >= (t.n + 1) // 2 GROUP BY 1),
      |dhi AS (SELECT c.event_type, MIN(c.d) AS hi FROM dcum c JOIN tot t USING (event_type)
      |        WHERE c.cum >= (t.n + 2) // 2 GROUP BY 1),
      |mad AS (SELECT event_type, lo + hi AS mad2 FROM dlo JOIN dhi USING (event_type)),
      |outs AS (SELECT h.event_type,
      |           CAST(SUM(CASE WHEN 2*ABS(2*h.c - m.med2) > 3*a.mad2 THEN h.cnt ELSE 0 END) AS BIGINT) AS n_out
      |         FROM hist h JOIN med m USING (event_type) JOIN mad a USING (event_type) GROUP BY 1)
      |SELECT t.event_type, t.n, m.med2, a.mad2, o.n_out
      |FROM tot t JOIN med m USING (event_type) JOIN mad a USING (event_type) JOIN outs o USING (event_type)
      |ORDER BY 1""".stripMargin

  /** q140 — LAST-TOUCH marketing attribution: each purchase attributes
    * its revenue to the user's most recent preceding non-purchase
    * event type (the "channel"); purchases with no prior touch fall
    * to 'direct'. The workhorse attribution model (deva: latest +
    * combine_latest keyed per user; core/pipe.py:472).
    *
    * Scale/shape: ONE pass — a per-user window ordered by (ts,
    * event_id) carries the last non-purchase type via
    * last(..., ignoreNulls) over ROWS UNBOUNDED PRECEDING..1
    * PRECEDING (running state, not a re-scan per row); the window
    * partitions by user so state never crosses executors, and the
    * final channel agg is label-sized. Revenue stays exact cents
    * until the one final double division.
    */
  def q140_attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        cents(col("value")).as("cents"))
      .withColumn("ch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("ch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("cents")).cast("decimal(38,0)").cast("double") / 100).as("revenue"))
      .orderBy(col("channel"))
  }

  val q140_attribution_sql: String =
    """WITH ev AS (SELECT user_id, ts, event_id, event_type,
      |        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
      |att AS (SELECT event_type, cents,
      |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
      |  FROM ev)
      |SELECT COALESCE(ch, 'direct') AS channel, COUNT(*) AS n_purchases,
      |  CAST(CAST(SUM(cents) AS DECIMAL(38,0)) AS DOUBLE) / 100 AS revenue
      |FROM att WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q141 — GROUPING SETS with grouping flags: the (flag, status),
    * (flag), () level stack in ONE aggregation pass — the native
    * multi-level rollup report (beyond q33's rollup / q96's cube:
    * arbitrary level sets), via Spark 4's Dataset.groupingSets.
    *
    * Scale/shape: one Expand (×3) over the 2-column pruned
    * projection feeding one hash agg with map-side partials —
    * exactly the plan rollup/cube lower to; grouping() flags are
    * computed from the expand's gid, costing nothing extra.
    */
  def q141_grouping_sets(spark: SparkSession, dir: String): DataFrame =
    groupingSetsFrom(Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("l_extendedprice"))).as("sc")))

  /** The GROUPING SETS tail over pre-aggregated
    * (returnflag, linestatus, n, sc) CELLS — shared verbatim by
    * batch q141 and its streaming twin q237 (pairing #57); same
    * exact-decimal cell argument as RelationalQueries.rollupFrom.
    */
  private[queries] def groupingSetsFrom(cells: DataFrame): DataFrame = {
    cells
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        sum(col("n")).as("n"),
        sum(col("sc")).cast("double").as("rev"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
  }

  val q141_grouping_sets_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** q142 — ANTI-ENTROPY bucket fingerprint diff: reconcile a table
    * against a (simulated) replica that lost the `l_orderkey % 997 =
    * 13` slice, by comparing per-bucket (count, fingerprint-sum)
    * pairs — the Merkle-style primitive that locates divergence in a
    * 100 TB replica pair while moving only `buckets` rows per side
    * (deva: DBStream store reconciliation; store.py:44's keyed sync).
    *
    * Determinism: row fingerprint = hash60(key‖payload) mod 1e9+7
    * (portable md5-based hash, Determinism §4); the per-bucket SUM of
    * ≤1e9 residues stays far inside int64 up to ~9e9 rows per bucket —
    * beyond that, widen to DECIMAL(38,0) partials (documented bound).
    * Addition is commutative, so the fingerprint is partition-order
    * free — the property that makes it work map-side at any scale.
    *
    * Scale/shape: ONE scan computes both sides' partials as
    * conditional aggregates (the replica is a subset predicate); a
    * real two-cluster reconciliation runs the same plan per side and
    * joins the 64-row summaries. Differing buckets then bound the
    * row-level re-sync to 1/64 of the key space per hit.
    */
  def q142_bucket_diff(spark: SparkSession, dir: String): DataFrame =
    bucketDiffFrom(bucketDiffRows(Tables.lineitem(spark, dir))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_primary"),
        sum(col("fp")).as("fp_primary"),
        sum(when(col("r"), 1L).otherwise(0L)).as("n_replica"),
        sum(when(col("r"), col("fp")).otherwise(0L)).as("fp_replica")))

  /** Per-row fingerprint prep shared by batch q142 and its streaming
    * twin q238 (pairing #58): the deterministic hash60 row
    * fingerprint, the 64-way bucket, and the simulated-replica-gap
    * flag, computed IN PLAN on both sides so the folded sums cannot
    * drift.
    */
  private[queries] def bucketDiffRows(li0: DataFrame): DataFrame = {
    val li = li0.select(
      col("l_orderkey").as("okey"), col("l_linenumber").as("lineno"),
      cents(col("l_quantity")).as("qc"), cents(col("l_extendedprice")).as("pc"))
    val fp = pmod(hash60(concat_ws("|", col("okey"), col("lineno"), col("qc"), col("pc"))),
      lit(1000000007L))
    val inReplica = !(pmod(col("okey"), lit(997L)) === 13)
    li.select(col("okey"), col("lineno"),
      pmod(col("okey"), lit(64L)).as("bucket"), fp.as("fp"), inReplica.as("r"))
  }

  /** The diff-report tail over per-bucket (n/fingerprint-sum) CELLS —
    * shared verbatim by batch q142 and its streaming twin q238.
    */
  private[queries] def bucketDiffFrom(cells: DataFrame): DataFrame =
    cells
      .withColumn("diff",
        (col("n_primary") =!= col("n_replica") || col("fp_primary") =!= col("fp_replica"))
          .cast("int"))
      .orderBy(col("bucket"))

  val q142_bucket_diff_sql: String =
    """WITH li AS (SELECT l_orderkey AS okey, l_linenumber AS lineno,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
      |  FROM lineitem),
      |rows_fp AS (SELECT okey % 64 AS bucket,
      |    (('0x' || substr(md5(concat_ws('|', okey, lineno, qc, pc)), 1, 15))::BIGINT) % 1000000007 AS fp,
      |    (NOT okey % 997 = 13) AS r
      |  FROM li)
      |SELECT bucket,
      |  COUNT(*) AS n_primary,
      |  CAST(SUM(fp) AS BIGINT) AS fp_primary,
      |  CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_replica,
      |  CAST(SUM(CASE WHEN r THEN fp ELSE 0 END) AS BIGINT) AS fp_replica,
      |  CAST(COUNT(*) <> SUM(CASE WHEN r THEN 1 ELSE 0 END)
      |       OR CAST(SUM(fp) AS BIGINT) <> CAST(SUM(CASE WHEN r THEN fp ELSE 0 END) AS BIGINT)
      |       AS INTEGER) AS diff
      |FROM rows_fp GROUP BY 1 ORDER BY 1""".stripMargin

  /** q144 — GINI coefficient of order spend per region: the standard
    * inequality report over a revenue distribution, computed from the
    * rank-weighted sum G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) — but with
    * ranks taken from the value-histogram cumulative frame, never a
    * per-row row_number: a tied-value run [cumPrev+1 .. cum]
    * contributes x·cnt·(2·cum − cnt + 1) to 2·Σi·x in closed form.
    *
    * Exactness: order cents are int64; the rank-weighted partial is
    * computed in DECIMAL(38,0) (the one place int64 would overflow at
    * ~1e10 rows/region) and both engines sum decimals exactly; the
    * single IEEE division happens on two identical doubles.
    *
    * Scale/shape: corpus → (region, cents) histogram (one shuffle,
    * value-domain bounded) → cumulative window over the histogram →
    * region-sized final agg. No sort, no row-level window.
    */
  def q144_gini(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), cents(col("o_totalprice")).as("c"))
    val hist = ords.groupBy(col("r_name"), col("c")).agg(count(lit(1)).as("cnt"))
    giniFrom(hist)
  }

  /** The Gini tail over a (r_name, c, cnt) cents-value histogram —
    * shared verbatim by batch q144 and its streaming twin q211
    * (pairing #31): the cumulative-count window runs over the
    * value-domain-bounded histogram (never per row), and the final
    * coefficient is one IEEE division of exact decimals.
    */
  private[queries] def giniFrom(hist: DataFrame): DataFrame = {
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("r_name")).orderBy(col("c"))))
    cum.groupBy(col("r_name"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("c").cast("decimal(38,0)") * col("cnt")).as("sx"),
        sum(col("c").cast("decimal(38,0)") * col("cnt") * (lit(2) * col("cum") - col("cnt") + 1)).as("s2"))
      .select(col("r_name"), col("n"),
        ((col("s2") - col("sx") * (col("n") + 1)).cast("double")
          / (col("sx") * col("n")).cast("double")).as("gini"))
      .orderBy(col("r_name"))
  }

  val q144_gini_sql: String =
    """WITH ords AS (
      |  SELECT r_name, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |hist AS (SELECT r_name, c, COUNT(*) AS cnt FROM ords GROUP BY 1, 2),
      |cum AS (SELECT r_name, c, cnt, SUM(cnt) OVER (PARTITION BY r_name ORDER BY c) AS cum FROM hist),
      |agg AS (SELECT r_name, CAST(SUM(cnt) AS BIGINT) AS n,
      |    SUM(CAST(c AS DECIMAL(38,0)) * cnt) AS sx,
      |    SUM(CAST(c AS DECIMAL(38,0)) * cnt * (2*cum - cnt + 1)) AS s2
      |  FROM cum GROUP BY 1)
      |SELECT r_name, n,
      |  CAST(s2 - sx * (n + 1) AS DOUBLE) / CAST(sx * n AS DOUBLE) AS gini
      |FROM agg ORDER BY r_name""".stripMargin

  /** q145 — market-basket ASSOCIATION RULES: top-20 part pairs by
    * lift, with support and confidence — the classic affinity report
    * (the graph layer q118/q138 threshold into edges, here surfaced
    * with its probabilistic strengths; deva: frequencies + groupby
    * composition).
    *
    * Scale/shape: ONE shuffle builds per-order member sets
    * (collect_set partials dedup map-side — the q118 edge-build
    * idiom, giant orders capped loudly); pair expansion is bounded by
    * order size; item supports come from re-exploding the SAME
    * collected frame (no second corpus scan). The supports join is
    * pair-keyed (never collected); the 1-row order count broadcasts.
    * Top-20 by (lift, ant, cons) total order → TakeOrderedAndProject,
    * no global sort. Confidence/lift are single IEEE ops over exact
    * int64 counts, identically associated in both engines.
    */
  def q145_assoc_rules(spark: SparkSession, dir: String): DataFrame =
    assocRulesFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  /** The association-rules tail over an (o, p) order-membership
    * frame — shared verbatim by batch q145 and its streaming twin
    * q227 (pairing #47): basket build, support counts, pair
    * expansion (capped), confidence/lift scoring, top-20.
    */
  private[queries] def assocRulesFrom(op: DataFrame): DataFrame = {
    val sets = op
      .groupBy(col("o")).agg(collect_set(col("p")).as("ms"))
      .persistFresh()
    sets.count() // eager: three consumers race a cold cache's partition locks otherwise (the q104 lesson)
    val nOrders = sets.agg(count(lit(1)).as("n_orders"))
    val sup = sets.select(explode(col("ms")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("s"))
    val pairs = sets.filter(size(col("ms")) > 1)
      .withColumn("ms", graft.operators.Dedup.cappedMembers(col("ms"), 10000, "assoc order"))
      .select(col("ms"), explode(col("ms")).as("x"))
      .select(col("x"), explode(graft.operators.Dedup.membersAbove(col("ms"), col("x"))).as("y"))
      .groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("sab"))
      .filter(col("sab") >= 3)
    val withSup = pairs
      .join(sup.select(col("p").as("a"), col("s").as("sa")), "a")
      .join(sup.select(col("p").as("b"), col("s").as("sb")), "b")
    val rules = withSup.select(col("a").as("ant"), col("b").as("cons"),
        col("sab"), col("sa").as("s_ant"), col("sb").as("s_cons"))
      .unionByName(withSup.select(col("b").as("ant"), col("a").as("cons"),
        col("sab"), col("sb").as("s_ant"), col("sa").as("s_cons")))
    rules.crossJoin(broadcast(nOrders))
      .select(col("ant"), col("cons"), col("sab"),
        (col("sab").cast("double") / col("s_ant")).as("conf"),
        ((col("sab").cast("double") * col("n_orders"))
          / (col("s_ant").cast("double") * col("s_cons"))).as("lift"))
      .orderBy(col("lift").desc, col("ant"), col("cons"))
      .limit(20)
  }

  val q145_assoc_rules_sql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM os),
      |sup AS (SELECT p, COUNT(*) AS s FROM os GROUP BY 1),
      |pairs AS (SELECT x.p AS a, y.p AS b, COUNT(*) AS sab
      |          FROM os x JOIN os y ON x.o = y.o AND x.p < y.p
      |          GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |rules AS (
      |  SELECT a AS ant, b AS cons, sab, sa.s AS s_ant, sb.s AS s_cons FROM pairs
      |    JOIN sup sa ON sa.p = pairs.a JOIN sup sb ON sb.p = pairs.b
      |  UNION ALL
      |  SELECT b, a, sab, sb.s, sa.s FROM pairs
      |    JOIN sup sa ON sa.p = pairs.a JOIN sup sb ON sb.p = pairs.b)
      |SELECT ant, cons, sab,
      |  CAST(sab AS DOUBLE) / s_ant AS conf,
      |  (CAST(sab AS DOUBLE) * n_orders) / (CAST(s_ant AS DOUBLE) * s_cons) AS lift
      |FROM rules CROSS JOIN n
      |ORDER BY lift DESC, ant, cons LIMIT 20""".stripMargin

  /** q146 — funnel CONVERSION-LAG quantiles: per weekday of a user's
    * first view, the exact p50/p90/p99 of the first-view → first
    * -subsequent-purchase latency — composing the funnel ordering
    * (56h) with the exact-quantile histogram idiom (56m) into the
    * time-to-convert report every growth dashboard quotes.
    *
    * Scale/shape: two label-keyed aggregations collapse the corpus to
    * one row per converting user; latencies quantize to SECONDS so
    * the quantile histogram is value-domain bounded (~1e6 distinct
    * lags max, regardless of user count) and partitions by weekday —
    * no partition-less window, no sort. Rank targets are the q117
    * integer-exact form.
    */
  def q146_conversion_lag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val fp = ev.filter(col("event_type") === "purchase")
      .join(fv, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy(col("user_id"), col("v_us")).agg(min(col("us")).as("p_us"))
    lagQuantilesFrom(fp)
  }

  /** q146's histogram/percentile pipeline from the per-user
    * conversion frame (v_us first-view µs, p_us first-later-purchase
    * µs) — shared with the streaming twin q200, whose per-user state
    * machine emits exactly one (v_us, p_us) fact per converting user.
    */
  private[queries] def lagQuantilesFrom(fp: DataFrame): DataFrame = {
    val hist = fp.select(
        (dayofweek(timestamp_micros(col("v_us"))) - 1).cast("long").as("dow"),
        expr("(p_us - v_us) div 1000000").as("d_s"))
      .groupBy(col("dow"), col("d_s")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("dow")).orderBy(col("d_s"))))
    val tot = hist.groupBy(col("dow")).agg(sum(col("c")).as("n"))
    cum.join(broadcast(tot), "dow")
      .select(col("dow"), col("d_s"), col("cum"), col("n"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      .filter(col("cum") >= expr("(p * n + 99) div 100"))
      .groupBy(col("dow"), col("p"), col("n"))
      .agg(min(col("d_s")).as("lag_s"))
      .select(col("dow"), col("p"), col("lag_s"), col("n"))
      .orderBy(col("dow"), col("p"))
  }

  val q146_conversion_lag_sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |fv AS (SELECT user_id, MIN(us) AS v_us FROM ev WHERE event_type = 'view' GROUP BY 1),
      |fp AS (SELECT e.user_id, fv.v_us, MIN(e.us) AS p_us
      |       FROM ev e JOIN fv ON fv.user_id = e.user_id
      |       WHERE e.event_type = 'purchase' AND e.us > fv.v_us GROUP BY 1, 2),
      |d AS (SELECT CAST(dayofweek(make_timestamp(v_us)) AS BIGINT) AS dow,
      |             (p_us - v_us) // 1000000 AS d_s
      |      FROM fp),
      |hist AS (SELECT dow, d_s, COUNT(*) AS c FROM d GROUP BY 1, 2),
      |cum AS (SELECT dow, d_s, c, SUM(c) OVER (PARTITION BY dow ORDER BY d_s) AS cum FROM hist),
      |tot AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
      |ps AS (SELECT * FROM (VALUES (50), (90), (99)) t(pp))
      |SELECT c.dow, CAST(ps.pp AS BIGINT) AS p, MIN(c.d_s) AS lag_s, t.n
      |FROM cum c JOIN tot t USING (dow) CROSS JOIN ps
      |WHERE c.cum >= (ps.pp * t.n + 99) // 100
      |GROUP BY 1, 2, 4 ORDER BY 1, 2""".stripMargin

  /** q147 — WEIGHTED median: per return flag, the quantity-weighted
    * median unit price — the order statistic a revenue report wants
    * when rows carry unequal mass (deva: stats pipes over weighted
    * accumulate). Generalizes 56aa: rank targets move from counts to
    * integer WEIGHT mass; same value-histogram shape, same lo+hi
    * twice-median convention, every number int64.
    *
    * Scale/shape: corpus → (flag, price-cents) histogram with
    * sum-of-weight partials (ONE shuffle, value-domain bounded); the
    * weighted total rides the same window exchange as the cumulative
    * (unbounded-frame sum — the q139 lesson, no tot-frame join
    * pyramid); conditional mins in one agg.
    */
  def q147_weighted_median(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("rf"), cents(col("l_extendedprice")).as("v"))
      .agg(sum(cents(col("l_quantity"))).cast("long").as("w"))
    weightedMedianFrom(hist)
  }

  /** The weighted-median tail over a (rf, v, w) value-weight
    * histogram — shared verbatim by batch q147 and its streaming
    * twin q212 (pairing #32): both rank targets resolve by one
    * cumulative window over the value-domain-bounded histogram.
    */
  private[queries] def weightedMedianFrom(hist: DataFrame): DataFrame = {
    val wc = Window.partitionBy(col("rf")).orderBy(col("v"))
    val wt = Window.partitionBy(col("rf"))
    hist
      .withColumn("cum", sum(col("w")).over(wc))
      .withColumn("tw", sum(col("w")).over(wt))
      .groupBy(col("rf"))
      .agg((min(when(col("cum") >= expr("(tw + 1) div 2"), col("v")))
        + min(when(col("cum") >= expr("(tw + 2) div 2"), col("v")))).as("wmed2"),
        max(col("tw")).as("total_weight"))
      .orderBy(col("rf"))
  }

  val q147_weighted_median_sql: String =
    """WITH hist AS (SELECT l_returnflag AS rf,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS v,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (SELECT rf, v, w, SUM(w) OVER (PARTITION BY rf ORDER BY v) AS cum,
      |               SUM(w) OVER (PARTITION BY rf) AS tw FROM hist)
      |SELECT rf, MIN(CASE WHEN cum >= (tw + 1) // 2 THEN v END)
      |         + MIN(CASE WHEN cum >= (tw + 2) // 2 THEN v END) AS wmed2,
      |       CAST(MAX(tw) AS BIGINT) AS total_weight
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** q148 — UNPIVOT (melt): the inverse of q120's wide pivot — a
    * wide per-user frame of per-type exact-decimal totals melts back
    * to (user, type, total) rows via Spark's native Dataset.unpivot
    * (the transpose surface deva serves with `transpose`/attr
    * plucking, pipe.py:1129 family, in its long-to-wide-to-long
    * round trip).
    *
    * Scale/shape: the wide frame is ONE conditional-agg pass (q120's
    * idiom); unpivot is a map-side Expand ×5 over the already
    * user-sized frame — no shuffle, no UDF; exact decimals cast to
    * double only at the output edge.
    */
  def q148_unpivot(spark: SparkSession, dir: String): DataFrame =
    unpivotFrom(Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(dec2(col("value"))).as("sc")))

  /** The widen-then-melt tail over pre-aggregated
    * (user_id, event_type, sc) CELLS — shared verbatim by batch q148
    * and its streaming twin q241 (pairing #61); the conditional sums
    * over cells are exact-decimal identities of the row-level sums.
    */
  private[queries] def unpivotFrom(cells: DataFrame): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.map(t =>
      sum(when(col("event_type") === t, col("sc")).otherwise(lit(0).cast("decimal(28,2)")))
        .as(t))
    val wide = cells
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
    wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "total")
      .select(col("user_id"), col("event_type"), col("total").cast("double").as("total"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q148_unpivot_sql: String =
    """WITH wide AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS click,
      |    SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS view,
      |    SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS purchase,
      |    SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS signup,
      |    SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS error
      |  FROM events GROUP BY 1)
      |SELECT user_id, event_type, CAST(total AS DOUBLE) AS total
      |FROM (UNPIVOT wide ON click, view, purchase, signup, error INTO NAME event_type VALUE total)
      |ORDER BY user_id, event_type""".stripMargin

  /** q174 — ITEM-ITEM collaborative filtering: top-5 nearest
    * neighbors per part by co-purchase COSINE cxy/√(cx·cy) — the
    * "customers who bought X also bought Y" recommender primitive.
    * Completes the basket family: q145's lift is the probabilistic
    * surface, cosine is the normalized-similarity surface the
    * item-kNN recommender serves from.
    *
    * Scale/shape: q145's one-shuffle idiom — per-order member sets
    * built ONCE (collect_set dedups map-side, giant orders capped
    * loudly), item counts re-explode the SAME cached frame, pair
    * expansion is order-size-bounded. The per-part top-5 runs through
    * GroupTopK (skew-proof two-pass — a staple part with thousands of
    * neighbors never funnels one task). Cosine is one double division
    * of exact integer counts, identical IEEE both engines; min
    * co-support 3 keeps the candidate frame support-bounded.
    */
  def q174_item_cf(spark: SparkSession, dir: String): DataFrame =
    itemCfFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  /** The item-item collaborative-filtering tail over an (o, p)
    * order-membership frame — shared verbatim by batch q174 and its
    * streaming twin q228 (pairing #48): co-occurrence counts,
    * cosine scoring against item frequencies, per-item top-5.
    */
  private[queries] def itemCfFrom(op: DataFrame): DataFrame = {
    val sets = op
      .groupBy(col("o")).agg(collect_set(col("p")).as("ms"))
      .persistFresh()
    sets.count() // eager: two consumers race a cold cache otherwise (q104 lesson)
    val cx = sets.select(explode(col("ms")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = sets.filter(size(col("ms")) > 1)
      .withColumn("ms", graft.operators.Dedup.cappedMembers(col("ms"), 10000, "cf order"))
      .select(col("ms"), explode(col("ms")).as("x"))
      .select(col("x"), explode(graft.operators.Dedup.membersAbove(col("ms"), col("x"))).as("y"))
      .groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 3)
    val sym = pairs.select(col("a").as("part"), col("b").as("nb"), col("cxy"))
      .unionByName(pairs.select(col("b").as("part"), col("a").as("nb"), col("cxy")))
    val scored = sym
      .join(cx.select(col("p").as("part"), col("c").as("ca")), "part")
      .join(cx.select(col("p").as("nb"), col("c").as("cb")), "nb")
      .select(col("part"), col("nb"), col("cxy"),
        (col("cxy").cast("double") / sqrt((col("ca") * col("cb")).cast("double"))).as("cosine"))
    graft.operators.GroupTopK.rank(scored, Seq("part"),
        Seq(col("cosine").desc, col("nb")), 5, "rank")
      .select(col("part"), col("rank").cast("long").as("rank"),
        col("nb"), col("cxy"), col("cosine"))
      .orderBy(col("part"), col("rank"))
  }

  val q174_item_cf_sql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |cx AS (SELECT p, COUNT(*) AS c FROM os GROUP BY 1),
      |pairs AS (SELECT x.p AS a, y.p AS b, COUNT(*) AS cxy
      |          FROM os x JOIN os y ON x.o = y.o AND x.p < y.p
      |          GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |sym AS (SELECT a AS part, b AS nb, cxy FROM pairs
      |        UNION ALL SELECT b, a, cxy FROM pairs),
      |sc AS (SELECT s.part, s.nb, s.cxy,
      |         CAST(s.cxy AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE)) AS cosine
      |       FROM sym s JOIN cx ca ON ca.p = s.part JOIN cx cb ON cb.p = s.nb),
      |r AS (SELECT *, ROW_NUMBER() OVER
      |        (PARTITION BY part ORDER BY cosine DESC, nb) AS rank FROM sc)
      |SELECT part, CAST(rank AS BIGINT) AS rank, nb, cxy, cosine
      |FROM r WHERE rank <= 5 ORDER BY part, rank""".stripMargin

  /** q175 — MULTI-TOUCH linear attribution: each purchase splits one
    * unit of conversion credit EQUALLY across the user's touches
    * since their previous purchase — the fractional model every
    * marketing stack reports beside last-touch (q140/q143 batch ≡
    * stream). Segments come from a running prior-purchase count (a
    * per-user window, never global); credit 1/k is one mirrored IEEE
    * division floor-quantized through an exact int64 (decq) before
    * the order-free sum.
    * Trailing touches with no following purchase earn nothing
    * (inner join against the segment's purchase), purchases with no
    * touches carry no credit to split — both by construction.
    */
  def q175_multitouch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("seg", coalesce(
        sum(when(col("event_type") === "purchase", 1L)).over(w), lit(0L)))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("seg"), col("event_type"))
    val k = touches.groupBy(col("user_id"), col("seg")).agg(count(lit(1)).as("k"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("seg"))
    touches
      .join(pur, Seq("user_id", "seg"))
      .join(k, Seq("user_id", "seg"))
      .select(col("event_type"),
        // decq: floor-int64 quantization — 1/k for k like 128 lands
        // exactly on a scale-7 tie whose double→DECIMAL rounding is
        // engine-version-sensitive (round-10 lesson)
        decq(lit(1.0) / col("k").cast("double"), 6).as("credit"))
      .groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).cast("double").as("credit"))
      .orderBy(col("channel"))
  }

  val q175_multitouch_sql: String =
    s"""WITH s AS (
      |  SELECT user_id, event_type,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
      |  FROM events),
      |t AS (SELECT user_id, seg, event_type FROM s WHERE event_type <> 'purchase'),
      |k AS (SELECT user_id, seg, COUNT(*) AS k FROM t GROUP BY 1, 2),
      |pur AS (SELECT user_id, seg FROM s WHERE event_type = 'purchase'),
      |cr AS (
      |  SELECT t.event_type,
      |    ${graft.functions.Determinism.decqSql(
           "CAST(1 AS DOUBLE) / CAST(k.k AS DOUBLE)", 6)} AS credit
      |  FROM t JOIN pur USING (user_id, seg) JOIN k USING (user_id, seg))
      |SELECT event_type AS channel, COUNT(*) AS n_touches,
      |  CAST(SUM(credit) AS DOUBLE) AS credit
      |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin

  /** q176 — hierarchical SHARE-OF-PARENT: customer revenue rolled up
    * region → nation with each level's share of its parent (nations
    * of their region, regions of the world) — the drill-down
    * composition report beside the level-stack shapes (q33 rollup,
    * q96 cube, q141 grouping sets): those emit totals per level, this
    * emits the RATIOS between adjacent levels.
    *
    * Scale/shape: one corpus join+agg collapses orders to the
    * 25-nation frame; everything after is label-bounded broadcast
    * math. Revenue stays exact DECIMAL(38,0) cents; shares are one
    * double division of exact integers per row.
    */
  def q176_share_of_parent(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(cents(col("o_totalprice")).cast("decimal(38,0)")).as("ncents"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("ncents"))
      .persistFresh()
    shareOfParentFrom(nat)
  }

  /** The share-of-parent tail over a (r_name, n_name, ncents
    * DECIMAL(38,0)) per-nation revenue frame — shared verbatim by
    * batch q176 and its streaming twin q223 (pairing #43): region
    * and world totals are sums over the label-bounded frame, and
    * every share is one IEEE division of exact decimals.
    */
  private[queries] def shareOfParentFrom(nat: DataFrame): DataFrame = {
    val reg = nat.groupBy(col("r_name")).agg(sum(col("ncents")).as("rcents"))
    val glob = reg.agg(sum(col("rcents")).as("gcents"))
    val nationRows = nat.join(broadcast(reg), "r_name")
      .select(lit("nation").as("level"), col("n_name").as("name"),
        col("r_name").as("parent"),
        (col("ncents").cast("double") / 100).as("revenue"),
        (col("ncents").cast("double") / col("rcents").cast("double")).as("share"))
    val regionRows = reg.crossJoin(broadcast(glob))
      .select(lit("region").as("level"), col("r_name").as("name"),
        lit("world").as("parent"),
        (col("rcents").cast("double") / 100).as("revenue"),
        (col("rcents").cast("double") / col("gcents").cast("double")).as("share"))
    nationRows.unionByName(regionRows).orderBy(col("level"), col("name"))
  }

  val q176_share_of_parent_sql: String =
    """WITH nat AS (
      |  SELECT r.r_name, n.n_name,
      |    SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS ncents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |reg AS (SELECT r_name, SUM(ncents) AS rcents FROM nat GROUP BY 1),
      |gtot AS (SELECT SUM(rcents) AS gcents FROM reg)
      |SELECT 'nation' AS level, n.n_name AS name, n.r_name AS parent,
      |  CAST(n.ncents AS DOUBLE) / 100 AS revenue,
      |  CAST(n.ncents AS DOUBLE) / CAST(r.rcents AS DOUBLE) AS share
      |FROM nat n JOIN reg r USING (r_name)
      |UNION ALL
      |SELECT 'region', r_name, 'world',
      |  CAST(rcents AS DOUBLE) / 100,
      |  CAST(rcents AS DOUBLE) / CAST(gcents AS DOUBLE)
      |FROM reg CROSS JOIN gtot
      |ORDER BY level, name""".stripMargin

  /** q180 — supply-chain COMPONENT CENSUS: connected components of
    * the part co-purchase graph (≥2 shared orders — q138's edge
    * layer) summarized as a component-size histogram — the "how
    * fragmented is this graph" diagnostic run before any per-cluster
    * processing (the q54/q65 dedup pipelines run the SAME operator on
    * doc-similarity edges; this is the operator composed with the
    * q118/q138 co-occurrence builder on the relational layer).
    *
    * Scale/shape: the one-shuffle co-occurrence build feeds
    * Dedup.connectedComponents (hash-min label propagation, one
    * shuffle per round, converged-or-throw); the census is two
    * label-bounded aggs over the (node, label) frame. Oracle proves
    * the fixed point against DuckDB's recursive transitive closure.
    */
  def q180_component_census(spark: SparkSession, dir: String): DataFrame =
    componentCensusFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))

  /** The component-census tail over an (o, p) order-membership
    * frame — shared verbatim by batch q180 and its streaming twin
    * q224 (pairing #44): co-occurrence edge build (min-support 2,
    * capped groups), distributed connected components, size census.
    */
  private[queries] def componentCensusFrom(op: DataFrame): DataFrame = {
    val edges = graft.operators.Triangles.cooccurrenceEdges(
      op, "o", "p", minSupport = 2)
    graft.operators.Dedup.connectedComponents(edges, "a", "b")
      .groupBy(col("label")).agg(count(lit(1)).as("csize"))
      .groupBy(col("csize")).agg(count(lit(1)).as("n_components"))
      .orderBy(col("csize"))
  }

  val q180_component_census_sql: String =
    """WITH RECURSIVE os AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e0 AS (SELECT a, b FROM (SELECT x.p AS a, y.p AS b, COUNT(*) AS c
      |        FROM os x JOIN os y ON x.o = y.o AND x.p < y.p GROUP BY 1, 2) WHERE c >= 2),
      |edges AS (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
      |reach AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |lbl AS (SELECT src AS id, least(src, MIN(dst)) AS label FROM reach GROUP BY src),
      |cs AS (SELECT label, COUNT(*) AS csize FROM lbl GROUP BY 1)
      |SELECT CAST(csize AS BIGINT) AS csize, COUNT(*) AS n_components
      |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q180_component_census" -> (q180_component_census _),
    "q174_item_cf" -> (q174_item_cf _),
    "q175_multitouch" -> (q175_multitouch _),
    "q176_share_of_parent" -> (q176_share_of_parent _),
    "q147_weighted_median" -> (q147_weighted_median _),
    "q148_unpivot" -> (q148_unpivot _),
    "q145_assoc_rules" -> (q145_assoc_rules _),
    "q146_conversion_lag" -> (q146_conversion_lag _),
    "q137_gap_fill" -> (q137_gap_fill _),
    "q138_khop" -> (q138_khop _),
    "q244_sssp" -> (q244_sssp _),
    "q249_kcore" -> (q249_kcore _),
    "q139_mad_outliers" -> (q139_mad_outliers _),
    "q140_attribution" -> (q140_attribution _),
    "q141_grouping_sets" -> (q141_grouping_sets _),
    "q142_bucket_diff" -> (q142_bucket_diff _),
    "q144_gini" -> (q144_gini _)
  )

  def oracles: Map[String, String] = Map(
    "q180_component_census" -> q180_component_census_sql,
    "q174_item_cf" -> q174_item_cf_sql,
    "q175_multitouch" -> q175_multitouch_sql,
    "q176_share_of_parent" -> q176_share_of_parent_sql,
    "q147_weighted_median" -> q147_weighted_median_sql,
    "q148_unpivot" -> q148_unpivot_sql,
    "q145_assoc_rules" -> q145_assoc_rules_sql,
    "q146_conversion_lag" -> q146_conversion_lag_sql,
    "q137_gap_fill" -> q137_gap_fill_sql,
    "q138_khop" -> q138_khop_sql,
    "q244_sssp" -> q244_sssp_sql,
    "q249_kcore" -> q249_kcore_sql,
    "q139_mad_outliers" -> q139_mad_outliers_sql,
    "q140_attribution" -> q140_attribution_sql,
    "q141_grouping_sets" -> q141_grouping_sets_sql,
    "q142_bucket_diff" -> q142_bucket_diff_sql,
    "q144_gini" -> q144_gini_sql
  )
}
