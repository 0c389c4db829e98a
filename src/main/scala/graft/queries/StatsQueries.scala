package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism._
import graft.operators.CacheOnce.PersistFreshOps

/** Round-9i statistical audit kit: the experiment-analysis and
  * data-quality primitives a warehouse team runs daily — A/B
  * significance tests, contingency-table independence, Benford
  * first-digit audits, declarative expectation suites, and join-key
  * skew diagnostics. deva reaches these through its stats pipe
  * compositions (deva/core/pipe.py groupby + accumulate chains and
  * the stats helpers); here each is one declarative plan whose
  * per-corpus work is a single aggregation with map-side partials.
  *
  * Shared determinism discipline (SURVEY §4): every statistic reduces
  * to EXACT integer/decimal aggregates first (counts, cents sums,
  * sums of squared cents — all order-free), and the float math is a
  * single mirrored IEEE expression over those exact scalars, so the
  * DuckDB oracle is bit-identical without any tolerance.
  */
object StatsQueries {

  private[queries] def cents(c: org.apache.spark.sql.Column) =
    (dec2(c) * 100).cast("long")

  /** q149 — two-arm A/B test readout: users hash-split 50/50 (the
    * deterministic assignment every experimentation system derives
    * from a user-id hash), arm-level conversion (any `purchase`
    * event) compared with the two-proportion pooled z-test, and
    * revenue-per-user compared with Welch's t. deva: groupby +
    * custom stats lambda over the user pipe.
    *
    * Scale/shape: ONE corpus aggregation to the per-user frame
    * (map-side partials), then a single global aggregation of eight
    * exact integer partials (n/x/Σcents/Σcents² per arm) — the
    * statistics are driver-free closed forms over one output row.
    * Revenue moments stay in integer cents (Σc² ≤ 2⁶³ at any
    * plausible per-user total), so partial-aggregation order can
    * never change a bit.
    */
  def q149_ab_test(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        // conversion = a BIG-TICKET purchase (value ≥ $200): the
        // all-users-purchase saturation of the synthetic feed would
        // pin p_pool = 1 and zero the z denominator
        max(when(col("event_type") === "purchase" && dec2(col("value")) >= 200,
          lit(1L)).otherwise(lit(0L))).as("conv"),
        sum(when(col("event_type") === "purchase", cents(col("value"))).otherwise(lit(0L))).as("c"))
    abFrom(perUser)
  }

  /** q149's readout from the per-user (user_id, conv, c) frame — the
    * arm assignment and both test statistics. Shared verbatim by the
    * streaming twin q201 so batch and stream cannot drift.
    */
  private[queries] def abFrom(perUser0: DataFrame): DataFrame = {
    val perUser = perUser0
      .withColumn("arm", pmod(hash60(col("user_id").cast("string")), lit(2L)))
    val g = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x0"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x1"),
      sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("s0"),
      sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("s1"),
      sum(when(col("arm") === 0, col("c") * col("c")).otherwise(0L)).as("ss0"),
      sum(when(col("arm") === 1, col("c") * col("c")).otherwise(0L)).as("ss1"))
    g.select(
        col("n0"), col("n1"), col("x0"), col("x1"),
        (col("x0").cast("double") / col("n0").cast("double")).as("p0"),
        (col("x1").cast("double") / col("n1").cast("double")).as("p1"),
        expr("""CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)""").as("uplift"),
        expr("""(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                       * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                       * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))""").as("z_conv"),
        expr("CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0").as("rev0"),
        expr("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0").as("rev1"),
        expr("""(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0
                 - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0)
                / sqrt(((CAST(ss0 AS DOUBLE) * CAST(n0 AS DOUBLE)
                         - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
                        / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)) / 10000.0
                        / CAST(n0 AS DOUBLE))
                       + ((CAST(ss1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                          / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / 10000.0
                          / CAST(n1 AS DOUBLE)))""").as("t_welch"))
  }

  val q149_ab_test_sql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'purchase'
       |        AND CAST(value AS DECIMAL(18,2)) >= 200 THEN 1 ELSE 0 END) AS conv,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS c
       |  FROM events GROUP BY user_id),
       |armd AS (
       |  SELECT ${hash60Sql("CAST(user_id AS VARCHAR)")} % 2 AS arm, conv, c FROM pu),
       |g AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1,
       |    CAST(SUM(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(SUM(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS ss0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS ss1
       |  FROM armd)
       |SELECT n0, n1, x0, x1,
       |  CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
       |  CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
       |  CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |    - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS uplift,
       |  (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |    - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))
       |  / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
       |         * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
       |         * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z_conv,
       |  CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0 AS rev0,
       |  CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS rev1,
       |  (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0
       |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0)
       |  / sqrt(((CAST(ss0 AS DOUBLE) * CAST(n0 AS DOUBLE)
       |           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
       |          / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)) / 10000.0
       |          / CAST(n0 AS DOUBLE))
       |         + ((CAST(ss1 AS DOUBLE) * CAST(n1 AS DOUBLE)
       |             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
       |            / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / 10000.0
       |            / CAST(n1 AS DOUBLE))) AS t_welch
       |FROM g""".stripMargin

  /** q246 — Mann–Whitney U (Wilcoxon rank-sum) readout over the same
    * hash-split arms as q149: are arm-1 per-user revenues
    * stochastically larger than arm-0's? The ROBUST two-sample test
    * completing the robustness family (q139 robust location, q193
    * robust trend): q149's Welch t compares means — one whale user
    * drags it; ranks have a 50% breakdown point and need no
    * normality. Reported as the tie-corrected normal z plus the
    * rank-biserial effect size AUC = U/(n0·n1) (the probability a
    * random arm-1 user out-spends a random arm-0 user). deva:
    * groupby + custom stats lambda over the user pipe.
    *
    * Exactness: ranks never materialize per row — the corpus
    * collapses to the per-user frame, then to the (c, m0, m1) value
    * HISTOGRAM; a tied run at value c with t = m0+m1 members
    * contributes m1·(2·cumBefore + t + 1) to the DOUBLED arm-1
    * midrank sum (2·midrank is always integer — the q139 med2
    * doctrine), so 2R₁, 2U₁ and the tie term Σ(t³−t) are exact; the
    * rank-weighted partials run in DECIMAL(38,0) (q144 discipline —
    * int64 overflows near 2⁶³ at ~3e9 users) and the only floats are
    * the final mirrored casts/sqrt/divisions of those exact sums.
    *
    * Scale/shape: ONE corpus aggregation to the per-user frame
    * (map-side partials), one histogram aggregation, the global
    * cumulative from [[graft.operators.Sequence.globalPrefixSum]]
    * (range exchange + map pass — never a single-task global
    * window), and a 1-row final agg.
    */
  def q246_mann_whitney(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", cents(col("value")))
        .otherwise(lit(0L))).as("c"))
    mannWhitneyFrom(perUser)
  }

  /** q246's readout from the per-user (user_id, c) frame — arm
    * assignment, value histogram, doubled rank sums, z and AUC.
    * Shared verbatim by the streaming twin q247 so batch and stream
    * cannot drift.
    */
  private[queries] def mannWhitneyFrom(perUser0: DataFrame): DataFrame = {
    val hist = perUser0
      .withColumn("arm", pmod(hash60(col("user_id").cast("string")), lit(2L)))
      .groupBy(col("c"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("m0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("m1"))
      .withColumn("t", col("m0") + col("m1"))
    val cum = graft.operators.Sequence.globalPrefixSum(
      hist, Seq(col("c")), "t", "cum")
    val g = cum.agg(
      sum(col("m0")).as("n0"),
      sum(col("m1")).as("n1"),
      sum(col("m1").cast("decimal(38,0)")
        * (lit(2) * (col("cum") - col("t")) + col("t") + 1)).as("r2"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t")).as("tie3"))
    val n0d = col("n0").cast("double")
    val n1d = col("n1").cast("double")
    val nd = (col("n0") + col("n1")).cast("double")
    val u2 = col("r2") - col("n1").cast("decimal(38,0)") * (col("n1") + 1)
    g.select(col("n0"), col("n1"),
      ((u2 - col("n0").cast("decimal(38,0)") * col("n1")).cast("double")
        / (lit(2.0) * sqrt(n0d * n1d
          * (nd * nd * nd - nd - col("tie3").cast("double"))
          / (lit(12.0) * nd * (nd - lit(1.0)))))).as("z_u"),
      (u2.cast("double") / (lit(2.0) * n0d * n1d)).as("auc"))
  }

  val q246_mann_whitney_sql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS c
       |  FROM events GROUP BY user_id),
       |armd AS (
       |  SELECT ${hash60Sql("CAST(user_id AS VARCHAR)")} % 2 AS arm, c FROM pu),
       |hist AS (
       |  SELECT c,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1
       |  FROM armd GROUP BY c),
       |cum AS (SELECT c, m0, m1, m0 + m1 AS t,
       |    SUM(m0 + m1) OVER (ORDER BY c) AS cum FROM hist),
       |g AS (SELECT
       |    CAST(SUM(m0) AS BIGINT) AS n0,
       |    CAST(SUM(m1) AS BIGINT) AS n1,
       |    SUM(CAST(m1 AS DECIMAL(38,0)) * (2 * (cum - t) + t + 1)) AS r2,
       |    SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tie3
       |  FROM cum)
       |SELECT n0, n1,
       |  CAST(r2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)
       |       - CAST(n0 AS DECIMAL(38,0)) * n1 AS DOUBLE)
       |  / (2.0 * sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
       |       * (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE)
       |          - CAST(n0 + n1 AS DOUBLE) - CAST(tie3 AS DOUBLE))
       |       / (12.0 * CAST(n0 + n1 AS DOUBLE) * (CAST(n0 + n1 AS DOUBLE) - 1.0)))) AS z_u,
       |  CAST(r2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS DOUBLE)
       |  / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS auc
       |FROM g""".stripMargin

  /** q264 — two-sample KOLMOGOROV–SMIRNOV test on the same hash-split
    * arms as q246: the max ECDF gap D = sup_v |F₀(v) − F₁(v)|, the
    * DISTRIBUTION-SHAPE counterpart of the rank family (q246's
    * rank-sum detects a stochastic shift, q252 a location shift; KS
    * sees ANY divergence — variance, tails, bimodality — and is the
    * standard guardrail-metric test when an A/B arm changes shape
    * without moving the mean). Reported with the scaled statistic
    * √(n₀n₁/(n₀+n₁))·D (the asymptotic Kolmogorov form) and the
    * cents value where the max gap is attained. deva: groupby +
    * custom stats lambda over the user pipe.
    *
    * Exactness (the q246 doctrine): ECDFs never materialize as
    * floats — the corpus collapses to the (c, m0, m1) value
    * histogram, the two cumulatives ride
    * [[graft.operators.Sequence.globalPrefixSum]], and the gap is the
    * exact integer |n₁·cum₀(v) − n₀·cum₁(v)| in DECIMAL(38,0) (the
    * cross-product can reach N² ~ 10²⁴ at 10¹² users — q144's
    * discipline); max and argmin-location are order-free over exact
    * decimals, and the only floats are the final mirrored casts /
    * divisions / sqrt of exact scalars.
    *
    * Scale/shape: ONE corpus aggregation to the per-user frame, one
    * histogram aggregation, two range-exchange prefix sums over the
    * value-domain-bounded histogram, a histogram-keyed join plus
    * 1-row broadcasts — no per-row rank join, no global sort.
    */
  def q264_ks_test(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", cents(col("value")))
        .otherwise(lit(0L))).as("c"))
    ksFrom(perUser)
  }

  /** q264's readout from the per-user (user_id, c) frame — arm
    * assignment, value histogram, per-arm cumulatives, exact integer
    * gap, D and the Kolmogorov-scaled statistic. Shared verbatim by
    * the streaming twin q265 so batch and stream cannot drift.
    */
  private[queries] def ksFrom(perUser0: DataFrame): DataFrame = {
    val hist = perUser0
      .withColumn("arm", pmod(hash60(col("user_id").cast("string")), lit(2L)))
      .groupBy(col("c"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("m0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("m1"))
      .withColumn("t", col("m0") + col("m1"))
      .persistFresh()
    hist.count() // eager: three consumers (two prefix sums + totals) race a cold cache otherwise
    val cum = graft.operators.Sequence.globalPrefixSum(
      hist, Seq(col("c")), "t", "cum")
    val cum0 = graft.operators.Sequence.globalPrefixSum(
      hist.select(col("c"), col("m0")), Seq(col("c")), "m0", "cum0")
      .select(col("c"), col("cum0"))
    val g = hist.agg(sum(col("m0")).as("n0"), sum(col("m1")).as("n1"))
    val gap = cum.join(cum0, Seq("c")).crossJoin(broadcast(g))
      .select(col("c"),
        abs(col("n1").cast("decimal(38,0)") * col("cum0")
          - col("n0").cast("decimal(38,0)") * (col("cum") - col("cum0"))).as("gp"))
      .persistFresh()
    gap.count() // eager: the max and the argmax-location both read it
    val dm = gap.agg(max(col("gp")).as("dnum"))
    val at = gap.crossJoin(broadcast(dm)).filter(col("gp") === col("dnum"))
      .agg(min(col("c")).as("at_c"))
    val n0d = col("n0").cast("double")
    val n1d = col("n1").cast("double")
    g.crossJoin(broadcast(dm)).crossJoin(broadcast(at))
      .select(col("n0"), col("n1"),
        (col("dnum").cast("double") / (n0d * n1d)).as("d"),
        (sqrt(n0d * n1d / (n0d + n1d))
          * (col("dnum").cast("double") / (n0d * n1d))).as("ks"),
        col("at_c"))
  }

  val q264_ks_test_sql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS c
       |  FROM events GROUP BY user_id),
       |armd AS (
       |  SELECT ${hash60Sql("CAST(user_id AS VARCHAR)")} % 2 AS arm, c FROM pu),
       |hist AS (
       |  SELECT c,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1
       |  FROM armd GROUP BY c),
       |cum AS (SELECT c, m0, m1, m0 + m1 AS t,
       |    SUM(m0 + m1) OVER (ORDER BY c) AS cum,
       |    SUM(m0) OVER (ORDER BY c) AS cum0 FROM hist),
       |g AS (SELECT CAST(SUM(m0) AS BIGINT) AS n0,
       |    CAST(SUM(m1) AS BIGINT) AS n1 FROM hist),
       |gap AS (SELECT c,
       |    abs(CAST(n1 AS DECIMAL(38,0)) * cum0
       |      - CAST(n0 AS DECIMAL(38,0)) * (cum - cum0)) AS gp
       |  FROM cum, g),
       |dm AS (SELECT MAX(gp) AS dnum FROM gap),
       |loc AS (SELECT CAST(MIN(c) AS BIGINT) AS at_c FROM gap, dm WHERE gp = dnum)
       |SELECT n0, n1,
       |  CAST(dnum AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS d,
       |  sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
       |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
       |    * (CAST(dnum AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) AS ks,
       |  at_c
       |FROM g, dm, loc""".stripMargin

  /** q274 — WILCOXON SIGNED-RANK test on paired per-user spend:
    * each user's purchase cents on EVEN epoch-days vs ODD epoch-days
    * form a natural within-user pair (an interleaved time A/B), and
    * the signed-rank test asks whether the paired difference is
    * symmetric about zero — the PAIRED member of the rank family
    * (q246 tests independent arms; pairing controls for user-level
    * heterogeneity, which is why a paired design detects shifts the
    * independent test drowns in between-user variance). Standard
    * conventions: zero differences dropped, midranks on |d|,
    * tie-corrected normal z, rank-biserial effect size.
    *
    * Exactness (the q246 doctrine): per-user d is integer cents; the
    * corpus collapses to the (|d|, pos, neg) histogram; pooled
    * midranks on |d| from [[graft.operators.Sequence.globalPrefixSum]]
    * give the DOUBLED positive-rank sum 2W⁺ as an exact
    * DECIMAL(38,0) (≤ 2n² — inside the cap at any scale), the tie
    * term Σ(t³−t) likewise; z and the rank-biserial are ONE mirrored
    * double expression each over those exact scalars.
    *
    * Scale/shape: ONE corpus aggregation to the per-user frame, one
    * histogram aggregation, one range-exchange prefix sum over the
    * value-domain-bounded histogram, a 1-row final.
    */
  def q274_wilcoxon(spark: SparkSession, dir: String): DataFrame = {
    val dayParity = expr("(unix_micros(ts) div 86400000000) % 2")
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" && dayParity === 0,
          cents(col("value"))).otherwise(lit(0L))).as("ce"),
        sum(when(col("event_type") === "purchase" && dayParity === 1,
          cents(col("value"))).otherwise(lit(0L))).as("co"))
    wilcoxonFrom(perUser)
  }

  /** q274's readout from the per-user (ce, co) paired-cents frame —
    * nonzero differences, |d| histogram, doubled positive-rank sum,
    * tie-corrected z, rank-biserial. Shared verbatim by the
    * streaming twin q275 so batch and stream cannot drift.
    */
  private[queries] def wilcoxonFrom(perUser0: DataFrame): DataFrame = {
    val hist = perUser0
      .select((col("ce") - col("co")).as("d"))
      .filter(col("d") =!= 0)
      .groupBy(abs(col("d")).as("ad"))
      .agg(sum(when(col("d") > 0, 1L).otherwise(0L)).as("p"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("m"))
      .withColumn("t", col("p") + col("m"))
    val cum = graft.operators.Sequence.globalPrefixSum(
      hist, Seq(col("ad")), "t", "cum")
    val g = cum.agg(
      sum(col("p")).as("np"),
      sum(col("m")).as("nm"),
      sum(col("p").cast("decimal(38,0)")
        * (lit(2) * (col("cum") - col("t")) + col("t") + 1)).as("w2"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t")).as("tie3"))
    val nd = (col("np") + col("nm")).cast("double")
    g.select(col("np"), col("nm"),
      ((col("w2").cast("double") - nd * (nd + lit(1.0)) / lit(2.0))
        / (lit(2.0) * sqrt(nd * (nd + lit(1.0)) * (lit(2.0) * nd + lit(1.0)) / lit(24.0)
          - col("tie3").cast("double") / lit(48.0)))).as("z_w"),
      ((lit(2.0) * col("w2").cast("double") - nd * (nd + lit(1.0)))
        / (nd * (nd + lit(1.0)))).as("rb"))
  }

  val q274_wilcoxon_sql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |          AND (epoch_us(ts) // 86400000000) % 2 = 0
       |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS ce,
       |    SUM(CASE WHEN event_type = 'purchase'
       |          AND (epoch_us(ts) // 86400000000) % 2 = 1
       |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS co
       |  FROM events GROUP BY user_id),
       |dd AS (SELECT ce - co AS d FROM pu WHERE ce - co <> 0),
       |hist AS (
       |  SELECT abs(d) AS ad,
       |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |    CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS m
       |  FROM dd GROUP BY abs(d)),
       |cum AS (SELECT ad, p, m, p + m AS t,
       |    SUM(p + m) OVER (ORDER BY ad) AS cum FROM hist),
       |g AS (SELECT
       |    CAST(SUM(p) AS BIGINT) AS np,
       |    CAST(SUM(m) AS BIGINT) AS nm,
       |    SUM(CAST(p AS DECIMAL(38,0)) * (2 * (cum - t) + t + 1)) AS w2,
       |    SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tie3
       |  FROM cum)
       |SELECT np, nm,
       |  (CAST(w2 AS DOUBLE) - CAST(np + nm AS DOUBLE) * (CAST(np + nm AS DOUBLE) + 1.0) / 2.0)
       |  / (2.0 * sqrt(CAST(np + nm AS DOUBLE) * (CAST(np + nm AS DOUBLE) + 1.0)
       |       * (2.0 * CAST(np + nm AS DOUBLE) + 1.0) / 24.0
       |       - CAST(tie3 AS DOUBLE) / 48.0)) AS z_w,
       |  (2.0 * CAST(w2 AS DOUBLE) - CAST(np + nm AS DOUBLE) * (CAST(np + nm AS DOUBLE) + 1.0))
       |  / (CAST(np + nm AS DOUBLE) * (CAST(np + nm AS DOUBLE) + 1.0)) AS rb
       |FROM g""".stripMargin

  /** q266 — SPEARMAN rank correlation between per-user activity and
    * per-user spend: does engagement (event count) MONOTONICALLY
    * track revenue (purchase cents)? Pearson-on-midranks — the
    * tie-correct Spearman — so one whale user cannot drag the
    * coefficient the way it drags q131/q169's Pearson: the rank
    * family's bivariate member beside the two-sample tests (q246 KS
    * q264) and the robust trend (q193). deva: groupby + custom stats
    * lambda over the user pipe.
    *
    * Exactness: both marginals collapse to value histograms whose
    * pooled cumulatives ([[graft.operators.Sequence.globalPrefixSum]])
    * give each value run's DOUBLED midrank 2·cumBefore + t + 1 — an
    * exact int64; the centered doubled rank d = 2r − (N+1) is exact
    * (Σd = 0 by construction), and the three moment sums Σdxdy, Σdx²,
    * Σdy² run in DECIMAL(38,0) (per-row products reach 4N² — q144
    * discipline; the sums are ≤ 4N³ ~ 4×10³⁶ at 10¹² users, inside
    * the 38-digit cap). rho is ONE mirrored double expression of
    * those exact sums. Doubling cancels: Pearson is scale-invariant,
    * so Pearson(2r_x, 2r_y) = Pearson(r_x, r_y) exactly.
    *
    * Scale/shape: ONE corpus aggregation to the per-user frame, two
    * histogram aggregations + range-exchange prefix sums (value-
    * domain bounded), two rank-map hash joins back to the per-user
    * frame (the x map is label-ish and broadcasts; the y map is
    * distinct-spend bounded — a plain hash join, never collected),
    * one moment aggregation with map-side partials.
    */
  def q266_spearman(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(when(col("event_type") === "purchase", cents(col("value")))
          .otherwise(lit(0L))).as("y"))
    spearmanFrom(perUser)
  }

  /** q266's readout from the per-user (user_id, x, y) frame —
    * marginal midranks, centered doubled ranks, exact decimal
    * moments, rho. Shared verbatim by the streaming twin q267 so
    * batch and stream cannot drift.
    */
  private[queries] def spearmanFrom(perUser0: DataFrame): DataFrame = {
    val pu = perUser0.persistFresh()
    pu.count() // eager: four consumers (two histograms, the count, the join) race a cold cache otherwise
    def rankMap(vc: String, rn: String): DataFrame = {
      val hist = pu.groupBy(col(vc)).agg(count(lit(1)).as("t"))
      graft.operators.Sequence.globalPrefixSum(hist, Seq(col(vc)), "t", "cum")
        .select(col(vc),
          (lit(2) * (col("cum") - col("t")) + col("t") + 1).as(rn))
    }
    val rx = rankMap("x", "r2x")
    val ry = rankMap("y", "r2y")
    val g = pu.agg(count(lit(1)).as("n"))
    val dd = pu.join(rx, Seq("x")).join(ry, Seq("y"))
      .crossJoin(broadcast(g))
      .select((col("r2x") - (col("n") + 1)).as("dx"),
        (col("r2y") - (col("n") + 1)).as("dy"))
    val m = dd.agg(count(lit(1)).as("n"),
      sum(col("dx").cast("decimal(38,0)") * col("dy")).as("sxy"),
      sum(col("dx").cast("decimal(38,0)") * col("dx")).as("sxx"),
      sum(col("dy").cast("decimal(38,0)") * col("dy")).as("syy"))
    m.select(col("n"),
      (col("sxy").cast("double")
        / (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double")))).as("rho"),
      col("sxy").cast("double").as("sxy"),
      col("sxx").cast("double").as("sxx"),
      col("syy").cast("double").as("syy"))
  }

  val q266_spearman_sql: String =
    s"""WITH pu AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS y
       |  FROM events GROUP BY user_id),
       |hx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM pu GROUP BY x),
       |cx AS (SELECT x, t, SUM(t) OVER (ORDER BY x) AS cum FROM hx),
       |rx AS (SELECT x, CAST(2 * (cum - t) + t + 1 AS BIGINT) AS r2x FROM cx),
       |hy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM pu GROUP BY y),
       |cy AS (SELECT y, t, SUM(t) OVER (ORDER BY y) AS cum FROM hy),
       |ry AS (SELECT y, CAST(2 * (cum - t) + t + 1 AS BIGINT) AS r2y FROM cy),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pu),
       |dd AS (SELECT CAST(r2x - (n + 1) AS BIGINT) AS dx,
       |    CAST(r2y - (n + 1) AS BIGINT) AS dy
       |  FROM pu JOIN rx USING (x) JOIN ry USING (y), g),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(dx AS DECIMAL(38,0)) * dy) AS sxy,
       |    SUM(CAST(dx AS DECIMAL(38,0)) * dx) AS sxx,
       |    SUM(CAST(dy AS DECIMAL(38,0)) * dy) AS syy
       |  FROM dd)
       |SELECT n,
       |  CAST(sxy AS DOUBLE)
       |    / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))) AS rho,
       |  CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
       |  CAST(syy AS DOUBLE) AS syy
       |FROM m""".stripMargin

  /** q252 — Mood's MEDIAN TEST across event types: do the k event
    * types share a common value median? Each type's counts above /
    * below the POOLED median form a k×2 contingency table judged by
    * the q150 chi-square tail — the k-sample robust location test
    * completing the rank family (q246 two-sample rank-sum, q139
    * robust location, q193 robust trend), and a pure COMPOSITION of
    * proven exact machinery: the q117/q139 med2 cumulative idiom
    * (2·median = lo + hi, always int64 — no .5 decision anywhere)
    * feeds chiSquareFrom verbatim. Values tied with the pooled
    * median (2c = med2) are EXCLUDED, the standard Mood's
    * convention. deva: groupby + stats lambda composition.
    *
    * Scale/shape: corpus collapses FIRST to the (type, cents)
    * histogram (ONE aggregation, map-side partials); the global
    * cumulative rides Sequence.globalPrefixSum (never a single-task
    * window); med2 is a 1-row broadcast; cells are label×2-bounded;
    * every hashed number is int64 or the q150 decq/mirrored-double
    * class.
    */
  def q252_median_test(spark: SparkSession, dir: String): DataFrame =
    medianTestFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), cents(col("value")).as("c"))
      .agg(count(lit(1)).as("cnt")))

  /** q252's readout from the (event_type, c, cnt) value histogram —
    * pooled med2, above/below cells, chi-square tail. Shared
    * verbatim by the streaming twin q253 so batch and stream cannot
    * drift.
    */
  private[queries] def medianTestFrom(histT0: DataFrame): DataFrame = {
    val histT = histT0.persistFresh()
    histT.count() // eager: two consumers race a cold cache otherwise (the q104 lesson)
    val histC = histT.groupBy(col("c")).agg(sum(col("cnt")).as("cnt"))
    val cum = graft.operators.Sequence.globalPrefixSum(
      histC, Seq(col("c")), "cnt", "cum")
    val tot = histC.agg(sum(col("cnt")).as("n"))
    val med = cum.crossJoin(broadcast(tot))
      .agg((min(when(col("cum") >= expr("(n + 1) div 2"), col("c")))
        + min(when(col("cum") >= expr("(n + 2) div 2"), col("c")))).as("med2"))
    val cells = histT.crossJoin(broadcast(med))
      .filter(lit(2) * col("c") =!= col("med2"))
      .groupBy(col("event_type").as("segment"),
        when(lit(2) * col("c") > col("med2"), lit("above"))
          .otherwise(lit("below")).as("priority"))
      .agg(sum(col("cnt")).as("obs"))
    chiSquareFrom(cells)
      .select(col("segment").as("event_type"), col("priority").as("side"),
        col("obs"), col("expected"), col("contrib"), col("chi2"), col("dof"))
  }

  val q252_median_test_sql: String =
    s"""WITH ht AS (
       |  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |hc AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS cnt FROM ht GROUP BY 1),
       |cum AS (SELECT c, cnt, SUM(cnt) OVER (ORDER BY c) AS cum FROM hc),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hc),
       |lo AS (SELECT MIN(c) AS lo FROM cum, tot WHERE cum >= (n + 1) // 2),
       |hi AS (SELECT MIN(c) AS hi FROM cum, tot WHERE cum >= (n + 2) // 2),
       |med AS (SELECT lo + hi AS med2 FROM lo, hi),
       |cells AS (
       |  SELECT event_type,
       |    CASE WHEN 2 * c > med2 THEN 'above' ELSE 'below' END AS side,
       |    CAST(SUM(cnt) AS BIGINT) AS obs
       |  FROM ht, med WHERE 2 * c <> med2 GROUP BY 1, 2),
       |m AS (
       |  SELECT event_type, side, obs,
       |    SUM(obs) OVER (PARTITION BY event_type) AS rt,
       |    SUM(obs) OVER (PARTITION BY side) AS ct,
       |    (SELECT SUM(obs) FROM cells) AS n
       |  FROM cells),
       |contrib AS (
       |  SELECT event_type, side, obs, rt, ct, n,
       |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
       |    ${decqSql(
      """CAST(obs * n - rt * ct AS DOUBLE) * CAST(obs * n - rt * ct AS DOUBLE)
              / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) * CAST(n AS DOUBLE))""", 6)} AS contrib_q
       |  FROM m),
       |g AS (
       |  SELECT CAST(SUM(contrib_q) AS DOUBLE) AS chi2,
       |    CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT side) - 1) AS BIGINT) AS dof
       |  FROM contrib)
       |SELECT c.event_type, c.side, c.obs, c.expected,
       |  CAST(c.contrib_q AS DOUBLE) AS contrib, g.chi2, g.dof
       |FROM contrib c, g ORDER BY 1, 2""".stripMargin

  /** q262 — KRUSKAL–WALLIS rank test across event types: do the k
    * event types share one value distribution? The k-sample
    * generalization of q246's two-sample rank-sum, completing the
    * rank family PROPERLY (r13 designed and rejected this test for
    * int64 overflow of RAW rank-square sums ~ N³/k²; VERDICT r13
    * item 7 asked for the bound to be re-verified — the fix is the
    * NORMALIZED form below, whose per-group contribution is bounded
    * by H ≤ N−1, inside the decq int64 edge to ~9×10¹² events, i.e.
    * past the 100 TB row count). Mood's median test (q252) remains
    * beside it: medians test location only, ranks test the whole
    * distribution shift.
    *
    * Exactness (the q246 doctrine, per group): ranks never
    * materialize per row — the corpus collapses to the (type, cents)
    * histogram; the pooled cumulative gives each value run's doubled
    * midrank 2·cumBefore + t + 1, so each group's DOUBLED rank sum
    * 2R_g is an exact DECIMAL(38,0), as is the tie term Σ(t³−t).
    * The statistic then runs in the q150 contribution discipline:
    * each group's normalized term
    * 12/(N(N+1)) · n_g · (R_g/n_g − (N+1)/2)² is ONE mirrored double
    * expression of those exact integers, decq-floor-quantized at
    * 1e-6, and H is their exact decimal sum — group order cannot
    * move a bit. The tie-corrected H' divides by the mirrored
    * 1 − Σ(t³−t)/(N³−N).
    *
    * Scale/shape: ONE corpus aggregation to the histogram (map-side
    * partials), the global cumulative via Sequence.globalPrefixSum
    * (never a single-task window), a value-domain-bounded broadcast
    * join back, and label-bounded finals.
    */
  def q262_kruskal_wallis(spark: SparkSession, dir: String): DataFrame =
    kruskalWallisFrom(Tables.events(spark, dir)
      .groupBy(col("event_type"), cents(col("value")).as("c"))
      .agg(count(lit(1)).as("cnt")))

  /** q262's readout from the (event_type, c, cnt) value histogram —
    * pooled midranks, per-group doubled rank sums, normalized
    * contributions, tie-corrected H. Shared verbatim by the
    * streaming twin q263 so batch and stream cannot drift.
    */
  private[queries] def kruskalWallisFrom(histT0: DataFrame): DataFrame = {
    val histT = histT0.persistFresh()
    histT.count() // eager: two consumers race a cold cache otherwise (the q104 lesson)
    val histC = histT.groupBy(col("c")).agg(sum(col("cnt")).as("t"))
    val cum = graft.operators.Sequence.globalPrefixSum(
      histC, Seq(col("c")), "t", "cum")
    val perG = histT
      .join(broadcast(cum.select(col("c"), col("t"), col("cum"))), Seq("c"))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_g"),
        sum(col("cnt").cast("decimal(38,0)")
          * (lit(2) * (col("cum") - col("t")) + col("t") + 1)).as("r2"))
    val glob = cum.agg(sum(col("t")).as("n"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t")).as("tie3"))
    val nd = col("n").cast("double")
    val ngd = col("n_g").cast("double")
    val meanDiff = col("r2").cast("double") / (lit(2.0) * ngd) -
      (nd + lit(1.0)) / lit(2.0)
    val scored = perG.crossJoin(broadcast(glob))
      .withColumn("contrib_q",
        decq(lit(12.0) / (nd * (nd + lit(1.0))) * ngd * meanDiff * meanDiff, 6))
    val g = scored.groupBy()
      .agg(sum(col("contrib_q")).as("hq"),
        count(lit(1)).as("k"),
        first(col("n")).as("n"),
        first(col("tie3")).as("tie3"))
      .select(col("hq").cast("double").as("h"),
        (col("hq").cast("double") /
          (lit(1.0) - col("tie3").cast("double")
            / (col("n").cast("double") * col("n").cast("double")
              * col("n").cast("double") - col("n").cast("double")))).as("h_tie"),
        (col("k") - 1).cast("long").as("dof"))
    scored
      .select(col("event_type"), col("n_g"),
        col("contrib_q").cast("double").as("contrib"))
      .crossJoin(broadcast(g))
      .orderBy(col("event_type"))
  }

  val q262_kruskal_wallis_sql: String =
    s"""WITH ht AS (
       |  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |hc AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS t FROM ht GROUP BY 1),
       |cum AS (SELECT c, t, SUM(t) OVER (ORDER BY c) AS cum FROM hc),
       |pg AS (
       |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_g,
       |    SUM(CAST(cnt AS DECIMAL(38,0)) * (2 * (cum - t) + t + 1)) AS r2
       |  FROM ht JOIN cum USING (c) GROUP BY 1),
       |gtot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
       |    SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tie3 FROM cum),
       |scored AS (
       |  SELECT event_type, n_g, n, tie3,
       |    ${decqSql(
      """12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
              * CAST(n_g AS DOUBLE)
              * (CAST(r2 AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / 2.0)
              * (CAST(r2 AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / 2.0)""", 6)} AS contrib_q
       |  FROM pg, gtot),
       |g AS (
       |  SELECT CAST(SUM(contrib_q) AS DOUBLE) AS h,
       |    CAST(SUM(contrib_q) AS DOUBLE)
       |      / (1.0 - CAST(MAX(tie3) AS DOUBLE)
       |         / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
       |            * CAST(MAX(n) AS DOUBLE) - CAST(MAX(n) AS DOUBLE))) AS h_tie,
       |    CAST(COUNT(*) - 1 AS BIGINT) AS dof
       |  FROM scored)
       |SELECT s.event_type, s.n_g, CAST(s.contrib_q AS DOUBLE) AS contrib,
       |  g.h, g.h_tie, g.dof
       |FROM scored s, g ORDER BY 1""".stripMargin

  /** q150 — chi-square test of independence over the (market
    * segment × order priority) contingency table: is order priority
    * distributed independently of customer segment? The categorical
    * association test behind every "does cohort X behave differently"
    * report. deva: groupby-pair counts + a stats lambda.
    *
    * Scale/shape: the corpus collapses to the label-bounded cell
    * frame in ONE aggregation (the customer dim broadcasts into the
    * fact scan); row/column margins are windows over the tiny cell
    * frame (real partition keys — never a global window), and N rides
    * a broadcast scalar. Each cell's contribution is the exact
    * integer identity (obs·N − rt·ct)² / (rt·ct·N) evaluated as one
    * mirrored double expression; the total is an exact decimal sum of
    * decq-floor-quantized (1e-6) contributions, so cell order
    * cannot move a bit.
    */
  def q150_chi_square(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
    val cells = joined.groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("obs"))
    chiSquareFrom(cells)
  }

  /** The chi-square tail over a (segment, priority, obs) cell frame —
    * shared verbatim by batch q150 and its streaming twin q209
    * (pairing #29), so the two CANNOT diverge: margins, expected
    * counts, decq-quantized contributions, and the broadcast
    * (chi2, dof) scalar all derive from the same label²-bounded
    * frame.
    */
  private[queries] def chiSquareFrom(cells: DataFrame): DataFrame = {
    val n = cells.agg(sum(col("obs")).as("n"))
    val margins = cells
      .withColumn("rt", sum(col("obs")).over(Window.partitionBy(col("segment"))))
      .withColumn("ct", sum(col("obs")).over(Window.partitionBy(col("priority"))))
      .crossJoin(broadcast(n))
    val contrib = margins.select(
      col("segment"), col("priority"), col("obs"), col("rt"), col("ct"), col("n"),
      expr("CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)").as("expected"),
      // decq: floor-int64 quantization once, reused by the sum and
      // the display column — never a raw double→DECIMAL cast
      decq(expr(
        """CAST(obs * n - rt * ct AS DOUBLE) * CAST(obs * n - rt * ct AS DOUBLE)
              / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) * CAST(n AS DOUBLE))"""), 6)
        .as("contrib_q"))
    val chi2 = contrib.agg(
      sum(col("contrib_q")).cast("double").as("chi2"),
      count_distinct(col("segment")).as("nseg"),
      count_distinct(col("priority")).as("nprio"))
    contrib
      .select(col("segment"), col("priority"), col("obs"), col("expected"),
        col("contrib_q").cast("double").as("contrib"))
      .crossJoin(broadcast(chi2.select(col("chi2"),
        ((col("nseg") - 1) * (col("nprio") - 1)).as("dof"))))
      .orderBy(col("segment"), col("priority"))
  }

  val q150_chi_square_sql: String =
    s"""WITH cells AS (
      |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
      |    CAST(COUNT(*) AS BIGINT) AS obs
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT segment, priority, obs,
      |    SUM(obs) OVER (PARTITION BY segment) AS rt,
      |    SUM(obs) OVER (PARTITION BY priority) AS ct,
      |    (SELECT SUM(obs) FROM cells) AS n
      |  FROM cells),
      |c AS (
      |  SELECT segment, priority, obs,
      |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
      |    ${graft.functions.Determinism.decqSql(
           """CAST(obs * n - rt * ct AS DOUBLE) * CAST(obs * n - rt * ct AS DOUBLE)
      |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) * CAST(n AS DOUBLE))""".stripMargin,
           6)} AS contrib_q
      |  FROM m),
      |t AS (
      |  SELECT CAST(SUM(contrib_q) AS DOUBLE) AS chi2,
      |    CAST((COUNT(DISTINCT segment) - 1) * (COUNT(DISTINCT priority) - 1) AS BIGINT) AS dof
      |  FROM c)
      |SELECT segment, priority, obs, expected,
      |  CAST(contrib_q AS DOUBLE) AS contrib, chi2, dof
      |FROM c CROSS JOIN t
      |ORDER BY segment, priority""".stripMargin

  /** q151 — Benford first-digit audit of `l_extendedprice`: the
    * classic fraud/synthetic-data screen comparing the observed
    * leading-significant-digit distribution against Benford's law,
    * with a chi-square distance. (The TPC-H-ish generator is
    * uniform-ish, so the audit REJECTS loudly — which is the point:
    * the query is the detector, the verdict belongs to the data.)
    *
    * Determinism: the leading digit comes from the DECIMAL cents
    * rendering (first char of the int64 string — both engines print
    * integers identically; no log10 whose last ulp could flip a
    * boundary value), and the Benford expectations are shared decimal
    * LITERALS, not engine libm calls. Per-digit contributions floor-
    * quantize (decq, 1e-6) before the exact total sum.
    *
    * Scale/shape: one aggregation to the 9-row digit frame; the
    * scalar N and chi2 ride broadcasts.
    */
  def q151_benford(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.lineitem(spark, dir)
      .select(substring(cents(col("l_extendedprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("obs"))
    benfordFrom(digits)
  }

  /** The Benford tail over a (digit, obs) frame — shared verbatim by
    * batch q151 and its streaming twin q210 (pairing #30): expected
    * shares from the fixed decimal literals, decq-quantized per-digit
    * contributions, broadcast chi2 scalar.
    */
  private[queries] def benfordFrom(digits: DataFrame): DataFrame = {
    val n = digits.agg(sum(col("obs")).as("n"))
    val expShare = expr(s"element_at(array(${benfordLits.mkString(", ")}), digit)")
    val cells = digits.crossJoin(broadcast(n))
      .withColumn("exp_share", expShare)
      .withColumn("expected",
        expr("CAST(exp_share AS DOUBLE) * CAST(n AS DOUBLE)"))
      .withColumn("contrib_q",
        // decq: floor-int64 quantization once, reused by the sum and
        // the display column — never a raw double→DECIMAL cast
        decq(expr(
          """(CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)
                / expected"""), 6))
    val chi2 = cells.agg(sum(col("contrib_q")).cast("double").as("chi2"))
    cells.select(col("digit"), col("obs"), col("n"),
        expr("CAST(obs AS DOUBLE) / CAST(n AS DOUBLE)").as("obs_share"),
        col("exp_share").cast("double").as("exp_share"),
        col("contrib_q").cast("double").as("contrib"))
      .crossJoin(broadcast(chi2))
      .orderBy(col("digit"))
  }

  /** Benford P(d) = log10(1 + 1/d), shared 12-dp decimal literals. */
  private val benfordVals = Seq(
    "0.301029995664", "0.176091259056", "0.124938736608", "0.096910013008",
    "0.079181246048", "0.066946789631", "0.057991946978", "0.051152522447",
    "0.045757490561")
  private val benfordLits = benfordVals.map(v => s"CAST($v AS DECIMAL(14,12))")

  val q151_benford_sql: String = {
    val rows = benfordVals.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, CAST($v AS DECIMAL(14,12)))" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM lineitem),
       |digits AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs FROM d GROUP BY 1),
       |bf AS (SELECT * FROM (VALUES $rows) AS t(digit, exp_share)),
       |cells AS (
       |  SELECT g.digit, g.obs, (SELECT CAST(SUM(obs) AS BIGINT) FROM digits) AS n, b.exp_share
       |  FROM digits g JOIN bf b ON g.digit = b.digit),
       |c2 AS (
       |  SELECT digit, obs, n, exp_share,
       |    CAST(exp_share AS DOUBLE) * CAST(n AS DOUBLE) AS expected
       |  FROM cells),
       |c3 AS (
       |  SELECT digit, obs, n, exp_share, expected,
       |    ${graft.functions.Determinism.decqSql(
            """(CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)
       |      / expected""".stripMargin, 6)} AS contrib_q
       |  FROM c2),
       |t AS (SELECT CAST(SUM(contrib_q) AS DOUBLE) AS chi2 FROM c3)
       |SELECT digit, obs, n,
       |  CAST(obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share,
       |  CAST(exp_share AS DOUBLE) AS exp_share,
       |  CAST(contrib_q AS DOUBLE) AS contrib, chi2
       |FROM c3 CROSS JOIN t
       |ORDER BY digit""".stripMargin
  }

  /** q152 — declarative data-quality EXPECTATION SUITE (the
    * Deequ/Great-Expectations shape): primary-key uniqueness, value
    * ranges, categorical domains, and referential integrity, emitted
    * as one (check, table, violations, total, pass) report frame.
    * deva: the filter + count pipe chains a quality gate composes.
    *
    * Scale/shape: every per-table family of checks is ONE scan with
    * conditional aggregates melted by `stack` (never one job per
    * check — the q139 tiny-job lesson), and each referential check is
    * one anti-join (broadcast when the parent side is dim-sized,
    * shuffle otherwise — AQE's call). Nothing is collected; the
    * report frame is check-count-bounded.
    */
  def q152_expectations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)

    val liChecks = li.agg(
        count(lit(1)).as("total"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("v_qty"),
        sum(when(!col("l_discount").between(0, 0.5), 1L).otherwise(0L)).as("v_disc"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("v_price"),
        (count(lit(1)) - count_distinct(col("l_orderkey") * 10000 + col("l_linenumber"))).as("v_pk"))
      .select(expr(
        """stack(4,
          |  'quantity_in_1_50', v_qty,
          |  'discount_in_0_0.5', v_disc,
          |  'price_positive', v_price,
          |  'pk_unique', v_pk) AS (check_name, violations)""".stripMargin),
        lit("lineitem").as("table_name"), col("total"))

    val ordChecks = ord.agg(
        count(lit(1)).as("total"),
        (count(lit(1)) - count_distinct(col("o_orderkey"))).as("v_pk"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_total"),
        sum(when(!col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 1L)
          .otherwise(0L)).as("v_prio"))
      .select(expr(
        """stack(3,
          |  'pk_unique', v_pk,
          |  'totalprice_positive', v_total,
          |  'priority_domain', v_prio) AS (check_name, violations)""".stripMargin),
        lit("orders").as("table_name"), col("total"))

    val evChecks = ev.agg(
        count(lit(1)).as("total"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("v_val"),
        sum(when(!col("event_type").isin(
          "click", "error", "purchase", "signup", "view"), 1L).otherwise(0L)).as("v_type"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_user"))
      .select(expr(
        """stack(3,
          |  'value_nonnegative', v_val,
          |  'event_type_domain', v_type,
          |  'user_id_not_null', v_user) AS (check_name, violations)""".stripMargin),
        lit("events").as("table_name"), col("total"))

    val ordFk = ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_customer").as("check_name"), col("violations"),
        lit("orders").as("table_name"))
      .crossJoin(broadcast(ord.agg(count(lit(1)).as("total"))))
    val liFk = li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_orders").as("check_name"), col("violations"),
        lit("lineitem").as("table_name"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("total"))))

    liChecks.unionByName(ordChecks).unionByName(evChecks)
      .unionByName(ordFk).unionByName(liFk)
      .select(col("table_name"), col("check_name"), col("violations"),
        col("total"), (col("violations") === 0).as("pass"))
      .orderBy(col("table_name"), col("check_name"))
  }

  val q152_expectations_sql: String =
    """WITH li AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
      |    CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
      |    CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.5) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
      |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
      |    CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 10000 + l_linenumber) AS BIGINT) AS v_pk
      |  FROM lineitem),
      |ord AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_pk,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_total,
      |    CAST(SUM(CASE WHEN o_orderpriority NOT IN
      |      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END) AS BIGINT) AS v_prio
      |  FROM orders),
      |ev AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
      |    CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_val,
      |    CAST(SUM(CASE WHEN event_type NOT IN
      |      ('click','error','purchase','signup','view') THEN 1 ELSE 0 END) AS BIGINT) AS v_type,
      |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_user
      |  FROM events),
      |rows_out AS (
      |  SELECT 'lineitem' AS table_name, 'quantity_in_1_50' AS check_name, v_qty AS violations, total FROM li
      |  UNION ALL SELECT 'lineitem', 'discount_in_0_0.5', v_disc, total FROM li
      |  UNION ALL SELECT 'lineitem', 'price_positive', v_price, total FROM li
      |  UNION ALL SELECT 'lineitem', 'pk_unique', v_pk, total FROM li
      |  UNION ALL SELECT 'orders', 'pk_unique', v_pk, total FROM ord
      |  UNION ALL SELECT 'orders', 'totalprice_positive', v_total, total FROM ord
      |  UNION ALL SELECT 'orders', 'priority_domain', v_prio, total FROM ord
      |  UNION ALL SELECT 'events', 'value_nonnegative', v_val, total FROM ev
      |  UNION ALL SELECT 'events', 'event_type_domain', v_type, total FROM ev
      |  UNION ALL SELECT 'events', 'user_id_not_null', v_user, total FROM ev
      |  UNION ALL SELECT 'orders', 'fk_customer',
      |    CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |          WHERE c.c_custkey IS NULL) AS BIGINT),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
      |  UNION ALL SELECT 'lineitem', 'fk_orders',
      |    CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |          WHERE o.o_orderkey IS NULL) AS BIGINT),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem))
      |SELECT table_name, check_name, violations, total, violations = 0 AS pass
      |FROM rows_out ORDER BY table_name, check_name""".stripMargin

  /** q153 — join-key SKEW PROFILE: per candidate shuffle key
    * (lineitem.l_partkey / l_suppkey, orders.o_custkey,
    * events.user_id) the diagnostics that decide salting/AQE-skew
    * treatment before a 100 TB join ever runs — key cardinality, max
    * and exact p50/p90/p99 per-key row counts, and the max/avg skew
    * factor. The planning query behind SURVEY §5's skew doctrine
    * (q83's salting and the AQE skew spec act on what this measures).
    *
    * Scale/shape: per key the corpus collapses to (key, cnt) with
    * map-side partials, then to the COUNTS-OF-COUNTS histogram —
    * bounded by the distinct per-key multiplicities, not the corpus —
    * and the exact percentiles run the q117 cumulative idiom over
    * that tiny frame (windows partition by the profiled column's
    * name). No sort, no collect, two shuffles per profiled key.
    */
  def q153_skew_profile(spark: SparkSession, dir: String): DataFrame =
    skewProfileFrom(staticHists(spark, dir)
      .unionByName(hist(Tables.events(spark, dir), "user_id", "events.user_id")))

  /** One profiled column's counts-of-counts histogram. */
  private[queries] def hist(df: DataFrame, key: String, label: String): DataFrame =
    df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("keys"))
      .select(lit(label).as("col_name"), col("c"), col("keys"))

  /** The three non-events histograms (lineitem ×2, orders) — shared
    * with the streaming twin q198, which maintains the EVENTS
    * histogram online and reads these at projection (q109's
    * stream-static precedent).
    */
  private[queries] def staticHists(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    hist(li, "l_partkey", "lineitem.l_partkey")
      .unionByName(hist(li, "l_suppkey", "lineitem.l_suppkey"))
      .unionByName(hist(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
  }

  /** q153's report from the unioned counts-of-counts frame — shared
    * with the streaming twin q198.
    */
  private[queries] def skewProfileFrom(hists: DataFrame): DataFrame = {
    val tot = hists.groupBy(col("col_name")).agg(
      sum(col("keys")).as("n_keys"),
      sum(col("c") * col("keys")).as("rows"),
      max(col("c")).as("max_cnt"))
    val cum = hists.withColumn("cum",
      sum(col("keys")).over(Window.partitionBy(col("col_name")).orderBy(col("c"))))
    val qs = cum.join(broadcast(tot.select(col("col_name"), col("n_keys"))), "col_name")
      .select(col("col_name"), col("c"), col("cum"), col("n_keys"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      .filter(col("cum") >= expr("(p * n_keys + 99) div 100"))
      .groupBy(col("col_name"), col("p")).agg(min(col("c")).as("q"))
      .groupBy(col("col_name")).agg(
        max(when(col("p") === 50, col("q"))).as("p50_cnt"),
        max(when(col("p") === 90, col("q"))).as("p90_cnt"),
        max(when(col("p") === 99, col("q"))).as("p99_cnt"))
    tot.join(qs, "col_name")
      .select(col("col_name"), col("n_keys"), col("rows"), col("max_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        expr("CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(rows AS DOUBLE)")
          .as("max_over_avg"),
        expr("CAST(max_cnt AS DOUBLE) / CAST(rows AS DOUBLE)").as("top1_share"))
      .orderBy(col("col_name"))
  }

  val q153_skew_profile_sql: String = {
    def one(tbl: String, key: String, label: String) =
      s"""SELECT '$label' AS col_name, c, CAST(COUNT(*) AS BIGINT) AS keys FROM (
         |  SELECT $key, CAST(COUNT(*) AS BIGINT) AS c FROM $tbl GROUP BY $key) GROUP BY c""".stripMargin
    s"""WITH hists AS (
       |  ${one("lineitem", "l_partkey", "lineitem.l_partkey")}
       |  UNION ALL ${one("lineitem", "l_suppkey", "lineitem.l_suppkey")}
       |  UNION ALL ${one("orders", "o_custkey", "orders.o_custkey")}
       |  UNION ALL ${one("events", "user_id", "events.user_id")}),
       |tot AS (
       |  SELECT col_name, CAST(SUM(keys) AS BIGINT) AS n_keys,
       |    CAST(SUM(c * keys) AS BIGINT) AS rows_, CAST(MAX(c) AS BIGINT) AS max_cnt
       |  FROM hists GROUP BY col_name),
       |cum AS (
       |  SELECT col_name, c, keys,
       |    SUM(keys) OVER (PARTITION BY col_name ORDER BY c) AS cum
       |  FROM hists),
       |qsel AS (
       |  SELECT h.col_name, ps.pp AS p, CAST(MIN(h.c) AS BIGINT) AS q
       |  FROM cum h JOIN tot t USING (col_name)
       |  CROSS JOIN (SELECT * FROM (VALUES (50), (90), (99)) AS v(pp)) ps
       |  WHERE h.cum >= (ps.pp * t.n_keys + 99) // 100
       |  GROUP BY 1, 2),
       |qs AS (
       |  SELECT col_name,
       |    MAX(CASE WHEN p = 50 THEN q END) AS p50_cnt,
       |    MAX(CASE WHEN p = 90 THEN q END) AS p90_cnt,
       |    MAX(CASE WHEN p = 99 THEN q END) AS p99_cnt
       |  FROM qsel GROUP BY col_name)
       |SELECT t.col_name, t.n_keys, t.rows_ AS rows, t.max_cnt,
       |  q.p50_cnt, q.p90_cnt, q.p99_cnt,
       |  CAST(t.max_cnt AS DOUBLE) * CAST(t.n_keys AS DOUBLE) / CAST(t.rows_ AS DOUBLE) AS max_over_avg,
       |  CAST(t.max_cnt AS DOUBLE) / CAST(t.rows_ AS DOUBLE) AS top1_share
       |FROM tot t JOIN qs q USING (col_name)
       |ORDER BY col_name""".stripMargin
  }

  /** q177 — K-ANONYMITY audit over quasi-identifiers: cell sizes of
    * the (nation, market-segment) identifier combination at every
    * level of the generalization ladder (full pair → nation only →
    * global), flagging cells below k=5 — the re-identification risk
    * report a privacy review runs before releasing a training corpus
    * (completing the privacy family beside q74's PII scrub and q75's
    * decontamination: q74 removes direct identifiers, this measures
    * the QUASI-identifier risk that remains).
    *
    * Scale/shape: ONE rollup aggregation (single Expand ×3 feeding a
    * hash agg with map-side partials — the q33/q141 plan) over the
    * 2-column pruned projection; the level is integer GROUPING
    * arithmetic; output is label-bounded (≤ nations×segments cells).
    * at_risk is an exact integer comparison.
    */
  def q177_k_anonymity(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    kAnonFrom(cells)
  }

  /** The k-anonymity tail over a (n_name, c_mktsegment, n) leaf-cell
    * frame — shared verbatim by batch q177 and its streaming twin
    * q216 (pairing #36): counts are additive, so the three rollup
    * levels re-derive exactly from the label-bounded leaf cells
    * (which is also the better batch plan — pre-aggregate, then
    * Expand ×3 over ≤ nations×segments rows instead of the corpus).
    */
  private[queries] def kAnonFrom(cells: DataFrame): DataFrame = {
    cells
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("n")).as("n"),
        (grouping(col("n_name")) + grouping(col("c_mktsegment")))
          .cast("long").as("level"))
      .select(col("level"), col("n_name"),
        col("c_mktsegment").as("segment"), col("n"),
        (col("n") < 5).as("at_risk"))
      .orderBy(col("level"), col("n_name").asc_nulls_first,
        col("segment").asc_nulls_first)
  }

  val q177_k_anonymity_sql: String =
    """SELECT
      |  CAST(GROUPING(n.n_name) + GROUPING(c.c_mktsegment) AS BIGINT) AS level,
      |  n.n_name, c.c_mktsegment AS segment, COUNT(*) AS n,
      |  COUNT(*) < 5 AS at_risk
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
      |ORDER BY level, n_name ASC NULLS FIRST, segment ASC NULLS FIRST""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_k_anonymity" -> (q177_k_anonymity _),
    "q149_ab_test" -> (q149_ab_test _),
    "q246_mann_whitney" -> (q246_mann_whitney _),
    "q252_median_test" -> (q252_median_test _),
    "q262_kruskal_wallis" -> (q262_kruskal_wallis _),
    "q264_ks_test" -> (q264_ks_test _),
    "q266_spearman" -> (q266_spearman _),
    "q274_wilcoxon" -> (q274_wilcoxon _),
    "q150_chi_square" -> (q150_chi_square _),
    "q151_benford" -> (q151_benford _),
    "q152_expectations" -> (q152_expectations _),
    "q153_skew_profile" -> (q153_skew_profile _))

  val oracles: Map[String, String] = Map(
    "q177_k_anonymity" -> q177_k_anonymity_sql,
    "q149_ab_test" -> q149_ab_test_sql,
    "q246_mann_whitney" -> q246_mann_whitney_sql,
    "q252_median_test" -> q252_median_test_sql,
    "q262_kruskal_wallis" -> q262_kruskal_wallis_sql,
    "q264_ks_test" -> q264_ks_test_sql,
    "q266_spearman" -> q266_spearman_sql,
    "q274_wilcoxon" -> q274_wilcoxon_sql,
    "q150_chi_square" -> q150_chi_square_sql,
    "q151_benford" -> q151_benford_sql,
    "q152_expectations" -> q152_expectations_sql,
    "q153_skew_profile" -> q153_skew_profile_sql)
}
