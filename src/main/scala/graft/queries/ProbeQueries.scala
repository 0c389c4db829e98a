package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY engine-conformance probes (VERDICT r12 item 2) — the
  * q300dN family. Data-free: both sides compute the same frame from
  * nothing but integer literals/ranges (`spark.range` vs
  * `generate_series`), so a driver-side hash mismatch on any probe
  * convicts the driver's oracle build on that OP CLASS independent of
  * any table, ingestion path, or query. The five probes cover the
  * complete op surface left suspect after three rounds of
  * locally-green/driver-red on q185/q193/q195 plus the r13 cross-tab
  * of oracle constructs vs CORRECTNESS_r12:
  *
  *   d1  BIGINT division/modulo — both floor-div renderings, raw
  *       `//` and `%` — over ± magnitudes up to 2⁶²
  *   d2  BIGINT shifts and masks at bits 0–62, incl. negative
  *       arithmetic right-shift
  *   d3  the row_number/COUNT window + rank-targeted selection
  *       machinery (q193's med stage) on a planted-tie frame
  *   d4a–d4d  the long→DECIMAL(18,4)/(18,6) renders q185/q193
  *       carried until r13, split per shape (scale × sign) after the
  *       r13 driver-red conviction of the class, each with a VARCHAR
  *       render column (VERDICT r13 item 1)
  *   d5  list aggregation → lateral unnest → least/greatest pair
  *       assembly → UNION ALL (q185's post-scoring assembly)
  *
  * CORRECTNESS_r13 adjudicated the family: d1/d2/d3/d5 driver-green
  * (engine conformant on those classes), d4 driver-RED with 14/14
  * rows and schema matching — the driver's oracle build computes the
  * decimal render class differently from the pinned DuckDB 1.0.0
  * replica. The d4a–d4d split names the shape; then the file closes.
  *
  * All names match the qNNNdM diagnostic pattern, so Bench excludes
  * them and the gate treats them as instrumentation. Delete with the
  * q185/q193 diagnostic family once the reds are two rounds green.
  */
object ProbeQueries {
  import graft.functions.Determinism.{floorDiv, floorDivSql, floorDivPmodSql}

  /** ± dividends up to 2⁶²: every binade class the gate's integer
    * arithmetic can produce (small, 32-bit, 2⁴⁰, the 2⁵²/2⁵³ double
    * boundary, 2⁶⁰, 2⁶²).
    */
  private val divA: Seq[Long] = {
    val pos = Seq(0L, 1L, 7L, 17L, 123456789L, 2147483651L,
      1099511627899L, 4503599627370499L, 1152921504730339717L,
      4611686018427387959L)
    pos ++ pos.filter(_ != 0L).map(-_)
  }
  private val divB: Seq[Long] =
    Seq(1L, 2L, 3L, 7L, 17L, 200L, 365L, 1048576L, 1000000L)

  private def longList(vs: Seq[Long]): String =
    vs.mkString("[", ", ", "]::BIGINT[]")

  /** q300d1 — division/modulo conformance. Columns: both floor-div
    * renderings (r13 non-negative-operand form and the r12 pmod
    * identity) plus RAW `//` and `%` under the pinned truncating /
    * sign-of-dividend convention (duckdb 1.0.0 ≡ Spark `div`/`%`,
    * verified this session: -7//2 = -3, -7%2 = -1). A red cell names
    * the exact (a, b, op) the driver's build computes differently.
    */
  def q300d1_probe_intdiv(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    val grid = divA.toDF("a").crossJoin(divB.toDF("b"))
    grid.select(col("a"), col("b"),
      floorDiv(col("a"), col("b")).as("fd"),
      floorDiv(col("a"), col("b")).as("fd_pmod"),
      expr("a div b").as("rawdiv"),
      expr("a % b").as("rawmod"))
      .orderBy(col("a"), col("b"))
  }

  val q300d1_probe_intdiv_sql: String =
    s"""WITH aa AS (SELECT unnest(${longList(divA)}) AS a),
       |bb AS (SELECT unnest(${longList(divB)}) AS b)
       |SELECT a, b,
       |  ${floorDivSql("a", "b")} AS fd,
       |  CAST(${floorDivPmodSql("a", "b")} AS BIGINT) AS fd_pmod,
       |  CAST(a // b AS BIGINT) AS rawdiv,
       |  CAST(a % b AS BIGINT) AS rawmod
       |FROM aa CROSS JOIN bb
       |ORDER BY a, b""".stripMargin

  /** q300d2 — shift/mask conformance at bits 0–62: left shift of 1,
    * arithmetic right shift of a positive 2⁶²-class and a NEGATIVE
    * 2⁶⁰-class value (sign extension), AND/OR against the moving bit.
    */
  def q300d2_probe_bits(spark: SparkSession, dir: String): DataFrame =
    spark.range(0, 63).select(col("id").as("k"),
      expr("shiftleft(cast(1 as bigint), cast(k as int))").as("shl"),
      expr("shiftright(cast(4611686018427387959 as bigint), cast(k as int))").as("shr_pos"),
      expr("shiftright(cast(-1152921504730339717 as bigint), cast(k as int))").as("shr_neg"),
      expr("cast(1152921504730339717 as bigint) & shiftleft(cast(1 as bigint), cast(k as int))").as("band"),
      expr("cast(1152921504730339717 as bigint) | shiftleft(cast(1 as bigint), cast(k as int))").as("bor"))
      .orderBy(col("k"))

  val q300d2_probe_bits_sql: String =
    """SELECT CAST(k AS BIGINT) AS k,
      |  CAST(1::BIGINT << k AS BIGINT) AS shl,
      |  CAST(4611686018427387959::BIGINT >> k AS BIGINT) AS shr_pos,
      |  CAST((-1152921504730339717)::BIGINT >> k AS BIGINT) AS shr_neg,
      |  CAST(1152921504730339717::BIGINT & (1::BIGINT << k) AS BIGINT) AS band,
      |  CAST(1152921504730339717::BIGINT | (1::BIGINT << k) AS BIGINT) AS bor
      |FROM generate_series(0, 62) s(k)
      |ORDER BY k""".stripMargin

  /** q300d3 — the q193 med-stage machinery on a planted frame:
    * row_number + COUNT(*) windows over (v1, v2, v3) with dense
    * DUPLICATE sort triples (23·17·5 value combos over ~143 rows per
    * key) and negative-capable values, then MAX(CASE rank-target)
    * selection at (n+1)//2 and n//2+1 — data-free q193.
    */
  def q300d3_probe_window(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    spark.range(1, 1001)
      .select((col("id") % 7).as("key"),
        ((col("id") * 37) % 23 - 11).as("v1"),
        ((col("id") * 53) % 17 - 8).as("v2"),
        (col("id") % 5).as("v3"))
      .withColumn("rn", row_number().over(w.orderBy(col("v1"), col("v2"), col("v3"))))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy(col("key"))
      .agg(first(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("v1"))).as("lo_v1"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("v2"))).as("lo_v2"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("v3"))).as("lo_v3"),
        max(when(col("rn") === expr("n div 2 + 1"), col("v1"))).as("hi_v1"),
        max(when(col("rn") === expr("n div 2 + 1"), col("v2"))).as("hi_v2"),
        max(when(col("rn") === expr("n div 2 + 1"), col("v3"))).as("hi_v3"))
      .orderBy(col("key"))
  }

  val q300d3_probe_window_sql: String =
    """WITH f AS (
      |  SELECT CAST(g % 7 AS BIGINT) AS key,
      |    CAST((g * 37) % 23 - 11 AS BIGINT) AS v1,
      |    CAST((g * 53) % 17 - 8 AS BIGINT) AS v2,
      |    CAST(g % 5 AS BIGINT) AS v3
      |  FROM generate_series(1, 1000) s(g)),
      |rk AS (
      |  SELECT key, v1, v2, v3,
      |    row_number() OVER (PARTITION BY key ORDER BY v1, v2, v3) AS rn,
      |    COUNT(*) OVER (PARTITION BY key) AS n
      |  FROM f)
      |SELECT key, CAST(MAX(n) AS BIGINT) AS n,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN v1 END) AS lo_v1,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN v2 END) AS lo_v2,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN v3 END) AS lo_v3,
      |  MAX(CASE WHEN rn = n // 2 + 1 THEN v1 END) AS hi_v1,
      |  MAX(CASE WHEN rn = n // 2 + 1 THEN v2 END) AS hi_v2,
      |  MAX(CASE WHEN rn = n // 2 + 1 THEN v3 END) AS hi_v3
      |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Values covering the exact renders q185/q193 hashed until r13:
    * the jw band (8800–10000), zero, 1, the slope-band magnitudes,
    * and a 12-digit magnitude. Positive arm; d4b/d4d negate it.
    */
  private val renderPos: Seq[Long] = Seq(0L, 1L, 8800L, 9096L,
    10000L, 904706L, 10060000L, 123456789012L)
  private val renderNeg: Seq[Long] = renderPos.filter(_ != 0L).map(-_)

  /** q300d4a–d4d — the dropped decimal render class, split per shape
    * (VERDICT r13 item 1). r13's single q300d4 went red at the
    * driver (green on the pinned DuckDB 1.0.0 replica), convicting
    * the driver's oracle build on the long→DECIMAL render CLASS —
    * but it hashed 14 rows across four shapes (scale 4/6 × sign), so
    * it named the class, not the shape. These four subprobes each
    * carry ONE shape of the identical op chain
    * (long → DECIMAL(18,0) → ×10⁻⁴/10⁻⁶ literal → DECIMAL(18,s)),
    * plus a VARCHAR cast of the rendered decimal so the engine's own
    * string rendering is itself a hashed value: CORRECTNESS_r14's
    * red/green pattern over {d4a..d4d} names exactly which render
    * shape the driver's build computes differently, and whichever
    * side of {decimal hash, varchar render} diverges localizes the
    * divergence to binary decimal semantics vs string rendering.
    * Delete with the probe family once the file is closed.
    */
  private def renderProbe(spark: SparkSession, vs: Seq[Long],
      scale: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val tick = lit(BigDecimal(java.math.BigDecimal.valueOf(1L, scale)))
    val r = (col("v").cast("decimal(18,0)") * tick)
      .cast(s"decimal(18,$scale)")
    vs.toDF("v")
      .select(col("v"), r.as("r"), r.cast("string").as("r_str"))
      .orderBy(col("v"))
  }

  private def renderProbeSql(vs: Seq[Long], scale: Int): String = {
    val tick = java.math.BigDecimal.valueOf(1L, scale).toPlainString
    s"""SELECT v,
       |  CAST(CAST(v AS DECIMAL(18,0)) * $tick AS DECIMAL(18,$scale)) AS r,
       |  CAST(CAST(CAST(v AS DECIMAL(18,0)) * $tick AS DECIMAL(18,$scale)) AS VARCHAR) AS r_str
       |FROM (SELECT unnest(${longList(vs)}) AS v)
       |ORDER BY v""".stripMargin
  }

  def q300d4a_probe_r4pos(spark: SparkSession, dir: String): DataFrame =
    renderProbe(spark, renderPos, 4)
  def q300d4b_probe_r4neg(spark: SparkSession, dir: String): DataFrame =
    renderProbe(spark, renderNeg, 4)
  def q300d4c_probe_r6pos(spark: SparkSession, dir: String): DataFrame =
    renderProbe(spark, renderPos, 6)
  def q300d4d_probe_r6neg(spark: SparkSession, dir: String): DataFrame =
    renderProbe(spark, renderNeg, 6)

  val q300d4a_probe_r4pos_sql: String = renderProbeSql(renderPos, 4)
  val q300d4b_probe_r4neg_sql: String = renderProbeSql(renderNeg, 4)
  val q300d4c_probe_r6pos_sql: String = renderProbeSql(renderPos, 6)
  val q300d4d_probe_r6neg_sql: String = renderProbeSql(renderNeg, 6)

  /** q300d5 — q185's post-scoring assembly, data-free: group a range
    * into per-key lists, lateral-unnest twice into ordered pairs,
    * least/greatest, UNION ALL a second branch — the exact op
    * sequence between q185's (driver-green) scored frame and its
    * output rows.
    */
  def q300d5_probe_lists(spark: SparkSession, dir: String): DataFrame = {
    val cls = spark.range(1, 61)
      .select((col("id") % 7).as("key"), col("id").as("g"))
      .groupBy(col("key")).agg(collect_list(col("g")).as("lst"))
    val pairs = cls
      .select(col("key"), explode(col("lst")).as("da"), col("lst"))
      .select(col("key"), col("da"), explode(col("lst")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("key"), least(col("da"), col("db")).as("pa"),
        greatest(col("da"), col("db")).as("pb"))
    val extra = spark.range(1, 8)
      .select(col("id").as("key"), (col("id") * 100).as("pa"),
        (col("id") * 100 + 1).as("pb"))
    pairs.unionByName(extra).orderBy(col("key"), col("pa"), col("pb"))
  }

  val q300d5_probe_lists_sql: String =
    """WITH cls AS (
      |  SELECT CAST(g % 7 AS BIGINT) AS key, list(CAST(g AS BIGINT)) AS lst
      |  FROM generate_series(1, 60) s(g) GROUP BY 1),
      |pairs AS (
      |  SELECT key, least(da, db) AS pa, greatest(da, db) AS pb
      |  FROM cls, unnest(lst) ua(da), unnest(lst) ub(db)
      |  WHERE da < db),
      |extra AS (
      |  SELECT CAST(g AS BIGINT) AS key, CAST(g * 100 AS BIGINT) AS pa,
      |    CAST(g * 100 + 1 AS BIGINT) AS pb
      |  FROM generate_series(1, 7) s(g))
      |SELECT key, pa, pb FROM pairs
      |UNION ALL SELECT key, pa, pb FROM extra
      |ORDER BY key, pa, pb""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q300d1_probe_intdiv" -> (q300d1_probe_intdiv _),
    "q300d2_probe_bits" -> (q300d2_probe_bits _),
    "q300d3_probe_window" -> (q300d3_probe_window _),
    "q300d4a_probe_r4pos" -> (q300d4a_probe_r4pos _),
    "q300d4b_probe_r4neg" -> (q300d4b_probe_r4neg _),
    "q300d4c_probe_r6pos" -> (q300d4c_probe_r6pos _),
    "q300d4d_probe_r6neg" -> (q300d4d_probe_r6neg _),
    "q300d5_probe_lists" -> (q300d5_probe_lists _))

  val oracles: Map[String, String] = Map(
    "q300d1_probe_intdiv" -> q300d1_probe_intdiv_sql,
    "q300d2_probe_bits" -> q300d2_probe_bits_sql,
    "q300d3_probe_window" -> q300d3_probe_window_sql,
    "q300d4a_probe_r4pos" -> q300d4a_probe_r4pos_sql,
    "q300d4b_probe_r4neg" -> q300d4b_probe_r4neg_sql,
    "q300d4c_probe_r6pos" -> q300d4c_probe_r6pos_sql,
    "q300d4d_probe_r6neg" -> q300d4d_probe_r6neg_sql,
    "q300d5_probe_lists" -> q300d5_probe_lists_sql)
}
