package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Cast, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine PORTABILITY lint (the round-10 lesson, mechanized).
  *
  * Round 10 shipped five gate queries whose hashed outputs went
  * through raw double→DECIMAL CASTs; the local DuckDB replica agreed
  * with Spark, the driver's DuckDB build did not — cast rounding
  * (tie-break mode, shortest-string vs exact-binary expansion) is
  * engine- AND version-sensitive, while `floor` of a bit-identical
  * double plus exact decimal arithmetic is not. The sanctioned edge
  * is [[graft.functions.Determinism.decq]] / `decqSql` (the q173
  * idiom). This suite makes the rule self-enforcing:
  *
  *  1. plan lint — walks every BATCH query's analyzed plan and fails
  *     on any Cast(DoubleType → DecimalType(scale > 2)). decq never
  *     produces one (its only cast is long→decimal), so a hit means
  *     someone reintroduced the raw cast. Scale ≤ 2 is exempt: the
  *     dec2 cents canonicalization casts INPUT doubles that are
  *     exact 2-decimal values by data construction (no rounding
  *     happens, so no divergence surface). Streaming queries are
  *     excluded from the walk (building them executes the stream;
  *     their hashed projections run the SHARED batch pipelines
  *     already covered here, and their oracles are covered by the
  *     text lint below).
  *  2. oracle text lint — every oracleSql string: no libm `power()`
  *     (exact literals instead); version-sensitive builtins
  *     (jaro_winkler_similarity) only with a floor-quantized edge;
  *     any `AS DECIMAL(p, s>2)` must be the decq idiom, fed by one,
  *     or a numeric-literal cast.
  *  3. planted-violation self-tests — the lint must FAIL on a
  *     planted raw cast, or it is vacuous (the SurveySpec lesson:
  *     an unanchored-regex lint once passed on everything).
  */
class PortabilitySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  /** All Cast(double → decimal(_, s>2)) in the plan, incl. subquery
    * plans (q192's correlated subqueries live there).
    */
  private def rawCasts(plan: LogicalPlan): Seq[String] = {
    val here = plan.flatMap { node =>
      node.expressions.flatMap(_.collect {
        // foldable children are compile-time constants (q185's
        // within-class 1.0): both engines cast their own literal
        // exactly, no rounding surface
        case c: Cast if c.child.dataType == DoubleType &&
            c.dataType.isInstanceOf[DecimalType] &&
            c.dataType.asInstanceOf[DecimalType].scale > 2 &&
            !c.child.foldable =>
          c.toString.take(140)
      })
    }
    val inSubqueries = plan.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case s: SubqueryExpression => rawCasts(s.plan)
      }).flatten
    }
    here ++ inSubqueries
  }

  test("no batch query hashes a raw double→DECIMAL(scale>2) cast") {
    val streaming = graft.queries.StreamQueries.defs.keySet
    val bad = (SparkEntry.queries -- streaming).toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hits = rawCasts(fn(spark, dir).queryExecution.analyzed)
        spark.catalog.clearCache() // queries that persist() must not pile up
        hits.map(h => s"$name: $h")
    }
    assert(bad.isEmpty,
      s"raw double→DECIMAL casts (use Determinism.decq — round-10 lesson):\n${bad.mkString("\n")}")
  }

  // the decq idiom's tail: ... AS DECIMAL(18,0)) * 0.0…1 AS DECIMAL(p,s))
  private val decqIdiom =
    """AS DECIMAL\(18,0\)\)\s*\*\s*0\.0*1\s+AS DECIMAL\(\d+,\s*\d+\)\)""".r
  private val literalCast =
    """CAST\(-?\d+(?:\.\d+)? AS DECIMAL\(\d+,\s*\d+\)\)""".r
  private val highScale = """AS DECIMAL\(\d+,\s*(\d+)\)""".r

  private def oracleViolations(sql: String): Seq[String] = {
    val noPower =
      if (sql.contains("power(")) Seq("libm power() — use an exact literal") else Nil
    // round-12 hardening (VERDICT r11 item 3): version-sensitive
    // builtins are banned from oracle SQL OUTRIGHT — round 11 proved
    // empirically that floor-quantizing the edge does NOT neutralize
    // a builtin whose VALUE differs across engine builds (q185 stayed
    // driver-red through two quantization rounds). Render the scorer
    // from portable SQL instead (the q185 unrolled matcher).
    val jw =
      if (sql.contains("jaro_winkler_similarity"))
        Seq("version-sensitive builtin jaro_winkler_similarity — render the " +
          "scorer from portable integer SQL (the q185 matcher idiom)")
      else Nil
    val cleaned = literalCast.replaceAllIn(
      decqIdiom.replaceAllIn(sql, "DECQ_OK"), "LIT_OK")
    val rawDec = highScale.findAllMatchIn(cleaned)
      .filter(_.group(1).toInt > 2)
      // an exact decimal→decimal trim is fine when a decq idiom feeds
      // it (q105's tf * idf_q): allow if DECQ_OK is in the cast's
      // immediate window
      .filterNot(m => cleaned.substring(math.max(0, m.start - 120), m.start)
        .contains("DECQ_OK"))
      .map(m => s"raw high-scale cast: ${m.matched}")
      .toSeq
    noPower ++ jw ++ rawDec
  }

  test("no oracle SQL carries a version-sensitive edge") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      oracleViolations(sql).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"oracle portability violations:\n${bad.mkString("\n")}")
  }

  test("plan lint catches a planted raw cast (not vacuous)") {
    import spark.implicits._
    val planted = Seq(1.5).toDF("x")
      .select(col("x").cast("decimal(18,6)").as("y"))
    assert(rawCasts(planted.queryExecution.analyzed).nonEmpty)
    // and the sanctioned edge is clean:
    val ok = Seq(1.5).toDF("x")
      .select(graft.functions.Determinism.decq(col("x"), 6).as("y"))
    assert(rawCasts(ok.queryExecution.analyzed).isEmpty)
  }

  test("text lint catches planted oracle violations (not vacuous)") {
    assert(oracleViolations("SELECT CAST(x AS DECIMAL(18,6)) FROM t").nonEmpty)
    assert(oracleViolations("SELECT 63.0 * power(2.0, 60) FROM t").nonEmpty)
    assert(oracleViolations(
      "SELECT jaro_winkler_similarity(a, b) AS jw FROM t").nonEmpty)
    // floor-quantization no longer launders a version-sensitive
    // builtin (the round-11 lesson, mechanized)
    assert(oracleViolations(
      "SELECT floor(jaro_winkler_similarity(a, b) * 10000.0) AS q FROM t").nonEmpty)
    assert(oracleViolations(
      s"SELECT ${graft.functions.Determinism.decqSql("x", 6)} FROM t").isEmpty)
    assert(oracleViolations("SELECT CAST(0.30103 AS DECIMAL(14,12)) FROM t").isEmpty)
  }

  /** Round-12 inverse arm (VERDICT r11 item 3): the formerly
    * driver-red queries must hash NOTHING an engine build can compute
    * differently — their output schemas carry no floating-point
    * column at all; every decimal is fed by an exact long (the plan
    * lint above rejects any double→decimal feed). Streaming twins
    * q194/q195 share these projections verbatim (Pairing parity
    * specs pin bit-equality), so the batch schemas cover them. The
    * r11–r14 diagnostic family (q185d, q193d, q300d) delivered its
    * verdict and was deleted in r15 (VERDICT r14 item 2); the
    * operator queries keep the exact-integer contract the file
    * established.
    */
  test("ex-red queries hash only exact-integer surfaces (no float columns)") {
    val exRed = Seq("q185_jaro_linkage", "q187_kmv_overlap", "q193_theil_sen")
    val bad = exRed.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, dir).schema
      spark.catalog.clearCache()
      schema.fields.collect {
        case f if f.dataType == DoubleType ||
            f.dataType == org.apache.spark.sql.types.FloatType =>
          s"$name.${f.name}: ${f.dataType.catalogString}"
      }
    }
    assert(bad.isEmpty,
      s"floating-point columns on an exact-integer gate surface:\n${bad.mkString("\n")}")
  }

  test("decq and decqSql agree value-for-value (the two renderings cannot drift)") {
    import spark.implicits._
    val vals = Seq(-1.2345678911, -0.0078125, 0.0, 1.0 / 3.0, 0.1234565,
      2.5e9, -2.5e9, 0.9999999999, 1.0 / 128.0)
    val df = vals.toDF("x")
    df.createOrReplaceTempView("decq_probe")
    val viaColumn = df.select(graft.functions.Determinism.decq(col("x"), 6).as("q"))
      .collect().map(_.getDecimal(0)).toSeq
    val viaSql = spark.sql(
      s"SELECT ${graft.functions.Determinism.decqSql("x", 6)} AS q FROM decq_probe")
      .collect().map(_.getDecimal(0)).toSeq
    assert(viaColumn == viaSql)
  }
}
