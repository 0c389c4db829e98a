package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteCents — the r11 injected optimizer rule. Pins: the rewrite
  * fires on both spellings of the exact-cents idiom (the oracle SQL
  * cast chain and the DataFrame dec2(x)*100 form), it is
  * value-identical to the un-rewritten cast chain on a rule-excluded
  * session — including the shortest-string rounding edges
  * (2.675 → 268, never 267) — it replays the chain's eval mode on
  * the NaN/overflow domain (ANSI raises, LEGACY nulls), and
  * near-miss shapes are left alone.
  *
  * Note: the plan-only tests still execute the projection — Spark's
  * ConvertToLocalRelation evaluates a Project over a LocalRelation at
  * OPTIMIZE time — so the in-range frame must genuinely be in-range.
  */
class RewriteCentsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private val chain = "CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** In-range edges: shortest-string rounding traps, negatives,
    * signed zero, near-.005 values, the largest in-range magnitudes.
    */
  private def edges(s: SparkSession): DataFrame = {
    val sp = s
    import sp.implicits._
    Seq[java.lang.Double](
      2.675, -2.675, 0.005, -0.005, 1.005, 2.665, 0.0, -0.0,
      1234.56, -1234.56, 0.004999999999, 99.994999,
      9.99999999999e15, -9.99999999999e15,
      null).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
  }

  test("both cents spellings rewrite to graft_cents") {
    // plan-shape asserts need a parquet-backed frame:
    // ConvertToLocalRelation folds a Project over a LocalRelation to
    // data at optimize time, leaving no expression to inspect
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val sql = ev.selectExpr("event_id",
      "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
    assert(sql.queryExecution.optimizedPlan.toString.contains("graft_cents"),
      s"rule did not fire on the SQL spelling:\n${sql.queryExecution.optimizedPlan}")
    val df = ev.select(col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_cents"),
      s"rule did not fire on the DataFrame spelling:\n${df.queryExecution.optimizedPlan}")
    // reversed operand order too
    val rev = ev.select(col("event_id"),
      (lit(100) * col("value").cast("decimal(18,2)")).cast("long").as("c"))
    assert(rev.queryExecution.optimizedPlan.toString.contains("graft_cents"))
  }

  test("rewritten and cast-chain forms agree row-for-row (incl. rounding edges)") {
    val on = edges(spark).selectExpr("id", s"$chain AS c")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteCents")
    val base = edges(off).selectExpr("id", s"$chain AS c")
    assert(!base.queryExecution.optimizedPlan.toString.contains("graft_cents"),
      "exclusion conf did not disable the rule")
    base.collect().foreach { r =>
      val want = if (r.isNullAt(1)) null else r.getLong(1)
      assert(on(r.getLong(0)) == want, s"value drift at id ${r.getLong(0)}")
    }
    // the load-bearing rounding edge, pinned explicitly: 2.675's
    // binary value is 2.67499…, but the cast rounds its SHORTEST
    // string, so cents must be 268 (a numeric-rounding kernel would
    // say 267)
    assert(on(0L) == 268L)
    assert(on(1L) == -268L)
  }

  test("codegen compiles with a NON-NULLABLE child under ANSI (ADVICE r11)") {
    // nullable = !ansi || child.nullable = false here: nullSafeCodeGen
    // pins isNull to FalseLiteral without declaring it, so the null
    // branch must not be emitted — before the r12 fix this silently
    // fell back to interpreted execution on a Janino compile error.
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    // parquet-backed (ConvertToLocalRelation would fold a local frame
    // before any codegen exists); coalesce(col, lit) is non-nullable
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val df = ev.select(
      graft.plans.Cents(coalesce(col("value"), lit(0.0d))).as("c"),
      (coalesce(col("value"), lit(0.0d)).cast("decimal(18,2)") * 100)
        .cast("long").as("want"))
    val centsExpr = df.queryExecution.analyzed.expressions
      .flatMap(_.collect { case c: graft.plans.Cents => c }).head
    assert(!centsExpr.child.nullable && !centsExpr.nullable,
      "test premise broke: the child must be non-nullable under ANSI")
    // the generated Java must COMPILE (a fallback would still be
    // value-correct, so assert on the codegen source itself)
    val codegen = df.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.getOrElse(fail(s"no codegen span:\n${df.queryExecution.executedPlan}"))
    val (_, source) = codegen.doCodeGen()
    org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compile(source)
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("centsOfDouble (stream-twin state cents) replays dec2 semantics exactly (ADVICE r11)") {
    import graft.functions.Determinism.centsOfDouble
    assert(centsOfDouble(2.675) == 268L)
    assert(centsOfDouble(-2.675) == -268L)
    assert(centsOfDouble(0.005) == 1L)
    assert(centsOfDouble(0.0) == 0L)
    // the divergence class the helper kills (values found by exhaustive
    // search over 3-decimal inputs): 1.005's binary value is 1.00499…,
    // so floor(x·100 + 0.5) lands at 100 — but dec2 rounds the SHORTEST
    // string "1.005" HALF_UP to 1.01 → 101 cents. Same for 0.145, 2.135.
    Seq(1.005 -> (100L, 101L), 0.145 -> (14L, 15L), 2.135 -> (213L, 214L))
      .foreach { case (x, (fl, dc)) =>
        assert(math.floor(x * 100 + 0.5).toLong == fl, s"floor form at $x")
        assert(centsOfDouble(x) == dc, s"dec2 form at $x")
      }
    // and it is the SAME function as the batch kernel, not a copy
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val x = (rnd.nextInt(2000001) - 1000000) / 1000.0
      assert(centsOfDouble(x) == graft.plans.Cents.centsOf(x, ansi = true).longValue)
    }
  }

  test("NaN/overflow domain replays the chain's eval mode: ANSI raises, LEGACY nulls") {
    val sp = spark
    import sp.implicits._
    def badFrame(s: SparkSession): DataFrame = {
      val sx = s
      import sx.implicits._
      Seq[java.lang.Double](1.0e16, Double.NaN, Double.PositiveInfinity)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    }
    // ANSI (the session default): both the rewritten kernel and the
    // rule-excluded chain must raise on the same rows
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "expected Spark 4's ANSI default — the parity claim below assumes it")
    intercept[Exception] {
      badFrame(spark).selectExpr("id", s"$chain AS c").collect()
    }
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteCents")
    intercept[Exception] {
      badFrame(off).selectExpr("id", s"$chain AS c").collect()
    }
    // LEGACY: both sides null the whole bad domain
    val legacyOn = spark.newSession()
    legacyOn.conf.set("spark.sql.ansi.enabled", "false")
    val lOn = badFrame(legacyOn).selectExpr("id", s"$chain AS c")
    // plan assert on a parquet frame (ConvertToLocalRelation, above)
    assert(Tables.events(legacyOn, "/root/testdata/sf0.001")
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .queryExecution.optimizedPlan.toString.contains("graft_cents"),
      "rule must also fire on the LEGACY-mode chain")
    val legacyOff = spark.newSession()
    legacyOff.conf.set("spark.sql.ansi.enabled", "false")
    legacyOff.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteCents")
    val got = lOn.collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
    val want = badFrame(legacyOff).selectExpr("id", s"$chain AS c")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
    assert(got == want)
    assert(got.forall(_._2), s"LEGACY bad domain must be all-null, got $got")
  }

  test("corpus-scale value identity on the events value column") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val on = ev.selectExpr("event_id", s"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
    assert(on.queryExecution.optimizedPlan.toString.contains("graft_cents"))
    val native = ev.select(col("event_id"), graft.plans.Cents(col("value")).as("c"))
    assert(on.collect().map(_.toString).sorted.toSeq ==
      native.collect().map(_.toString).sorted.toSeq)
  }

  test("near-miss shapes are left alone") {
    val sp = spark
    import sp.implicits._
    // small values only: the wrongscale DECIMAL(18,3) column must not
    // overflow under ConvertToLocalRelation's eager ANSI evaluation
    val small = Seq[java.lang.Double](2.675, -1.0, 0.005, null)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val df = small.selectExpr(
      "CAST(CAST(v AS DECIMAL(18,2)) * 10 AS BIGINT) AS tenths",   // not ×100
      "CAST(CAST(v AS DECIMAL(18,3)) * 100 AS BIGINT) AS wrongscale", // not scale 2
      "CAST(CAST(v AS DECIMAL(18,2)) * 100 AS INT) AS wrongtarget")   // not BIGINT
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_cents"), s"over-eager rewrite:\n$opt")
  }
}
