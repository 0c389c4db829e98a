package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Native kernel for the engine's exact-cents idiom (SURVEY §4):
  *
  *   CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)
  *
  * — the canonical money canonicalization every revenue query runs
  * before its order-free integer sum. Semantically IDENTICAL to the
  * composed form bit for bit, including its edges:
  *
  *  - rounding follows Spark's double→DECIMAL cast exactly: the
  *    double's SHORTEST decimal representation (BigDecimal.valueOf =
  *    Double.toString) rounded HALF_UP at scale 2 — NOT numeric
  *    rounding of the binary value (1.005 is stored as 1.00499…, so
  *    a fused floor(x·100 + 0.5) kernel says 100 cents, but the cast
  *    yields 1.01 = 101 because the string "1.005" rounds up — a
  *    silent off-by-one on exactly the values money data is full
  *    of; spec-pinned in RewriteCentsSpec);
  *  - NaN/Infinity and DECIMAL(18,2) overflow (|x| ≥ 10^16) follow
  *    the cast chain's eval mode: ANSI (Spark 4's default) raises,
  *    LEGACY yields null. The `ansi` flag is captured from the Cast
  *    nodes the rewrite replaced.
  *
  * What the composed form pays per row: a Decimal allocation for the
  * cast, a second Decimal + precision-check for the ×100 multiply
  * (result DECIMAL(22,2)), and a BigDecimal longValue for the final
  * cast. The kernel does one BigDecimal setScale and reads the
  * unscaled value — the ×100 is free (unscaled-at-scale-2 IS cents).
  *
  * [[RewriteCents]] injects this under the composed shape, so SQL
  * ported from the DuckDB oracle spelling gets the kernel silently —
  * the same story as [[RewriteHash60]].
  */
case class Cents(child: Expression, ansi: Boolean) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = !ansi || child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cents needs a double column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Cents.centsOf(input.asInstanceOf[Double], ansi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // When this expression is non-nullable (ANSI with a
      // non-nullable child — centsOf raises instead of returning
      // null), nullSafeCodeGen pins ev.isNull to FalseLiteral and
      // never DECLARES the variable, so referencing ev.isNull here
      // would emit uncompilable Java and silently fall back to
      // interpreted execution (ADVICE r11).
      if (nullable) {
        val r = ctx.freshName("cents")
        s"""
           |java.lang.Long $r = graft.plans.Cents.centsOf($c, $ansi);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
           |""".stripMargin
      } else {
        s"${ev.value} = graft.plans.Cents.centsOf($c, true).longValue();"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Cents =
    copy(child = newChild)

  override def prettyName: String = "graft_cents"
}

object Cents {

  /** The cast-chain semantics in one step: null (boxed) or, under
    * ANSI, an ArithmeticException on the same inputs the chain
    * rejects. (Named centsOf, not eval: the companion's static
    * forwarder — which Janino needs for the codegen call — is only
    * generated when the name doesn't clash with a class member, and
    * the case class inherits Expression.eval.)
    */
  def centsOf(x: Double, ansi: Boolean): java.lang.Long = {
    val bd =
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) null
      else {
        val b = java.math.BigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP)
        if (b.precision > 18) null else b
      }
    if (bd == null) {
      if (ansi) throw new ArithmeticException(
        s"graft_cents: $x cannot be represented as DECIMAL(18,2). " +
          "If necessary set \"spark.sql.ansi.enabled\" to \"false\" " +
          "to bypass this error, and return NULL instead.")
      null
    } else java.lang.Long.valueOf(bd.unscaledValue.longValue)
  }

  /** Column wrapper (eval mode from the active session conf). */
  def apply(c: Column): Column = GraftColumnBridge.column(
    Cents(GraftColumnBridge.expression(c),
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled))
}

/** Optimizer rule: rewrite the composed exact-cents idiom — both the
  * DataFrame spelling `dec2(x) * 100 cast long` and the oracle SQL
  * spelling `CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)` — into
  * the fused [[Cents]] kernel.
  *
  * Conservative by the RewriteArrayDot doctrine — fires only when
  * provably value-identical:
  *  - the inner cast is DOUBLE → DECIMAL(18,2);
  *  - the multiplier is a FOLDABLE expression equal to exactly 100
  *    (either operand order — decimal multiply is commutative), so
  *    scale-2 unscaled == cents;
  *  - the outer cast lands on BIGINT;
  *  - both casts carry the SAME eval mode, ANSI or LEGACY (TRY is
  *    left alone), and the kernel replays that mode's NaN/overflow
  *    behavior — raise vs null.
  */
object RewriteCents extends Rule[LogicalPlan] {

  private def isHundred(e: Expression): Boolean = e.foldable && (e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal == BigDecimal(100)
    case i: Int => i == 100
    case l: Long => l == 100L
    case s: Short => s == 100
    case b: Byte => b == 100
    case _ => false
  })

  private def dec2Child(e: Expression, mode: EvalMode.Value): Option[Expression] = e match {
    case Cast(c, d: DecimalType, _, m)
        if m == mode && d.precision == 18 && d.scale == 2 && c.dataType == DoubleType =>
      Some(c)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case orig @ Cast(Multiply(l, r, _), LongType, _, mode)
        if mode == EvalMode.ANSI || mode == EvalMode.LEGACY =>
      dec2Child(l, mode).filter(_ => isHundred(r))
        .orElse(dec2Child(r, mode).filter(_ => isHundred(l)))
        .map(Cents(_, ansi = mode == EvalMode.ANSI)).getOrElse(orig)
  }
}
