package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic building blocks (SURVEY §4).
  *
  * Everything here has a bit-identical DuckDB rendering so query
  * results can be hash-compared across engines:
  *   - money/metric sums go through DECIMAL (exact, order-free)
  *   - hashing is md5-based 60-bit (both engines agree), never the
  *     engine-native `hash()` (Murmur3 vs DuckDB's is different)
  */
object Determinism {

  /** Exact 2-decimal view of a double column (money, metric values). */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal sum rendered back as a double — order-independent,
    * so identical under any Spark partitioning and in DuckDB.
    */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** avg via exact sum / count — Spark's avg(decimal) rounds to 6dp,
    * DuckDB's returns a full double; this form agrees everywhere.
    */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))

  /** Portable 60-bit hash of a string: first 15 hex digits of md5.
    * DuckDB rendering: ('0x' || substr(md5(x),1,15))::BIGINT
    * 60 bits keeps the value inside a signed int64 in both engines.
    *
    * Implemented as the native codegen expression
    * [[graft.plans.Hash60]] (bytes→long directly); the composed
    * `conv(substring(md5(c),1,15),16,10)` form is numerically
    * identical but pays hex-string materialization per row.
    */
  def hash60(c: Column): Column = graft.plans.Hash60(c)

  /** The composed-builtins form of [[hash60]] — kept for A/B
    * verification against the native expression.
    */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment for [[hash60]]. */
  def hash60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** Floor-quantize a double into DECIMAL(precision, scale) through
    * an exact int64 — the ONLY sanctioned double→DECIMAL edge for
    * hashed outputs (the q173 idiom, promoted to a helper after
    * round 10). A raw double→DECIMAL CAST's rounding (tie-break
    * mode, shortest-string vs exact-binary expansion) is engine- and
    * version-sensitive: five gate queries hash-diverged between two
    * DuckDB builds on exactly that cast class. This form has no
    * engine-dependent step — the scaling multiply and floor are IEEE
    * ops on a bit-identical double, the long→decimal conversion and
    * the decimal multiply by an exact 10^-scale literal are exact in
    * both engines. DuckDB rendering: [[decqSql]] (keep both in sync
    * — the oracle must replay the identical op sequence).
    */
  def decq(c: Column, scale: Int, precision: Int = 18): Column = {
    require(scale >= 1 && scale <= 18 && precision >= scale)
    // 10^scale ≤ 1e18 is exactly representable in a double
    val mult = BigDecimal(10).pow(scale)
    val inv = BigDecimal(java.math.BigInteger.ONE, scale) // exact 10^-scale
    (floor(c * lit(mult.toDouble)).cast("decimal(18,0)") * lit(inv))
      .cast(s"decimal($precision,$scale)")
  }

  /** Portable FLOOR division of int64 columns, b > 0 — the round-12
    * exact-rational idiom (Theil–Sen's slope keys and quantized
    * medians). Engines disagree on whether `div`/`//` truncates or
    * floors for negative dividends, and on `%`'s sign convention —
    * so neither is hashable raw. This form is convention-free:
    * pmod(a, b) = ((a % b) + b) % b lands in [0, b) under EITHER
    * remainder convention, (a − pmod(a, b)) is exactly divisible by
    * b, and an exact quotient is identical under trunc and floor.
    * DuckDB rendering: [[floorDivSql]] (keep in sync).
    */
  def floorDiv(a: Column, b: Column): Column = {
    val exactNum = a - pmod(a, b)
    org.apache.spark.sql.GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(exactNum),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
  }

  /** DuckDB SQL fragment computing the same VALUE as [[floorDiv]],
    * b > 0, |a| < 2⁶² — via the round-13 NON-NEGATIVE-OPERAND
    * decomposition. The r12 pmod identity was already convention-free
    * on paper, yet q193/q195 stayed driver-red for a third round while
    * every green floorDiv/`//` use in the gate divides NON-NEGATIVE
    * values — negative-dividend division was the gate's only
    * unexonerated integer-op class (r13 cross-tab of oracle constructs
    * vs CORRECTNESS_r12). This form never hands the engine a negative
    * operand: floor(a/b) for a<0 is −(−a)//b, minus one when b∤a —
    * every `//` and `%` sees non-negative ints, where trunc, floor and
    * Euclidean conventions all coincide (the op class with 44 green
    * gate exonerations). Value-identical to the r12 form under the
    * pinned replica (byte-level certified both SFs).
    */
  def floorDivSql(a: String, b: String): String =
    s"(CAST(CASE WHEN ($a) >= 0 THEN ($a) // ($b) " +
      s"ELSE -((-($a)) // ($b)) - (CASE WHEN (-($a)) % ($b) <> 0 THEN 1 ELSE 0 END) " +
      s"END AS BIGINT))"

  /** The round-12 pmod-identity rendering of floor division — kept
    * ONLY for the opt-in render canary's floor-div arm
    * ([[graft.tools.Probe.renderCanary]]), which emits oracle SQL
    * evaluating this rendering AND [[floorDivSql]] against
    * Math.floorDiv expectations, data-free, if a future driver
    * environment ever shows unexplained integer-class reds.
    */
  def floorDivPmodSql(a: String, b: String): String =
    s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"

  /** Executor-side Scala mirror of the dec2→cents cast chain
    * ([[graft.plans.Cents.centsOf]], ANSI mode): the ONE cents
    * derivation stream-twin state machines may use, so batch ≡
    * stream parity holds by construction rather than by data shape
    * (ADVICE r11: the floor(x·100 + 0.5) spelling disagrees with
    * dec2 on 3+-decimal inputs — 1.005 → 100 vs dec2's 101, because
    * dec2 rounds the double's SHORTEST decimal rendering HALF_UP
    * while the binary value sits just below the half; spec-pinned in
    * RewriteCentsSpec).
    */
  def centsOfDouble(x: Double): Long =
    graft.plans.Cents.centsOf(x, ansi = true).longValue

  /** DuckDB SQL fragment mirroring [[decq]] op for op. */
  def decqSql(e: String, scale: Int, precision: Int = 18): String = {
    require(scale >= 1 && scale <= 18 && precision >= scale)
    val mult = "1" + ("0" * scale) + ".0"
    val inv = "0." + ("0" * (scale - 1)) + "1"
    s"CAST(CAST(CAST(floor(($e) * $mult) AS BIGINT) AS DECIMAL(18,0)) * $inv AS DECIMAL($precision,$scale))"
  }
}
