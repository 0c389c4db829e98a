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
}
