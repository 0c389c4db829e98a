package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for graft's portable 60-bit hash
  * (SURVEY §4): numerically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex
  * digits of md5 as a long — but computed directly from the digest
  * bytes (big-endian first 8 bytes >>> 4), skipping the 32-char hex
  * string materialization, substring copy, and base-16 reparse that
  * the composed form pays per row.
  *
  * Codegen'd (participates in whole-stage codegen via a static call),
  * null-safe, and foldable-friendly. This is preference order (b)
  * from the build brief: a custom `Expression` where composition is
  * measurably hot — hashing dominates the dedup family's runtime.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash60 needs a string column, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash60"
}

object Hash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(s) as a non-negative long: the first
    * 8 digest bytes big-endian, logically shifted right 4 bits.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** Column wrapper. */
  def apply(c: Column): Column = GraftColumnBridge.column(Hash60(GraftColumnBridge.expression(c)))
}
