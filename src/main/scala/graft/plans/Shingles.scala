package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling — the kernel under every shingle
  * consumer in the text stack (full-text q36, jaccard verify q47,
  * decontamination q75, diversity q66, source overlap q95, exact
  * similarity join q127, session paths q132/q202).
  *
  * The composed form [[graft.operators.TextAnalysis.shingles]] —
  * `when(size(tk) >= n, transform(sequence(1, size(tk)-n+1),
  * i -> concat_ws(' ', tk[i], …, tk[i+n-1])))` — has the right
  * semantics but runs its lambda on the HigherOrderFunction
  * interpreter path (CodegenFallback): per SHINGLE it dispatches a
  * closure, rebinds an index box, and evaluates n interpreted
  * ElementAt + one interpreted ConcatWs (the same interpreter tax
  * [[ArrayDot]] and TextAnalysis.adjacentPairs document; the
  * adjacent-pair case measured 7× on the sf0.1 bigram build). This
  * expression reads the token array once and emits all m = len-n+1
  * joined shingles in one tight loop inside whole-stage codegen.
  *
  * Value-identical to the composed form by construction:
  *  - null or short (< n tokens) input → EMPTY array (the `when`
  *    guard's otherwise branch — note NOT null, which is why this
  *    expression is non-nullable);
  *  - null tokens inside a window are SKIPPED by the join, exactly
  *    concat_ws's contract (["a", null, "c"] at n=3 → "a c");
  *  - output order is the composed sequence order (window start
  *    ascending). RewriteShinglesSpec pins all three edges against a
  *    rule-excluded session.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  /** The composed form yields [] for null input, never null. */
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Shingles.empty() else Shingles.run(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val result =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.plans.Shingles.empty() : graft.plans.Shingles.run(${c.value}, $n);
      """
    ev.copy(code = result, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object Shingles {

  private val SPACE = UTF8String.fromString(" ")

  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Static entry for generated code (Janino calls the object's
    * static forwarder on the companion class — the Cents.centsOf
    * precedent).
    */
  def empty(): ArrayData = EMPTY

  /** All m = len-n+1 space-joined windows of `a`, concat_ws null
    * semantics (null tokens skipped). Called per row from both the
    * interpreted and the generated path.
    */
  def run(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    if (len < n) return EMPTY
    val toks = new Array[UTF8String](len)
    var j = 0
    while (j < len) {
      toks(j) = if (a.isNullAt(j)) null else a.getUTF8String(j)
      j += 1
    }
    val m = len - n + 1
    val out = new Array[Any](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(tk: Column, n: Int): Column =
    GraftColumnBridge.column(Shingles(GraftColumnBridge.expression(tk), n))
}
