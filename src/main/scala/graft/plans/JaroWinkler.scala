package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity over two strings — the record-linkage /
  * fuzzy-field-matching scorer (Winkler '90, the Census Bureau
  * matcher; deva's dedup family covers token/edit similarity but not
  * the transposition-tolerant prefix-weighted form short fields —
  * names, titles — need). Spark has no native implementation; a
  * Scala UDF would box every row, so this is a codegen'd Catalyst
  * expression like [[ArrayDot]]: the kernel is one virtual call from
  * generated code (the [[DeflateSize]] addReferenceObj pattern),
  * JIT-compiled, allocation-bounded by the shorter input.
  *
  * Semantics are pinned BIT-FOR-BIT to DuckDB 1.0's
  * `jaro_winkler_similarity` (the gate oracle), fuzz-verified over
  * 3000 random pairs during development and re-provable any time via
  * tools/check.py on q185:
  *  - byte-wise over UTF-8 (both engines; ASCII corpus unaffected),
  *  - either side empty → 0.0 (including BOTH empty — DuckDB's
  *    convention, not the 1.0 some references use),
  *  - match window max(l1,l2)/2 − 1 (floor, min 0); greedy
  *    first-unused match; transpositions = half the order-mismatched
  *    matches,
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in EXACTLY that operation
  *    order (the fuzz found (a+b+c)/3 vs staged division drift),
  *  - Winkler boost only when jaro > 0.7: sim += p·0.1·(1−sim) with
  *    p = shared prefix length capped at 4.
  */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler needs two strings, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Public: invoked from whole-stage-generated code. */
  def kernel(l: UTF8String, r: UTF8String): Double =
    JaroWinklerSim.score(l.getBytes, r.getBytes)

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaroWinkler", this, classOf[JaroWinklerSim].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.kernel($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinklerSim {

  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinklerSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** The scorer over UTF-8 bytes — see the class doc for the exact
    * DuckDB-pinned semantics.
    */
  def score(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && b(j) == a(i)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    // operation order matters for cross-engine bit-equality — keep
    // the three-term sum then the single division by 3
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (p < pmax && a(p) == b(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    sim
  }
}
