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

  /** The greedy matcher's EXACT INTEGER sufficient statistics:
    * (m, t, pfx) — matches, transpositions (already halved, the
    * kernel's `t /= 2`), and the common byte prefix capped at 4
    * (computed unconditionally; the boost decision consumes it only
    * when the jaro rational clears 0.7). Identical matching loop to
    * [[score]]; factored so the integer-exact scorer and the packed
    * diagnostic cannot drift from the double scorer's matching.
    */
  private[plans] def statsOf(a: Array[Byte], b: Array[Byte]): (Int, Int, Int) = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return (0, 0, 0)
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
    var t = 0
    if (m > 0) {
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
    }
    var p = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (p < pmax && a(p) == b(p)) p += 1
    (m, t, p)
  }

  /** floor(jw · 10⁴) in PURE int64 arithmetic — the round-12
    * determinism contract for hashed linkage scores. From the exact
    * stats (m, t, pfx) and byte lengths (l1, l2):
    *
    *   jaro = N/D with N = m²·(l1+l2) + (m−t)·l1·l2, D = 3·m·l1·l2
    *   boost iff 10·N ≥ 7·D  (exact rational jaro ≥ 0.7 — matches
    *     the builtin's observed behavior at the exact-0.7 edge, where
    *     its double sum rounds just above the 0.7 literal; for any
    *     other rational the double and exact comparisons agree, the
    *     nearest distinct rational being ≥ 1/(10·D) ≈ 1e-6 away)
    *   jw = ((10−p)·N + p·D) / (10·D)   with p = pfx if boosted else 0
    *   q4 = (10⁴·((10−p)·N + p·D)) / (10·D)   — integer division of
    *     non-negative int64s, where trunc ≡ floor in every engine.
    *
    * No double exists anywhere in the value OR the threshold path:
    * jw ≥ 0.88 ⟺ q4 ≥ 8800 exactly (8800 = 0.88·10⁴ is an integer).
    * Overflow envelope (ADVICE r12 corrected the earlier ~50k claim):
    * the worst numerator is 10⁵·N with N ≤ m²(l1+l2) + m·l1·l2 ≈
    * 3L³ at l1 = l2 = m = L, which crosses 2⁶³ near L ≈ 31k bytes —
    * enforced by a loud require rather than silent int64 wrap. The
    * linkage call sites feed ≤ 32 bytes.
    */
  def scoreQ4(a: Array[Byte], b: Array[Byte]): Long = {
    val l1 = a.length.toLong
    val l2 = b.length.toLong
    require(l1 <= 31000 && l2 <= 31000,
      s"scoreQ4 int64 arithmetic is exact only to ~31k-byte inputs; got ($l1, $l2)")
    if (l1 == 0 || l2 == 0) return 0L
    val (m0, t0, pfx) = statsOf(a, b)
    if (m0 == 0) return 0L
    val m = m0.toLong
    val t = t0.toLong
    val n = m * m * (l1 + l2) + (m - t) * l1 * l2
    val d = 3L * m * l1 * l2
    val p = if (10L * n >= 7L * d) pfx.toLong else 0L
    (10000L * ((10L - p) * n + p * d)) / (10L * d)
  }

  /** Diagnostic pack of the full stat vector into one long:
    * ((((l1·64 + l2)·64 + m)·64 + t)·8 + pfx). Requires byte lengths
    * ≤ 63 (the title-linkage fields are ≤ 32) — fails LOUDLY beyond,
    * matching the oracle's 32-step unrolled matcher bound.
    */
  def statsPacked(a: Array[Byte], b: Array[Byte]): Long = {
    val l1 = a.length
    val l2 = b.length
    require(l1 <= 63 && l2 <= 63,
      s"graft_jaro_winkler_pack: inputs must be ≤ 63 bytes (got $l1, $l2) — " +
        "the diagnostic pack and the oracle's unrolled matcher are 32/63-bounded")
    val (m, t, p) = statsOf(a, b)
    ((((l1.toLong * 64 + l2) * 64 + m) * 64 + t) * 8 + p)
  }

  /** The scorer over UTF-8 bytes — see the class doc for the exact
    * DuckDB-pinned semantics. Kept for interactive scoring; hashed
    * gate surfaces use [[scoreQ4]] (round-12 determinism contract).
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

/** [[JaroWinklerSim.scoreQ4]] as a codegen'd expression: the exact
  * integer floor(jw·10⁴) — the ONLY Jaro–Winkler form allowed on a
  * hashed gate surface (PortabilitySpec bans the double scorer and
  * the oracle builtin there). The matching loop is shared with
  * [[JaroWinklerSim]]; only the arithmetic after it differs — pure
  * int64, no rounding surface for any engine build to disagree on.
  */
case class JaroWinklerQ4(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler_q4 needs two strings, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Public: invoked from whole-stage-generated code. */
  def kernel(l: UTF8String, r: UTF8String): Long =
    JaroWinklerSim.scoreQ4(l.getBytes, r.getBytes)

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaroWinklerQ4", this, classOf[JaroWinklerQ4].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.kernel($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerQ4 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler_q4"
}

object JaroWinklerQ4 {
  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinklerQ4(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** [[JaroWinklerSim.statsPacked]] as an expression: one long packing
  * (l1, l2, m, t, pfx) of the matcher's full stat vector — built for
  * the r11 driver-divergence forensics (the q185d1 diagnostic,
  * deleted r15 once the file closed) and kept as the spec-pinned
  * exact-integer surface of the matcher kernel. Inputs are ≤ 63
  * bytes by contract (loud require in the kernel).
  */
case class JaroWinklerPack(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler_pack needs two strings, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Public: invoked from whole-stage-generated code. */
  def kernel(l: UTF8String, r: UTF8String): Long =
    JaroWinklerSim.statsPacked(l.getBytes, r.getBytes)

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaroWinklerPack", this, classOf[JaroWinklerPack].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.kernel($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerPack =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler_pack"
}

object JaroWinklerPack {
  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinklerPack(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
