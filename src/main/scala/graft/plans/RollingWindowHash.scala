package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass polynomial rolling hash over a token array: the O(tokens)
  * production kernel for sliding-window exact-substring dedup
  * (q87_substring_dedup's scaladoc names it). The md5-of-joined-window
  * gate formulation re-touches every token W times (O(tokens·W) bytes
  * hashed — 50× amplification at W=50); this expression emits ONE
  * window hash per position from a single forward scan.
  *
  * Construction: two independent 31-bit polynomial lanes (Rabin-Karp
  * over per-token FNV-1a 64-bit hashes reduced into each lane),
  * rolled with precomputed B^(W-1) mod M, combined as h1·M2 + h2 —
  * a ~62-bit space, so every intermediate product of the rolling
  * update stays below 2^63 in plain long arithmetic (no mulmod
  * gymnastics, no overflow). Collision probability for P windows is
  * ~P²/2^63 — negligible below trillions of windows; the verify-stage
  * contract is the same as MinHash banding's (candidates, confirmed
  * by exact comparison when it matters).
  *
  * Semantics: returns one hash per window start (length
  * `max(0, n-W+1)`, empty array for short docs — mirroring q87's
  * window grid); a NULL token array yields NULL; NULL elements hash
  * as empty strings (the tokenizer never produces them — defensive,
  * not load-bearing).
  *
  * Equivalence with the md5 formulation's STRUCTURE (same per-doc
  * window counts, same cross-doc shared-window pairs on real corpus
  * data) and bit-stable kernel behavior are spec-asserted in
  * Hash60Spec; codegen emits a single static-shaped kernel call
  * inside whole-stage codegen (no HigherOrderFunction interpreter,
  * no per-element closures).
  */
case class RollingWindowHash(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"window length must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash needs array<string>, got ${other.catalogString}")
  }

  import RollingWindowHash._

  // B^(w-1) mod M per lane, precomputed once per plan
  @transient private lazy val bw1: Long = powMod(B1, w - 1, M1)
  @transient private lazy val bw2: Long = powMod(B2, w - 1, M2)

  /** The shared kernel — called by both the interpreted eval and the
    * generated code (one virtual call per ROW, loops stay in plain
    * long arithmetic; the r5 lesson was per-ELEMENT interpreter
    * dispatch, which this has none of).
    */
  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val nw = n - w + 1
    if (nw <= 0) return EMPTY
    val t1 = new Array[Long](n)
    val t2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val f = if (a.isNullAt(i)) EmptyFnv else fnv64(a.getUTF8String(i).getBytes)
      t1(i) = java.lang.Math.floorMod(f, M1)
      t2(i) = java.lang.Math.floorMod(f, M2)
      i += 1
    }
    val out = new Array[Long](nw)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < w) {
      h1 = (h1 * B1 + t1(i)) % M1
      h2 = (h2 * B2 + t2(i)) % M2
      i += 1
    }
    out(0) = h1 * M2 + h2
    var s = 1
    while (s < nw) {
      // roll: drop t(s-1)·B^(w-1), shift, add t(s+w-1) — every product
      // is (<2^31)·(<2^31) or (<2^32)·(<2^20): no overflow
      h1 = ((h1 + M1 - (t1(s - 1) * bw1) % M1) % M1 * B1 + t1(s + w - 1)) % M1
      h2 = ((h2 + M2 - (t2(s - 1) * bw2) % M2) % M2 * B2 + t2(s + w - 1)) % M2
      out(s) = h1 * M2 + h2
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rollingWindowHash", this, classOf[RollingWindowHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHash =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_hash"
}

object RollingWindowHash {

  // lane moduli: the two largest primes ≤ 2^31-1; lane bases: primes
  // just above 10^6 (coprime to both moduli)
  private final val M1 = 2147483647L
  private final val M2 = 2147483629L
  private final val B1 = 1000003L
  private final val B2 = 1000033L

  private val EMPTY = new GenericArrayData(Array.empty[Long])

  private final val EmptyFnv = 0xcbf29ce484222325L // FNV offset basis = fnv64 of zero bytes

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def powMod(b: Long, e: Int, m: Long): Long = {
    var r = 1L
    var base = b % m
    var exp = e
    while (exp > 0) {
      if ((exp & 1) == 1) r = r * base % m
      base = base * base % m
      exp >>= 1
    }
    r
  }

  /** Column wrapper: one 62-bit hash per `w`-token window. */
  def apply(tokens: Column, w: Int): Column =
    GraftColumnBridge.column(RollingWindowHash(GraftColumnBridge.expression(tokens), w))
}
