package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE'd byte count of a string — the compression-ratio
  * repetition/quality signal the Gopher and RefinedWeb curation
  * pipelines use: natural prose compresses to a fairly stable band,
  * boilerplate/template spam compresses far below it, and
  * high-entropy gibberish barely compresses at all. The consumer
  * divides by `octet_length` for the ratio; emitting the raw
  * compressed size keeps this expression's output integer (exact
  * cross-engine semantics for everything downstream of it).
  *
  * Deva-side analogue: quality heuristics live in the curation
  * layer (`deva/core/pipe.py` length/ratio filters); this is the
  * information-theoretic member of that family, implementable only
  * engine-side (no SQL engine exposes deflate), hence spec-verified
  * rather than oracle-gated — same contract as the Multimodal codecs.
  *
  * Determinism: DEFLATE output bytes depend on zlib version and
  * level, but this expression never crosses engines — it feeds
  * thresholds/ratios inside one Spark job, where the JDK's zlib is
  * fixed. Level 6 (zlib default) pinned explicitly so a JDK default
  * change can't move scores between releases.
  *
  * Execution: one Deflater per partition would be ideal, but
  * expressions have no open/close lifecycle; a thread-local Deflater
  * is reset per value instead (allocation-free steady state, safe
  * under codegen's single-threaded per-task evaluation). Null in →
  * null out; empty string → the ~8-byte DEFLATE header, not 0 —
  * callers computing ratios must guard the zero-length denominator.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_deflate_size needs string, got ${other.catalogString}")
    }

  def kernel(s: UTF8String): Long = DeflateSize.compressedSize(s.getBytes)

  override def nullSafeEval(input: Any): Any = kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deflateSize", this, classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.kernel($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)

  override def prettyName: String = "graft_deflate_size"
}

object DeflateSize {

  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  private[plans] def compressedSize(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }

  /** Column wrapper: DEFLATE'd byte count (level 6) of the string. */
  def apply(text: Column): Column =
    GraftColumnBridge.column(DeflateSize(GraftColumnBridge.expression(text)))
}
