package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Map-only IVF cell assignment: for one embedding, the index of the
  * nearest centroid by cosine, tie-broken to the LOWEST index —
  * computed in a single fused loop over a driver-held centroid
  * matrix embedded in the plan as a reference object.
  *
  * This is the 100 TB shape for fixed-k assignment: the join
  * formulation (crossJoin(broadcast(centroids)) → max_by/window)
  * materializes n×k scored rows and, because a struct ordering
  * forces SortAggregate, sorts them; this expression touches each
  * vector once, emits one value, and shuffles nothing. k×dim flops
  * per row is the same arithmetic either way — the rows, sort, and
  * exchange are what disappear.
  *
  * Cosine per cell = dot(e, c_i) / (|e| · |c_i|) with dot and |·|
  * computed as the same sequential left folds as [[ArrayDot]] /
  * Similarity.norm, so assignments are bit-identical to the join
  * formulation (ties only occur for bit-equal cosines, and both
  * shapes break them toward the lowest cell).
  */
case class ArgmaxCosine(child: Expression, cents: Array[Array[Double]],
    cnorms: Array[Double]) extends UnaryExpression {

  require(cents.nonEmpty && cents.length == cnorms.length,
    s"need matching centroids (${cents.length}) and norms (${cnorms.length})")
  require(cents.forall(_.length == cents(0).length),
    s"centroids must share one dimensionality, got ${cents.map(_.length).distinct.mkString(",")}")

  private val centDim = cents(0).length

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_cosine needs array<float|double>, got ${other.catalogString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val d = a.numElements()
    // a wrong-width vector cannot be scored against ANY centroid —
    // the join formulation would quietly assign it via null-cosine
    // struct ordering; this shape fails loudly (like zero-norm below)
    if (d != centDim) throw new IllegalArgumentException(
      s"graft_argmax_cosine: embedding has $d elements, centroids have $centDim")
    var nrm = 0.0
    var i = 0
    while (i < d) {
      // a null ELEMENT makes the cosine undefined → NULL result (SQL
      // null propagation, same as ArrayDot); VectorIndex.assign
      // refuses to persist the resulting null cell
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      nrm += x * x
      i += 1
    }
    val en = math.sqrt(nrm)
    // the join formulation throws DIVIDE_BY_ZERO here under ANSI mode
    // (Spark 4 default) — an unassignable vector must fail loudly in
    // this shape too, not silently land in cell 0
    if (en == 0.0) throw new IllegalArgumentException(
      "graft_argmax_cosine: zero-norm embedding cannot be assigned")
    var best = -1
    var bestCos = 0.0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0
      var j = 0
      while (j < d) {
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        dot += x * cent(j)
        j += 1
      }
      var cos = dot / (en * cnorms(c))
      // SQL double semantics (what the join+max_by shape applies):
      // NaN compares GREATER than every double and EQUAL to NaN,
      // -0.0 equals 0.0. Double.compare gets the NaN rules right but
      // orders -0.0 < 0.0, so normalize zeros first.
      if (cos == 0.0d) cos = 0.0d
      if (best < 0 || java.lang.Double.compare(cos, bestCos) > 0) {
        bestCos = cos; best = c
      }
      c += 1
    }
    best.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val nrm = ctx.freshName("nrm")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      val cent = ctx.freshName("cent")
      s"""
         |int $d = $a.numElements();
         |if ($d != $centDim) throw new IllegalArgumentException(
         |  "graft_argmax_cosine: embedding has " + $d + " elements, centroids have $centDim");
         |double $nrm = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = (double) $a.$get($i);
         |  $nrm += $x * $x;
         |}
         |if (!${ev.isNull}) {
         |  $nrm = java.lang.Math.sqrt($nrm);
         |  if ($nrm == 0.0d) throw new IllegalArgumentException(
         |    "graft_argmax_cosine: zero-norm embedding cannot be assigned");
         |  int $best = -1;
         |  double $bestCos = 0.0;
         |  for (int $c = 0; $c < $centsRef.length; $c++) {
         |    double[] $cent = $centsRef[$c];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      $dot += ((double) $a.$get($j)) * $cent[$j];
         |    }
         |    double $cos = $dot / ($nrm * $normsRef[$c]);
         |    // SQL double semantics: NaN > everything, NaN == NaN,
         |    // -0.0 == 0.0 (normalize zeros, then Double.compare)
         |    if ($cos == 0.0d) $cos = 0.0d;
         |    if ($best < 0 || java.lang.Double.compare($cos, $bestCos) > 0) {
         |      $bestCos = $cos; $best = $c;
         |    }
         |  }
         |  ${ev.value} = (long) $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxCosine =
    copy(child = newChild)

  override def prettyName: String = "graft_argmax_cosine"
}

object ArgmaxCosine {

  /** Column wrapper: `cents(i)` is the centroid for cell i; norms are
    * computed here with the same sequential fold Similarity.norm uses.
    */
  def apply(emb: Column, cents: Array[Array[Double]]): Column = {
    val norms = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    // a zero (or NaN — e.g. averaged from NaN embeddings) centroid
    // would poison every comparison with NaN cosines (and the join
    // shape would throw under ANSI) — reject at build time, naming
    // every offending cell
    val bad = norms.zipWithIndex.filter { case (n, _) => !(n > 0.0) }
    require(bad.isEmpty,
      s"non-positive/NaN-norm centroid(s) at cells ${bad.map(_._2).mkString(",")}")
    GraftColumnBridge.column(
      ArgmaxCosine(GraftColumnBridge.expression(emb), cents, norms))
  }
}
