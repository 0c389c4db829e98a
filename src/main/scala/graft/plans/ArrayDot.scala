package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays — the hot kernel of the
  * ANN family (q50/q51/q78 evaluate it n×k times).
  *
  * The composed form `aggregate(zip_with(a, b, *), 0.0, +)` has the
  * right semantics but runs on the HigherOrderFunction interpreter
  * path (CodegenFallback): per row it allocates the zipped product
  * array and dispatches two closures per element. This expression
  * emits a tight fused loop inside whole-stage codegen — no
  * intermediate array, no boxing — while computing the SAME value
  * bit-for-bit: elements widened to double, then a sequential
  * left fold seeded at 0.0 in array order (the order the DuckDB
  * oracle's `list_reduce` reproduces; see Similarity.dotSql).
  *
  * Null semantics also match the composed form: null array, length
  * mismatch (zip_with pads with null), or any null element → null.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private val supported: Set[DataType] =
    Set(FloatType, DoubleType, LongType, IntegerType, ShortType)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(et, _) => supported.contains(et)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_array_dot needs two numeric arrays, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val leftGet: (ArrayData, Int) => Double = getter(elemType(left))
  @transient private lazy val rightGet: (ArrayData, Int) => Double = getter(elemType(right))

  private def getter(et: DataType): (ArrayData, Int) => Double = et match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case LongType => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += leftGet(a, i) * rightGet(b, i)
      i += 1
    }
    acc
  }

  private def genGet(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (${genGet(elemType(left), l, i)}) * (${genGet(elemType(right), r, i)});
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_array_dot"
}

object ArrayDot {

  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
