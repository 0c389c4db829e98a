package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native kernel for the journey/path-string idiom (SURVEY §2 rows
  * 56u/56bc — q132/q190 and their streaming twins):
  *
  *   transform(sort_array(collect_list(struct(k…, v))), x -> x.v)
  *
  * — "each group's v values in canonical (k…) order", the
  * sessionized-sequence primitive under path mining and CEP journey
  * strings. The composed form runs BOTH steps on the interpreter:
  * SortArray is CodegenFallback (per-element interpreted struct
  * comparisons) and ArrayTransform is a HigherOrderFunction (per
  * element a closure dispatch + an interpreted GetStructField), with
  * two array materializations. This kernel is ONE virtual call from
  * whole-stage-generated code (the [[DeflateSize]] addReferenceObj
  * pattern): sort once with the struct type's interpreted ordering,
  * project the target field into the single output allocation.
  *
  * Value-identical to the composed form by construction: the same
  * ascending natural struct ordering SortArray uses (nulls-first for
  * elements — unreachable, [[RewriteSortedTrail]] only fires when the
  * list elements are provably non-null), the same tie behavior (ties
  * can only come from fully-equal structs, whose projected field is
  * equal too), the same null semantics for the projected field.
  */
case class SortedTrail(child: Expression, fieldIdx: Int) extends UnaryExpression {

  private def elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = {
    val f = elemType.fields(fieldIdx)
    ArrayType(f.dataType, f.nullable)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if fieldIdx >= 0 && fieldIdx < s.fields.length =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_trail needs array<struct> and a valid field ordinal, " +
        s"got ${other.catalogString} / $fieldIdx")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType).asInstanceOf[Ordering[Any]]
  @transient private lazy val fieldType: DataType = elemType.fields(fieldIdx).dataType

  /** Public: invoked from whole-stage-generated code. */
  def kernel(arr: ArrayData): ArrayData = {
    val els = arr.toObjectArray(elemType)
    // nulls-first ascending — SortArray's asc semantics (elements are
    // non-null in every rewrite site; kept for direct kernel users)
    java.util.Arrays.sort(els, (a: AnyRef, b: AnyRef) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ordering.compare(a, b))
    val out = new Array[Any](els.length)
    var i = 0
    while (i < els.length) {
      val r = els(i).asInstanceOf[InternalRow]
      out(i) = if (r == null || r.isNullAt(fieldIdx)) null else r.get(fieldIdx, fieldType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedTrail", this, classOf[SortedTrail].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedTrail =
    copy(child = newChild)

  override def prettyName: String = "graft_sorted_trail"
}

/** Optimizer rule (fifth of the injected family): fuse the composed
  * journey/path idiom into the codegen'd [[SortedTrail]] kernel.
  *
  * Conservative by the RewriteArrayDot doctrine — fires only when
  * provably value-identical:
  *  - the transformed array is `sort_array(collect_list(e), asc)`
  *    where e is NON-NULLABLE (the struct() constructor — so the
  *    sort's null-element placement can never matter, which also
  *    makes the asc `array_sort` spelling equivalent);
  *  - the lambda is a bare field projection `x -> x.field` of the
  *    sorted element (any ordinal: the sort key is the WHOLE struct,
  *    so ties are full-struct-equal and projection-invariant).
  */
object RewriteSortedTrail extends Rule[LogicalPlan] {

  private def nonNullCollect(e: Expression): Boolean = e match {
    case ae: AggregateExpression => ae.aggregateFunction match {
      case cl: CollectList => !cl.child.nullable
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayTransform(SortArray(inner, Literal(true, BooleanType)),
          LambdaFunction(GetStructField(v: NamedLambdaVariable, idx, _),
            Seq(v2: NamedLambdaVariable), _))
        if v.exprId == v2.exprId && nonNullCollect(inner) =>
      SortedTrail(inner, idx)
  }
}
