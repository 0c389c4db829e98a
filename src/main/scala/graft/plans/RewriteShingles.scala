package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (fourth of the injected family): rewrite the
  * NATURAL word-shingling formulation
  *
  *   CASE WHEN size(tk) >= n
  *        THEN transform(sequence(1, size(tk) - (n-1)),
  *               i -> concat_ws(' ', tk[i], tk[i+1], …, tk[i+n-1]))
  *        ELSE CAST(array() AS array<string>) END
  *
  * into the codegen'd [[Shingles]] kernel. The composed form is what
  * [[graft.operators.TextAnalysis.shingles]] emits and what a Spark
  * user writes first; it runs the lambda on the HigherOrderFunction
  * interpreter path — per shingle a closure dispatch, n interpreted
  * ElementAt lookups and an interpreted ConcatWs (Shingles'
  * scaladoc). With this rule injected through [[GraftExtensions]],
  * every shingle consumer in the library silently gets the fused
  * kernel — the RewriteArrayDot doctrine (the library's own
  * expressions are an optimization target, not an API the user must
  * know to call) applied to the text stack's hottest primitive.
  *
  * Deliberately conservative — fires only when provably
  * value-identical:
  *  - the guarded array is ARRAY<STRING> and all references to it
  *    (size guard, sequence bound, every window lookup) are
  *    semantically the same expression;
  *  - the window offsets are exactly i+0 … i+(n-1) in order, the
  *    separator is the literal one-space string, and the branch
  *    guard/bound agree on the same n ≥ 2;
  *  - the else branch is the empty string array (either the
  *    pre-folding Cast(array()) spelling or the Literal it constant-
  *    folds to — the rule shares the operator-optimization fixed
  *    point with ConstantFolding, so both shapes occur).
  */
object RewriteShingles extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** i, or i + literal-int offset (the Column DSL spells o=0 as i+0). */
  private def plusConst(e: Expression, i: NamedLambdaVariable): Option[Int] = e match {
    case v: NamedLambdaVariable if v.exprId == i.exprId => Some(0)
    case Add(v: NamedLambdaVariable, Literal(o: Int, IntegerType), _)
        if v.exprId == i.exprId => Some(o)
    case _ => None
  }

  private def isEmptyStringArray(e: Expression): Boolean = e match {
    case Cast(CreateArray(Seq(), _), ArrayType(StringType, _), _, _) => true
    case Literal(a: ArrayData, ArrayType(StringType, _)) =>
      a != null && a.numElements() == 0
    case _ => false
  }

  private val space = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CaseWhen(
          Seq((GreaterThanOrEqual(Size(tk, _), Literal(n: Int, IntegerType)),
            ArrayTransform(
              Sequence(Literal(1, IntegerType),
                Subtract(Size(tk2, _), Literal(nm1: Int, IntegerType), _), None, _),
              LambdaFunction(ConcatWs(sep +: elems),
                Seq(i: NamedLambdaVariable), _)))),
          Some(els))
        if n >= 2 && nm1 == n - 1 && isStringArray(tk) &&
          tk.semanticEquals(tk2) && isEmptyStringArray(els) &&
          (sep match {
            case Literal(s: UTF8String, StringType) => s == space
            case _ => false
          }) &&
          elems.length == n &&
          elems.zipWithIndex.forall {
            case (ElementAt(t, idx, None, _), o) =>
              t.semanticEquals(tk) && plusConst(idx, i).contains(o)
            case _ => false
          } =>
      Shingles(tk, n)
  }
}
