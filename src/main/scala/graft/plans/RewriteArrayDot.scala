package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the NATURAL dot-product formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[ArrayDot]] kernel. The composed form is what
  * a Spark user writes first — it is also the engine's r4 bench
  * regression: higher-order functions run on the CodegenFallback
  * interpreter path, allocating the zipped product array and
  * dispatching two closures per element (ArrayDot's scaladoc;
  * measured 5× on q68's scoring loop). With this rule injected
  * through [[GraftExtensions]], the natural formulation silently
  * gets the fused-loop kernel — the library's own expressions become
  * an OPTIMIZATION TARGET, not just an API the user must know to
  * call (the brief's Rule/Extensions preference (c), applied where
  * it pays: the hot ANN scoring path).
  *
  * Deliberately conservative — the rewrite fires only when it is
  * provably value-identical to the interpreted form:
  *  - both inputs are ARRAY<DOUBLE> (float arrays would analyze with
  *    casts inside the lambdas and the shapes below don't match —
  *    correct, since ArrayDot's own widening order could differ);
  *  - the zip lambda is exactly x*y and the fold exactly acc+v (in
  *    either operand order — both are IEEE-commutative), seeded at
  *    literal 0.0 with the identity finish — precisely the
  *    left-to-right fold ArrayDot evaluates;
  *  - null semantics already agree (null array / length mismatch /
  *    null element → null in both, RewriteArrayDotSpec pins it).
  */
object RewriteArrayDot extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ax, av, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(f: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
          ((isVar(ax, acc) && isVar(av, v)) || (isVar(ax, v) && isVar(av, acc))) &&
          isVar(fin, f) =>
      ArrayDot(a, b)
  }
}

/** Companion rule: the composed-builtins 60-bit hash idiom
  *
  *   CAST(conv(substring(md5(c), 1, 15), 16, 10) AS BIGINT)
  *
  * rewrites to the codegen'd [[Hash60]] — numerically identical by
  * construction (Hash60's scaladoc; `Determinism.hash60Composed` is
  * kept precisely for this A/B), but the composed form materializes
  * the 32-char hex string and re-parses 15 chars of it per row where
  * Hash60 reads the digest bytes directly. A user porting DuckDB SQL
  * (where this exact idiom is the oracle-side spelling) gets the
  * native kernel without knowing it exists.
  */
object RewriteHash60 extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

  // the analyzer wraps md5's string input in an implicit cast-to-
  // binary; accept the post-analysis shape (and a bare string child,
  // unreachable after analysis but harmless)
  private def strChild(e: Expression): Option[Expression] = e match {
    case Cast(c, BinaryType, _, _) if c.dataType == StringType => Some(c)
    case c if c.dataType == StringType => Some(c)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case orig @ Cast(
          Conv(Substring(Md5(mc), Literal(1, IntegerType), Literal(15, IntegerType)),
            Literal(16, IntegerType), Literal(10, IntegerType), _),
          LongType, _, _) =>
      strChild(mc).map(Hash60(_)).getOrElse(orig)
  }
}
