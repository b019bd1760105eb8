package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.CosineSim

/** Optimizer rule: rewrite the declarative cosine pattern
  *
  *   aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)
  *     / sqrt(dot(a,a) * dot(b,b))
  *
  * into the fused native [[CosineSim]] expression — one codegen'd
  * loop, three accumulators, no intermediate arrays (the declarative
  * form materializes a zipped array per pair and evaluates two lambda
  * calls per element).
  *
  * This is the (c) rung of SURVEY.md §4.2's extension ladder
  * (`Rule[LogicalPlan]` via `SparkSessionExtensions`): users write the
  * portable declarative form; sessions built with [[graft.functions.GraftExtensions]]
  * get the fused plan with NO source change. The arithmetic is the
  * same left-to-right fold, so the rewrite is result-identical
  * (ExtensionsSpec asserts plan shape AND bit-equality against an
  * un-extended session).
  *
  * Matching is deliberately conservative: the exact shape
  * `Similarity.dot` produces — zero literal 0.0, merge lambda
  * `acc + x`, product lambda `x * y`, identity finish — anything else
  * is left untouched. A miss costs nothing (the declarative form
  * still runs); a false positive would corrupt results, so every
  * structural element is checked.
  */
object FuseCosine extends Rule[LogicalPlan] {

  /** Matches the declarative dot product and returns its two array
    * arguments. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable,
                y: NamedLambdaVariable, _), zargs, _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable,
              el: NamedLambdaVariable, _), margs, _),
            LambdaFunction(fin: NamedLambdaVariable, fargs, _))
          if zero == 0.0 &&
            zargs.map(_.exprId) == Seq(x.exprId, y.exprId) &&
            margs.map(_.exprId) == Seq(acc.exprId, el.exprId) &&
            fargs.map(_.exprId) == Seq(fin.exprId) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // evalMode guard: CosineSim yields NULL on a zero norm, which
      // matches LEGACY and TRY division semantics. An ANSI-mode divide
      // would THROW there instead, so rewriting it would silently
      // swallow the user's error — leave it untouched.
      // (Spark 4.1 wraps the mode in NumericEvalContext — compare the
      // enum inside it, not the wrapper, or the guard never fires.)
      case Divide(Dot(a, b), Sqrt(Multiply(Dot(a2, a3), Dot(b2, b3), _)), ctx)
          if ctx.evalMode != EvalMode.ANSI &&
            a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) =>
        CosineSim(a, b)
    }
}
