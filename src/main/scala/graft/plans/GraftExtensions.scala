package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Min}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Catalyst extension wiring (SparkSessionExtensions) — the (c)-tier
  * customization path from the build plan: a resolution-time rule that
  * auto-accelerates the declarative dot-product pattern.
  *
  * Users (and the DuckDB-oracle mirror queries) can write the idiomatic
  * higher-order-function form
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * and this rule rewrites it to the codegen'd [[DotProduct]] expression —
  * identical ascending-index fold, so results are bit-equal — removing
  * the interpreted-lambda overhead wherever the pattern appears (hand-
  * written notebooks, generated SQL, SURVEY-mapped queries).
  *
  * Register with:
  *   SparkSession.builder()
  *     .withExtensions(GraftExtensions.install) ...
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => AccelerateDotProduct)
    ext.injectOptimizerRule(_ => PushLocalTopK)
    ext.injectPlannerStrategy(_ => GraftStrategies)
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => {
          // a clean arity error instead of a raw IndexOutOfBounds from
          // children(1); input TYPES are enforced by the expression's
          // ExpectsInputTypes declaration
          if (children.size != 2) throw new IllegalArgumentException(
            s"graft_dot requires exactly 2 arguments, got ${children.size}")
          DotProduct(children(0), children(1))
        }))
  }

  /** Matches aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
    * over array<double> inputs and rewrites to DotProduct(a, b). */
  object AccelerateDotProduct extends Rule[LogicalPlan] {

    private def isDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

    /** The binary op's operands must be exactly the lambda's two DISTINCT
      * bound variables, in order — (x, y) -> x * x or (acc, v) ->
      * acc + acc must NOT match (they are not dot-product folds). */
    private def isArgPair(l: Expression, r: Expression,
        args: Seq[NamedExpression]): Boolean = (l, r, args) match {
      case (lv: NamedLambdaVariable, rv: NamedLambdaVariable,
          Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable)) =>
        lv.exprId == a1.exprId && rv.exprId == a2.exprId
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case agg @ ArrayAggregate(
            zip @ ZipWith(a, b,
              LambdaFunction(Multiply(x, y, _), zipArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc, v, _), foldArgs, _),
            finish)
          if a.resolved && b.resolved && isDoubleArray(a) &&
            isDoubleArray(b) && zip.resolved &&
            isArgPair(x, y, zipArgs) && isArgPair(acc, v, foldArgs) &&
            isIdentityFinish(finish) =>
          DotProduct(a, b)
      }

    /** The default merge-only aggregate has an identity finish lambda. */
    private def isIdentityFinish(finish: Expression): Boolean =
      finish match {
        case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) =>
          v.exprId == arg.asInstanceOf[NamedLambdaVariable].exprId
        case _ => false
      }
  }
}
