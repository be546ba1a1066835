package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the hot vector-math path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`)
  * allocates a lambda frame per element and blocks whole-stage codegen;
  * over an all-pairs near-dup join that is millions of 64-element folds.
  * This expression evaluates the identical ascending-index left-fold —
  * bit-for-bit the same double result as the HOF form and DuckDB's
  * `list_dot_product` — inside generated code, keeping oracle parity
  * while staying in WholeStageCodegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // The internal callers cast first (VectorOps.dot), but the SQL
  // surface (graft_dot via GraftExtensions) has no such guard: without
  // declared input types an int-array argument would pass analysis and
  // then reinterpret the wrong bytes at runtime. ImplicitCastInputTypes
  // (not bare ExpectsInputTypes, which only REJECTS mismatches) is what
  // makes analysis insert a widening cast, so graft_dot(array<int>, …)
  // works on the SQL surface and never reinterprets bytes.
  // (return type inferred: AbstractDataType itself is private[spark])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  /** Semantics mirror the HOF fold exactly, including the degenerate
    * cases: unequal lengths or a null element yield NULL (zip_with pads
    * with nulls and a null poisons the fold) — required for the
    * AccelerateDotProduct rewrite to be semantics-preserving. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) {
              ${ev.isNull} = true;
              break;
            }
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExprs {
  /** Column API for [[DotProduct]]; inputs must be array<double>. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
