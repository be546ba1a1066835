package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle expression.
  *
  * The HOF formulation (`transform(sequence(0, size-n), i ->
  * array_join(slice(toks, i+1, n), ' '))`) pays an interpreted lambda
  * dispatch plus an O(n) array copy per shingle — ~4.5 s for 260k
  * shingles at sf0.1. This expression emits the identical strings from a
  * single flat loop. CodegenFallback is acceptable here: the eval is one
  * virtual call per row doing primitive array work, and shingling feeds
  * an explode+aggregate (shuffle-bound), not a tight codegen pipeline.
  */
case class NGramShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextExprs {
  /** Word n-gram shingles of an array<string> token column. */
  def wordShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramShingles(ColumnBridge.expression(tokens), n))
}
