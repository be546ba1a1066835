package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe for a pre-built Bloom filter — the pruning
  * half of [[graft.ops.BloomOps.bloomPrunedJoin]].
  *
  * A Scala UDF here would box every key and fall out of whole-stage
  * codegen on the hottest path in the whole operator (the full fact
  * scan); this expression probes the filter inside generated code via
  * an object reference, so the scan→filter stage stays one codegen
  * span. The filter itself is carried SERIALIZED in the expression
  * (`filterBytes`) and deserialized lazily once per JVM — i.e. it
  * rides the task-binary broadcast exactly once per stage, the same
  * distribution cost class as a broadcast join of the key set but
  * with O(1) probes and fixed memory at any key cardinality.
  */
case class BloomMightContainLong(child: Expression,
    filterBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {

  // int/short keys widen to long at analysis (same rationale as
  // DotProduct's ImplicitCastInputTypes note)
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BloomExprs {
  /** Column API: does the (long-typed) key possibly belong to `bf`?
    * Never a false negative; false positives at the filter's fpp. */
  def mightContainLong(key: Column, bf: BloomFilter): Column = {
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(key), bytes.toByteArray))
  }
}
