package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** LocalTopK — a custom operator for the `row_number() <= k` pattern
  * (SURVEY.md §7 / builder north star: the (c)-tier customization —
  * LogicalPlan + Rule + Strategy + SparkPlan via SparkSessionExtensions).
  *
  * The stock plan for top-k-per-key
  *
  *   Filter(rn <= k) ← Window(row_number over partition p order o) ←
  *   Exchange(hash p) ← full child
  *
  * shuffles EVERY row and sorts every key group, even though at most k
  * rows per key survive. LocalTopK is inserted *below* the exchange: each
  * map partition keeps only its own per-key top-k (bounded heaps — no
  * sort, O(n log k)), so the shuffle carries ≤ k·numPartitions rows per
  * key instead of all of them. The untouched Window + Filter above then
  * compute exact row numbers on the reduced input — results are
  * bit-identical because every globally-top-k row is necessarily in its
  * map partition's local top-k.
  *
  * At 100 TB this is the difference between shuffling the corpus and
  * shuffling k rows per key per task — the same idea as partial
  * aggregation, applied to ranking.
  */
case class LocalTopK(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class LocalTopKExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    /** Bound on rows retained per map partition: beyond it, rows for NEW
      * keys stream through unreduced — correctness is unaffected (the
      * downstream Window recomputes exact ranks on whatever reaches it);
      * the reduction just degrades gracefully instead of growing an
      * unbounded in-memory map at high key cardinality. Parameterized so
      * tests can exercise the overflow path. */
    maxRetainedRows: Int = 1 << 20) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partSpec = partitionSpec
    val ordSpec = orderSpec
    val limit = k
    val maxKeys = math.max(1, maxRetainedRows / math.max(1, limit))
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partSpec, childOutput)
      val ordering = GenerateOrdering.generate(ordSpec, childOutput)
      // max-heap by the window ordering: head = current worst of the kept
      // top-k, evicted when a better row arrives.
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      val reduced = iter.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            None
          case None if heaps.size < maxKeys =>
            val heap = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ordering)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap) // copy only on first sight
            None
          case None =>
            Some(row) // cardinality overflow: pass through unreduced
        }
      }
      // heaps flush only after the input is exhausted (lazy ++)
      reduced ++ Iterator.single(()).flatMap(_ =>
        heaps.valuesIterator.flatMap(_.iterator))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Optimizer rule: insert LocalTopK under Filter(rn ≤ k) ∘ Window(rn). */
object PushLocalTopK extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}

  /** Max k we pre-reduce for — beyond this the heaps stop paying off. */
  private val MaxK = 10000

  private def rowNumberAlias(exprs: Seq[NamedExpression]): Option[Alias] =
    exprs match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a)
      case _ => None
    }

  /** Extract `rn <= k` / `rn < k` / `rn = k` bounds from conjuncts. */
  private def boundFor(cond: Expression, rn: ExprId): Option[Int] = {
    val conjuncts = splitConjuncts(cond)
    conjuncts.flatMap {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rn => Some(v)
      case LessThan(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rn => Some(v - 1)
      case EqualTo(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rn => Some(v)
      case _ => None
    }.reduceOption(math.min)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(exprs, partSpec, ordSpec, child, _))
      if ordSpec.nonEmpty && !child.isInstanceOf[LocalTopK] =>
      rowNumberAlias(exprs) match {
        case Some(alias) =>
          boundFor(cond, alias.exprId) match {
            case Some(k) if k > 0 && k <= MaxK =>
              f.copy(child = w.copy(child =
                LocalTopK(partSpec, ordSpec, k, child)))
            case _ => f
          }
        case None => f
      }
  }
}

/** Planner strategy for the custom logical node. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopK(partSpec, ordSpec, k, child) =>
      LocalTopKExec(partSpec, ordSpec, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
