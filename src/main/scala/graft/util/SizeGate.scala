package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint — the middle ground the broadcast audit
  * (SCALE.md) prescribes for dimension sides that are small at every
  * measured scale but grow with the fact tables in the limit.
  *
  * An unconditional `broadcast()` on such a side is the per-executor
  * OOM class rounds 10-12 removed (j1/j4, blocks dim, rare-gram list);
  * an unconditional de-hint makes the planner shuffle the probe side
  * wherever the dim exceeds the (deliberately conservative) 10 MB
  * `autoBroadcastJoinThreshold` — measured at sf100: the flows mart's
  * fact shuffle and the jaccard index exchange cost 2-5× end-to-end on
  * dims of a few hundred MB that every real cluster would broadcast.
  * The gate hints only while the dim's size is bounded by a constant
  * the caller picks for its executors, and degrades to the scale-safe
  * shuffled join past it.
  */
object SizeGate {

  /** Default per-executor bound for a gated broadcast: comfortably
    * inside a 2-3 GiB/task-budgeted executor, far above the 10 MB
    * planner default. */
  val DEFAULT_MAX_BYTES: Long = 256L << 20

  /** `broadcast(df)` iff Catalyst's pre-execution size estimate for
    * `df` is at most `maxBytes`; `df` unhinted otherwise (missing or
    * unknown stats count as big — the safe side is the shuffled join).
    *
    * The estimate is the optimized logical plan's `sizeInBytes` — the
    * same statistic the planner's own broadcast decision reads, driver
    * side, no job. Caveat: for aggregate outputs Catalyst propagates
    * the CHILD's size (conservatively huge), so this gate only ever
    * un-hints those — gate aggregate-shaped dims on an external proxy
    * instead (e.g. TextOps gates its gram lists on the corpus's
    * on-disk bytes). */
  def broadcastIfSmall(df: DataFrame,
      maxBytes: Long = DEFAULT_MAX_BYTES): DataFrame = {
    val est =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(Long.MaxValue) }
    if (est <= maxBytes) broadcast(df) else df
  }
}
