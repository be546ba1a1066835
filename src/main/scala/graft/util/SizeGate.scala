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

  /** Shuffle/state-store partition count PROPORTIONAL to an input's
    * on-disk bytes: ceil(bytes / targetBytes) clamped to [1, cap] —
    * guide §2's "derive partitioning from input size rather than a
    * constant tuned for either local mode or the cluster". Callers pass
    * the session's configured shuffle partitions as `cap`, so this only
    * ever scales DOWN for small inputs (a stateful streaming stage over
    * a few MB otherwise opens `cap` state stores, each with its own
    * checkpoint/commit file I/O — measured 65 near-empty state tasks
    * carrying 76 s of executor time at sf0.1, OPTIMIZATION_r14.md);
    * at scale bytes/targetBytes exceeds any cap and the configured
    * parallelism wins unchanged. Sizing is Hadoop-FS metadata (same
    * resolution the read path uses — works on any store); FAIL-CLOSED:
    * an unreadable or unknown size returns `cap`, never a tiny count,
    * so a mis-measured input can never under-partition a real load. */
  def partitionsForBytes(s: org.apache.spark.sql.SparkSession,
      path: String, cap: Int, targetBytes: Long = 32L << 20): Int = {
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    if (bytes == Long.MaxValue) cap
    else math.max(1L, math.min(cap.toLong,
      (bytes + targetBytes - 1) / targetBytes)).toInt
  }
}
