package graft.trace

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The flagship recursive fund trace (reference: app.py:339-383 —
  * `WITH RECURSIVE trace_path` over fct_transaction_traces, hop cap ≤ 3,
  * per-hop date window, LIMIT 1000, OOM fallback to 1 hop).
  *
  * The anchor selects edges leaving `sourceAddress` inside the window;
  * each step joins the frontier's destination to the edges' source with
  * the same window predicate (app.py:353-365), accumulating with UNION
  * ALL semantics (path multiplicity preserved). `localCheckpoint` per hop
  * cuts the growing lineage, which is what actually prevents the
  * reference's OOM class of failure in Spark.
  *
  * Scale: edges pre-filtered by the time window (partition pruning when
  * traces are date-partitioned); the frontier is the small shrinking side
  * of each hop join. With edges bucketed by source_address the per-hop
  * join is co-partitioned.
  */
object Trace {

  final case class TraceParams(
      sourceAddress: String,
      maxHops: Int,
      startTime: Timestamp,
      endTime: Timestamp,
      limit: Int = 1000)

  /** Multi-hop trace over trace edges (columns of
    * fct_transaction_traces). Output: hop, source_address,
    * destination_address, transaction_hash, block_id, tx_time,
    * transferred_value_btc — ordered by (hop, tx_time), LIMIT applied
    * (app.py:373-374). */
  def trace(traces: DataFrame, p: TraceParams): DataFrame = {
    // The edge cache exists only for the duration of this call: each hop's
    // eager localCheckpoint scans it, the anchor is checkpointed too so
    // the RETURNED plan references only checkpointed RDDs (never the
    // cached plan), and the finally releases it — a long-lived serving
    // session tracing many windows must not accumulate one pinned edge
    // plan per trace. TraceSpec pins the empty-cache-registry postcondition.
    val edges = traces.select(
        col("source_address"), col("destination_address"),
        col("transaction_hash"), col("block_id"), col("tx_time"),
        col("transferred_value_btc"))
      .filter(col("tx_time").between(lit(p.startTime), lit(p.endTime)))
      .filter(col("source_address").isNotNull &&
        col("destination_address").isNotNull)
      .cache()
    try {
      var frontier = edges
        .filter(col("source_address") === p.sourceAddress)
        .withColumn("hop", lit(1))
        .localCheckpoint()
      var acc = frontier
      for (h <- 2 to p.maxHops) {
        frontier = frontier.select(col("destination_address").as("prev_dst"))
          .join(edges, col("prev_dst") === edges("source_address"))
          .drop("prev_dst")
          .withColumn("hop", lit(h))
          .localCheckpoint()
        acc = acc.unionByName(frontier)
      }
      acc.select(col("hop"), col("source_address"),
          col("destination_address"), col("transaction_hash"),
          col("block_id"), col("tx_time"), col("transferred_value_btc"))
        .orderBy(col("hop"), col("tx_time"), col("transaction_hash"),
          col("destination_address"))
        .limit(p.limit)
    } finally edges.unpersist()
  }

  /** J6 — degradation retry (app.py:380-383): any failure reruns with
    * maxHops = 1. The eager localCheckpoint forces execution inside the
    * try — returning the lazy plan would defer runtime failures (the OOM
    * class this guards against) past the catch. The result is bounded by
    * `p.limit`, so checkpointing it is cheap. */
  def traceWithFallback(traces: DataFrame, p: TraceParams): DataFrame =
    try trace(traces, p).localCheckpoint(true)
    catch { case _: Exception =>
      trace(traces, p.copy(maxHops = 1)).localCheckpoint(true)
    }

  /** J4 + O2/O3 — final enrichment join to dim_blocks and ordered page
    * (app.py:372-374). */
  def traceWithBlocks(traces: DataFrame, dimBlocks: DataFrame,
      p: TraceParams): DataFrame = {
    val t = trace(traces, p)
    t.join(dimBlocks.select(col("block_id"), col("block_hash"),
        col("difficulty")), Seq("block_id"))
      .orderBy(col("hop"), col("tx_time"), col("transaction_hash"),
        col("destination_address"))
      .limit(p.limit)
  }
}
