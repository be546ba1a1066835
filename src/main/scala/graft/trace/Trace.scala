package graft.trace

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** The output's total order (app.py:373-374's ORDER BY, made
    * deterministic with the hash/destination tiebreak). */
  private def orderKey: Seq[Column] = Seq(col("hop"), col("tx_time"),
    col("transaction_hash"), col("destination_address"))

  /** The WEIGHTED trace accumulator: one row per (hop, reached edge)
    * carrying `paths` = how many distinct hop-paths arrive over that
    * edge, instead of one row PER PATH. Path counting is distributive
    * — the count arriving at an edge is the sum of the counts that
    * arrived at its source — so each hop joins only the DISTINCT
    * destinations of the previous hop (with their path counts) to the
    * edge set and never materializes multiplicity as rows. Every hop's
    * state is bounded by |edges-in-window|, where the row-per-path
    * frontier grows like |edges|^h on hub graphs (the blow-up the
    * reference punts on with LIMIT + OOM retry, app.py:364-383; the
    * gate-path twin of this rewrite lives in ops/TraceOps.step).
    * TraceFrontierSpec pins the bound and the expansion parity on a
    * multiplicity-heavy fixture. */
  private[trace] def weightedHops(edges: DataFrame,
      p: TraceParams): DataFrame = {
    var hopRows = edges
      .filter(col("source_address") === p.sourceAddress)
      .withColumn("hop", lit(1))
      .withColumn("paths", lit(1L))
      .localCheckpoint()
    var acc = hopRows
    for (h <- 2 to p.maxHops) {
      // Weighted frontier: ONE row per distinct reached address. This
      // groupBy is the whole fix — the join input below can never
      // exceed the address domain, regardless of path multiplicity.
      val frontier = hopRows
        .groupBy(col("destination_address").as("prev_dst"))
        .agg(sum(col("paths")).as("prev_paths"))
      hopRows = frontier
        .join(edges, col("prev_dst") === edges("source_address"))
        .withColumn("hop", lit(h))
        .withColumn("paths", col("prev_paths"))
        .drop("prev_dst", "prev_paths")
        .localCheckpoint()
      acc = acc.unionByName(hopRows)
    }
    acc
  }

  /** Multi-hop trace over trace edges (columns of
    * fct_transaction_traces). Output: hop, source_address,
    * destination_address, transaction_hash, block_id, tx_time,
    * transferred_value_btc — ordered by (hop, tx_time), LIMIT applied
    * (app.py:373-374). Row-per-path semantics (UNION ALL multiplicity
    * preserved, as the reference's recursive CTE produces), but
    * computed through the weighted accumulator above and re-expanded
    * only at the very end, bounded by `p.limit`:
    *
    *  1. top-k the weighted rows by the output order (every weighted
    *     row carries >= 1 path, so the first `limit` output rows are
    *     contained in the expansion of the first `limit` weighted rows
    *     — a distributed TakeOrderedAndProject, never a global sort);
    *  2. over that <= `limit`-row slice, a running path total assigns
    *     each row its start position, rows starting past the limit are
    *     dropped, and each survivor explodes into
    *     min(paths, limit - start) copies — so no more than ~limit
    *     rows are ever materialized even when one edge carries 1e14
    *     paths.
    *
    * Identical output to enumerate-then-limit (duplicate rows are
    * interchangeable under the sort), with memory bounded by
    * |edges| + limit instead of |paths|. */
  def trace(traces: DataFrame, p: TraceParams): DataFrame = {
    // The edge cache exists only for the duration of this call: each hop's
    // eager localCheckpoint scans it, so the RETURNED plan references only
    // checkpointed RDDs (never the cached plan), and the finally releases
    // it — a long-lived serving session tracing many windows must not
    // accumulate one pinned edge plan per trace. TraceSpec pins the
    // empty-cache-registry postcondition.
    val edges = traces.select(
        col("source_address"), col("destination_address"),
        col("transaction_hash"), col("block_id"), col("tx_time"),
        col("transferred_value_btc"))
      .filter(col("tx_time").between(lit(p.startTime), lit(p.endTime)))
      .filter(col("source_address").isNotNull &&
        col("destination_address").isNotNull)
      .cache()
    try {
      val topWeighted = weightedHops(edges, p)
        .orderBy(orderKey: _*)
        .limit(p.limit)
      // <= limit rows from here on: the single-partition window is over
      // the top-k slice, not the trace state.
      val pos = Window.orderBy(orderKey: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      topWeighted
        .withColumn("start_pos", sum(col("paths")).over(pos) - col("paths"))
        .filter(col("start_pos") < p.limit)
        .withColumn("n_copies",
          least(col("paths"), lit(p.limit.toLong) - col("start_pos")))
        .withColumn("copy_i", explode(sequence(lit(1L), col("n_copies"))))
        .select(col("hop"), col("source_address"),
          col("destination_address"), col("transaction_hash"),
          col("block_id"), col("tx_time"), col("transferred_value_btc"))
        .orderBy(orderKey: _*)
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
