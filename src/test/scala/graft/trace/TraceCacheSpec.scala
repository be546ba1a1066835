package graft.trace

import graft.{Fixtures, SparkSpec}
import graft.models.Pipeline
import java.nio.file.Files
import java.sql.Timestamp

/** Cache-hygiene postconditions for BOTH trace implementations, in a
  * suite with no cached fixtures of its own (TraceSpec pins behavior but
  * caches its input, which would mask a leak from the operator under
  * test). A long-lived serving session traces many windows; one pinned
  * edge plan per call is a leak, not a cache.
  */
class TraceCacheSpec extends SparkSpec {

  test("j5/j6/sankey: lazy trace queries leave no cached plan behind") {
    spark.catalog.clearCache() // isolate from any prior suite's fixtures
    val sf = "/root/testdata/sf0.001"
    Seq("j5_trace_recursive", "j6_trace_fallback", "trace_sankey_agg")
      .foreach { q =>
        graft.SparkEntry.queries(q)(spark, sf).collect()
        assert(spark.sharedState.cacheManager.isEmpty,
          s"$q left a cached plan pinned")
      }
  }

  test("domain Trace.trace releases its edge cache (and the returned " +
      "plan does not depend on it)") {
    spark.catalog.clearCache()
    val d = Files.createTempDirectory("graft-trace-cache")
    Fixtures.writeAll(d)
    val traces = Pipeline.readRaw(spark, d.toString).fctTransactionTraces
    val p = Trace.TraceParams("addrA", 2,
      Timestamp.valueOf("2025-08-20 00:00:00"),
      Timestamp.valueOf("2025-08-20 23:59:59"))
    val r = Trace.trace(traces, p)
    assert(spark.sharedState.cacheManager.isEmpty,
      "Trace.trace returned with its edge cache still pinned")
    // the returned plan must stay executable AFTER the cache is gone
    assert(r.count() == 3)
  }
}
