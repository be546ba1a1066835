package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Contract guards for the driver interface. */
class SparkEntrySpec extends AnyFunSuite {

  private val modules: Seq[QueryModule] =
    Seq(Relational, TraceOps, DomainModels, TextOps, VectorOps, MediaOps,
      ScaleOps, BloomOps, Extensions, PortableHashOps, ClassicQueries,
      ClassicQueries2, RecallOps, CorpusOps, GraphOps,
      graft.streaming.StreamQueries, graft.models.PipelineQueries)

  test("no duplicate query keys across modules (a collision would " +
    "silently drop an operator from the gate)") {
    val all = modules.flatMap(_.all.map(_.name))
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a query") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("oracle SQL strings are DuckDB-parseable shapes (no stray quotes)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.count(_ == '\'') % 2 == 0, s"$name has unbalanced quotes")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$name: not a query")
    }
  }

  test("no query emits a DECIMAL output column (driver hash gate trap)") {
    // The driver's hasher canonicalizes decimal columns differently
    // between Spark parquet and DuckDB: r1 had 8 value-identical queries
    // fail on DECIMAL(38,6) outputs alone. Aggregate in decimal, but the
    // FINAL compared schema must be decimal-free (Parity.outDec).
    // .schema is analysis-only — cheap to check for every LAZY query.
    // Q.eager queries run real jobs at construction, so they are swept
    // by their own executing specs instead (CorpusOpsSpec pins
    // dup_clusters' schema decimal-free).
    val spark = SparkSpec.session
    // Constructing every query registers the handful of
    // construction-time caches some bodies use for intra-query reuse;
    // clear them after the sweep so later suites' cache-hygiene pins
    // (CorpusOpsSpec, AnnRecallSpec, TraceCacheSpec) hold in ANY suite
    // order — this sweep is the one place that mass-constructs without
    // executing.
    try {
      val offenders = modules.flatMap(_.all).filterNot(_.eager)
        .sortBy(_.name).flatMap { q =>
          val decimalCols = q.fn(spark, "/root/testdata/sf0.001").schema.fields
            .filter(_.dataType.isInstanceOf[
              org.apache.spark.sql.types.DecimalType])
            .map(_.name)
          if (decimalCols.isEmpty) None
          else Some(s"${q.name}(${decimalCols.mkString(",")})")
        }
      assert(offenders.isEmpty,
        s"decimal output columns break the driver hash: $offenders")
    } finally spark.catalog.clearCache()
  }

  test("eager queries stay the rare, documented exception") {
    val eager = modules.flatMap(_.all).filter(_.eager).map(_.name)
    // each entry here carries an executing schema spec: CorpusOpsSpec
    // for dup_clusters and split_leakage_safe (eager for the same
    // reason — the ccLogStar convergence loop), GraphOpsSpec for the
    // two component variants, AnnRecallSpec for the IVF pair (eager
    // because centroid training is a collect), StreamIngestSpec for
    // sessionize_stream (eager because construction runs a streaming
    // query to completion), SkewSpec for skew_adaptive_join (eager
    // because hot-key detection samples at construction), StreamMartSpec
    // for pipeline_stream_trace_mart (eager: construction replays a
    // 2-batch stream through writeBuildIncremental), BloomOpsSpec for
    // the bloom pair (eager because pass 1 — the filter build — is a
    // treeAggregate job)
    assert(eager.sorted ==
      Seq("ann_ivf_recall", "ann_ivf_topk", "bloom_prune_stats",
        "bloom_pruned_join", "dup_clusters",
        "graph_cc_components", "graph_cc_logstar", "graph_cc_scale_twin",
        "pipeline_stream_trace_mart", "sessionize_stream",
        "skew_adaptive_join", "split_leakage_safe"),
      s"new eager query needs its own executing schema spec: $eager")
  }
}
