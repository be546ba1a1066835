package graft.ops

import graft.SparkSpec

/** Physical-plan assertions: the scale claims in the operator Scaladoc
  * must be visible in the executed plan — pushdown reaching the parquet
  * scan, dims broadcast, sort+limit folded to TakeOrderedAndProject,
  * partial (map-side) aggregation, and the custom dot product inside
  * WholeStageCodegen.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("p7: time-range predicate is pushed to the parquet scan") {
    val p = plan("p7_time_range")
    assert(p.contains("PushedFilters: [IsNotNull(ts)"), p.take(800))
  }

  test("p1: projection prunes the scan to selected columns only") {
    val p = plan("p1_rename_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_partkey"), "unused column not pruned")
  }

  test("j1/j4: dimension joins broadcast") {
    assert(plan("j1_left_single").contains("BroadcastHashJoin"))
    assert(plan("j4_inner").contains("BroadcastHashJoin"))
  }

  test("o1/o2: sort+limit folds to TakeOrderedAndProject") {
    assert(plan("o1_top1").contains("TakeOrderedAndProject"))
    assert(plan("o2_ordered_page").contains("TakeOrderedAndProject"))
  }

  test("a1: aggregation is two-phase (map-side partial)") {
    val p = plan("a1_sum_group")
    assert(p.contains("partial_sum") || p.contains("partial"), p.take(800))
  }

  test("ann: custom dot product participates in whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val p = e.select(graft.functions.VectorExprs
        .dotProduct(col("v"), col("v")).as("norm_sq"))
      .queryExecution.executedPlan.toString
    // a plain projection stage: graft_dot must sit inside a
    // WholeStageCodegen span (rendered as the `*(n)` prefix)
    assert(p.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"),
      p.take(1200))
    assert(!p.contains("CodegenFallback"), p.take(1200))
    // and the all-pairs query (nested-loop join — never codegen'd as a
    // whole) still evaluates the native expression:
    val np = graft.SparkEntry.queries("emb_neardup_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(np.contains("graft_dot"))
  }

  test("q5: orders are pre-filtered to ASIA customers before lineitem joins") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // AQE off so the executed plan is the plain tree (no QueryStageExec
    // wrappers) and per-node metrics are reachable by collect().
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.SparkEntry.queries("q5_local_supplier")(spark, sf)
      df.collect()
      val bhjs = df.queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b
      }
      // the orders⋈customer join emits o_orderkey but no lineitem columns
      val preFilter = bhjs.filter(b =>
        b.output.exists(_.name == "o_orderkey") &&
          !b.output.exists(_.name.startsWith("l_")))
      assert(preFilter.nonEmpty,
        df.queryExecution.executedPlan.toString.take(1500))
      val outRows = preFilter.map(_.metrics("numOutputRows").value).min
      val totalOrders = graft.Tables.orders(spark, sf).count()
      assert(outRows < totalOrders * 0.4,
        s"ASIA pre-filter should cut orders ~5x: $outRows of $totalOrders")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("clean-docs dedup is pre-reduced map-side by LocalTopK ALONE — " +
    "the builtin group limit must not stack a second reducer") {
    val p = plan("pipeline_clean_docs")
    assert(p.contains("LocalTopK"), p.take(1500))
    // InferWindowGroupLimit runs after injected rules and would re-add
    // its sort+reduce above LocalTopK; GraftStrategies elides it
    assert(!p.contains("WindowGroupLimit"),
      "builtin WindowGroupLimit stacked on top of LocalTopK")
  }

  test("q18: having-sum filter runs as a semi-join after a partial agg") {
    val p = plan("q18_large_volume")
    // the qualifying-orders set joins semi (orders are filtered, not
    // widened), and the quantity-sum aggregate is two-phase so the
    // having filter's input is map-side combined before its exchange
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q21: the EXISTS/NOT EXISTS chain plans as semi + anti joins") {
    val p = plan("q21_sole_blame")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("LeftAnti"), p.take(1500))
    // the supplier dim stays broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q2: the correlated-min subquery is decorrelated to an aggregate" +
    " join (no per-row subquery execution)") {
    val df = graft.SparkEntry.queries("q2_min_price_part")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // decorrelation success = no correlated ScalarSubquery survives in
    // the optimized plan; the min becomes a grouped aggregate + join
    assert(!opt.contains("scalar-subquery"), opt.take(1500))
    assert(opt.contains("Aggregate"), opt.take(1500))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Subquery"), p.take(1500))
  }

  test("q2 window twin: ONE lineitem scan, ONE window pass, ONE fact " +
    "exchange — half the correlated form's lineitem traffic") {
    val p = plan("q2_min_price_window")
    // the decorrelated subquery form scans lineitem twice; the window
    // shape must scan it once (plus the part dim scan = 2 total)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected 2 scans (lineitem + part), saw $scans\n" +
      p.take(1500))
    val windows = "\\bWindow\\b".r.findAllIn(p).length
    assert(windows == 1, s"expected 1 window pass, saw $windows\n" +
      p.take(1500))
    // the single l_partkey exchange feeding the window; part rides as a
    // broadcast at gate scale (stats — no hint)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, saw $exchanges\n" +
      p.take(1500))
  }

  test("q1: single-pass scan-aggregate — pushdown + two-phase agg, " +
    "no join") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(900))
    assert(p.contains("partial_sum"), p.take(900))
    assert(!p.contains("Join"), p.take(900))
  }

  test("q4: EXISTS with non-equi residual plans as one semi-join") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("a2 scale variant: approx_count_distinct plans without expand") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    val p = li.groupBy("l_suppkey")
      .agg(approx_count_distinct("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"))
  }

  test("decontaminate: eval shingle set is broadcast; per-doc count is " +
    "two-phase") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("partial_count"), "map-side partial agg missing")
  }

  test("quality quantile gate: per-language thresholds are broadcast " +
    "back, never shuffled against the corpus") {
    assert(plan("quality_quantile_filter").contains("BroadcastHashJoin"))
  }

  test("seq packing: exactly one exchange — the per-source window " +
    "partition; no global sort") {
    val p = plan("seq_packing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"), "global sort crept in")
  }

  test("q7: nation pairing lands as broadcast dims with the ship-date " +
    "band pushed to the fact scan — no disjunctive join predicate") {
    val p = plan("q7_volume_shipping")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "band not pushed")
    assert(!p.toLowerCase.contains("broadcastnestedloopjoin"),
      "disjunctive predicate degraded a join to nested-loop")
  }

  test("stratified sampling is map-only: no exchange at all") {
    val p = plan("sample_stratified")
    assert(!p.contains("Exchange"), p.take(800))
  }

  test("q6: pure scan-aggregate — all three predicates pushed, no " +
    "shuffle beyond the single-row final agg") {
    val p = plan("q6_forecast_revenue")
    // the toString truncates PushedFilters mid-list, so pin the prefix:
    // all three columns' null guards land in the pushed set (their range
    // predicates follow in the same list)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_discount), IsNotNull(l_quantity)"), p.take(900))
    assert(!p.contains("Join"), p.take(900))
    assert(p.contains("partial_sum"), p.take(900))
  }

  test("q8/q14: the conditional-ratio aggregates run as ONE aggregate " +
    "pass (numerator and denominator together, no self-join)") {
    for (n <- Seq("q8_market_share", "q14_promo_revenue")) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n dims not broadcast")
      // one aggregation pipeline: a CASE-sum next to the plain sum, not
      // a union/self-join of two scans of the filtered fact
      assert(!p.contains("Union"), s"$n split into a self-union")
    }
  }

  test("q13: the outer-join count distribution keeps the ON-clause " +
    "filter on the right side (no post-join filter breaking LEFT rows)") {
    val df = graft.SparkEntry.queries("q13_customer_distribution")(
      spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // the priority filter sits under the join, not above it
    assert(opt.contains("LeftOuter"), opt.take(1200))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q15: the scalar MAX over the revenue CTE plans as a subquery " +
    "stage, not a per-row re-aggregation") {
    val df = graft.SparkEntry.queries("q15_top_supplier")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // the equality filter references one scalar subquery result
    assert(opt.contains("scalar-subquery") || opt.contains("Join"),
      opt.take(1500))
  }

  test("q17: the correlated per-part average is decorrelated — no " +
    "correlated subquery survives the optimizer") {
    val df = graft.SparkEntry.queries("q17_small_qty_revenue")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("scalar-subquery"), opt.take(1500))
    assert(opt.contains("Aggregate"), opt.take(1500))
  }

  test("q19: the disjunctive predicate stays a residual over a hash " +
    "join — never a nested-loop") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.toLowerCase.contains("broadcastnestedloopjoin"),
      "OR predicate degraded the join to nested-loop")
  }

  test("q20: the nested having-sum chain plans as a semi-join into the " +
    "supplier dim with a two-phase quantity aggregate") {
    val p = plan("q20_excess_inventory")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q22: anti-join against orders plus a broadcast one-row average") {
    val p = plan("q22_global_sales")
    assert(p.contains("LeftAnti"), p.take(1500))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("graph_pagerank/taint: one lazy plan per query — the one-row " +
    "scalars broadcast, every per-iteration aggregate is two-phase") {
    for (n <- Seq("graph_pagerank", "graph_taint_haircut")) {
      val p = plan(n)
      assert(p.contains("BroadcastExchange") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"$n: node-count/ratio side not broadcast")
      assert(p.contains("partial_sum"), s"$n: aggregate not two-phase")
      // the unrolled iterations must NOT materialize anything eagerly
      assert(!p.contains("LogicalRDD"), s"$n not one lazy plan")
    }
  }

  test("graph_triangles: the wedge join closes with a semi-join (each " +
    "wedge tested once, never widened)") {
    val p = plan("graph_triangles")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q9/q10: dims ride as broadcasts; only fact-fact joins shuffle") {
    for (n <- Seq("q9_product_profit", "q10_returned_items")) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n dims not broadcast")
      assert(!p.toLowerCase.contains("broadcastnestedloopjoin"),
        s"$n degraded to nested-loop")
    }
  }

  test("x26: the upsert merge plans as one full-outer join on the " +
    "merge key") {
    val p = plan("x26_upsert")
    assert(p.contains("FullOuter"), p.take(1500))
  }

  test("pipeline e2e: the block dimension rides as a broadcast through " +
    "the whole ingest->mart lineage") {
    val p = plan("pipeline_e2e_trace_mart")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("x28: the as-of join is realized as union + running window — " +
    "ZERO joins, ONE window pass, exactly TWO exchanges") {
    val p = plan("x28_asof_join")
    assert(!p.contains("Join"), "as-of must not plan as a join:\n" +
      p.take(1500))
    // one struct-valued last() → CollapseWindow keeps a single Window
    // operator (two separate withColumn windows would plan as two full
    // passes over every partition)
    val windows = "\\bWindow\\b".r.findAllIn(p).length
    assert(windows == 1, s"expected 1 window pass, saw $windows\n" +
      p.take(1500))
    // the dedup aggregate on (k, t) plus the window's key shuffle — the
    // documented shuffle budget; a third exchange means a regression
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges, saw $exchanges\n" +
      p.take(1500))
  }

  test("a2 one-pass twin: both aggregates ride ONE group-key exchange " +
    "(the default countDistinct plan pays two)") {
    val p = plan("a2_distinct_onepass")
    // repartition(l_suppkey) is the only exchange: HashPartitioning on
    // the group key satisfies ClusteredDistribution for BOTH the
    // (suppkey, orderkey) dedup aggregate and the per-suppkey count
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, saw $exchanges\n" +
      p.take(1500))
    assert(!p.contains("Expand"), "distinct-agg Expand crept back in:\n" +
      p.take(1500))
  }

  test("x8: set ops collapse to ONE orders scan and ONE aggregate " +
    "(not 4 scans + 2 shuffle-dedups)") {
    val p = plan("x8_set_ops")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 orders scan, saw $scans\n${p.take(1500)}")
    val aggExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(aggExchanges == 1,
      s"expected 1 exchange (the aggregate), saw $aggExchanges\n${p.take(1500)}")
    assert(p.contains("partial_max"), "presence bits must combine map-side")
  }

  test("mix weights: the totals singleton rides as a broadcast over the " +
    "map-side-combined per-source aggregate") {
    val p = plan("corpus_mix_weights")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(1500))
    assert(p.contains("partial_sum"), "per-source token agg must combine " +
      "map-side")
    // scan pruned to the two columns the operator touches
    assert(p.contains("ReadSchema: struct<text:string,source:string>") ||
      p.contains("ReadSchema: struct<source:string,text:string>"),
      p.take(1500))
  }

  test("doc novelty (r14 window shape): scan pruned to (doc_id, text); " +
    "first-occurrence min is a WINDOW on the shingle key — no join, no " +
    "second pass over the exploded shingles; doc agg combines map-side") {
    val p = plan("doc_novelty")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(1500))
    // the r14 rewrite replaced the groupBy+join-back (2 consumers of
    // the exploded shingles + a shingle-keyed join) with min() OVER
    // (PARTITION BY shingle) on the same exchange — the plan must
    // carry a Window and NO join of any strategy
    assert(p.contains("Window"), p.take(1500))
    for (j <- Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!p.contains(j),
        s"doc_novelty must not join after the window rewrite ($j)\n" +
          p.take(1500))
    assert(p.contains("partial_count"),
      "doc aggregate must combine map-side\n" + p.take(1500))
  }

  test("funnel: stage-type filters push to every events scan; all " +
    "frontier aggregates combine map-side; no unkeyed join") {
    val p = plan("x29_funnel_steps")
    // each stage's event_type equality reaches the parquet scan — the
    // 100 TB claim is that a stage reads its own slice, not all events
    for (t <- Seq("view", "click", "purchase"))
      assert(p.contains(s"EqualTo(event_type,$t)"),
        s"stage filter $t not pushed\n" + p.take(1500))
    assert(p.contains("partial_min"),
      "frontier min must combine map-side\n" + p.take(1500))
    // every join is keyed on user_id (broadcast at fixture scale; the
    // same keyed plan SMJs co-partitioned at scale) — a nested-loop or
    // cartesian here would mean the time predicate leaked into the
    // join condition as the only condition
    assert(p.contains("BroadcastHashJoin [user_id"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("funnel: the shared stage frontiers are computed once — " +
    "ReusedExchange dedupes Catalyst's repeated subtrees at runtime") {
    // Exchange reuse is a planner heuristic, not a semantic guarantee —
    // this is a MEASURED-plan pin. Gate it on the conf that enables the
    // heuristic so a future Spark/conf change fails with an actionable
    // message instead of a mystery assert.
    assume(spark.conf.get("spark.sql.exchange.reuse", "true") == "true",
      "exchange reuse disabled in this session; the dedupe pin does " +
        "not apply — re-evaluate x29's plan shape if this is permanent")
    val df = graft.SparkEntry.queries("x29_funnel_steps")(spark, sf)
    df.collect() // AQE only finalizes (and reuses) on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(300))
    // The semantic property is the COUNT of exchanges the plan
    // materializes, not the presence of a ReusedExchange node (that
    // node is one mechanism; a future planner could equally dedupe by
    // merging subtrees before planning). Today the deduped plan
    // materializes 17 exchanges and reuses 2 — a reuse-free plan
    // recomputes the shared s1/s2 frontier subtrees and lands at 19+.
    // Pin "no recompute" as the count bound, so a Spark bump that
    // dedupes DIFFERENTLY stays green and one that stops deduping
    // fails for the real reason (shared frontiers executed twice).
    val materialized = "(?m)(?<!Reused)Exchange ".r.findAllIn(p).size
    assert(materialized <= 17,
      s"funnel materializes $materialized exchanges (> 17): the shared " +
        "s1/s2 frontier subtrees are being recomputed instead of " +
        "deduped\n" + p.take(2000))
  }

  test("retention: scan pruned to (ts, user_id); COUNT(DISTINCT) is the " +
    "expand-free two-level aggregate; the frontier join is keyed") {
    val p = plan("x30_retention_cohorts")
    assert(p.contains("ReadSchema: struct<ts:"), p.take(1500))
    assert(!p.contains("props") && !p.contains("event_type"),
      "unused columns must not reach the scan\n" + p.take(1500))
    assert(p.contains("partial_min"),
      "per-user frontier must combine map-side\n" + p.take(1500))
    // distinct-count compiles to dedup-then-count (two aggregate
    // levels), not an Expand — the only distinct aggregate in the query
    assert(p.contains("partial_count(distinct") ||
      p.contains("count(distinct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin [user_id"), p.take(1500))
  }
}
