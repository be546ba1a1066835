package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import Parity._

/** Core relational operator inventory (SURVEY.md §2.2–§2.8), re-expressed
  * over the shared test tables. Each entry cites the reference behavior it
  * models; IDs (P*, J*, A*, W*, O*, U*, F*, M8) follow SURVEY.md §2.
  *
  * Scale notes are inline per query: what Catalyst does with the plan and
  * why it holds at 100 TB (pushdown, broadcast, partial agg, no
  * driver-side loops).
  */
object Relational extends QueryModule {

  /** P3-style per-row unit conversion (reference: macros/convert_to_btc.sql:1-3).
    * Pure per-row double math — deterministic, codegen'd, no shuffle. */
  def unitScale(c: Column, divisor: Double): Column = c / divisor

  /** P5 categorization (reference: int_transaction_flows.sql:38-41). */
  def statusCategory(c: Column): Column =
    when(c === "F", "finished").when(c === "O", "open").otherwise("partial")

  def all: Seq[Q] = Seq(

    // ---- P1: rename-projection (stg_* select/alias layer,
    //      reference stg_blocks.sql:9-51). Column-pruned parquet scan only.
    Q("p1_rename_project",
      (s, d) => lineitem(s, d).select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price_usd"),
        col("l_shipdate").as("ship_ts")),
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS line_no,
              l_quantity AS qty, l_extendedprice AS price_usd,
              l_shipdate AS ship_ts FROM lineitem""")),

    // ---- P2: null-key filter (reference stg_blocks.sql:52). The predicate
    //      is pushed to the parquet scan (PushedFilters: IsNotNull).
    Q("p2_null_filter",
      (s, d) => orders(s, d)
        .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
              WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL""")),

    // ---- P3: unit-conversion projection (macros/convert_to_btc.sql).
    //      Single per-row double op — bit-identical in any engine.
    Q("p3_unit_convert",
      (s, d) => lineitem(s, d).select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("line_no"),
        unitScale(col("l_extendedprice"), 100.0).as("price_hundreds")),
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS line_no,
              l_extendedprice / 100.0 AS price_hundreds FROM lineitem""")),

    // ---- P4: derived measure (macros/calculate_cdd.sql — lifespan/86400 *
    //      value/1e8). Same shape: price * (1-disc) * (1+tax), left-assoc.
    Q("p4_derived_measure",
      (s, d) => lineitem(s, d).select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("line_no"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("charge")),
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS line_no,
              l_extendedprice * (1 - l_discount) AS revenue,
              l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
              FROM lineitem""")),

    // ---- P5: CASE categorization + count (int_transaction_flows.sql:38-41).
    Q("p5_case_categorize",
      (s, d) => orders(s, d)
        .select(statusCategory(col("o_orderstatus")).as("status_cat"))
        .groupBy("status_cat").agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN o_orderstatus = 'F' THEN 'finished'
                          WHEN o_orderstatus = 'O' THEN 'open'
                          ELSE 'partial' END AS status_cat,
              COUNT(*) AS n FROM orders GROUP BY 1""")),

    // ---- P6: sign-flip projection (int_address_balances_with_history
    //      .sql:15-17 — debits become negative deltas).
    Q("p6_sign_flip",
      (s, d) => orders(s, d).select(
        col("o_orderkey").as("ref_id"),
        col("o_custkey").as("cust"),
        (-col("o_totalprice")).as("delta")),
      Some("""SELECT o_orderkey AS ref_id, o_custkey AS cust,
              -o_totalprice AS delta FROM orders""")),

    // ---- P7: parameterized time-range predicate (app.py:292 — BETWEEN on
    //      event time). Pushed to the scan; at scale this is the partition-
    //      pruning predicate on a date-partitioned table.
    Q("p7_time_range",
      (s, d) => events(s, d)
        .filter(col("ts").between(
          to_timestamp(lit("2024-01-08 00:00:00")),
          to_timestamp(lit("2024-01-15 00:00:00"))))
        .select("event_id", "ts", "user_id", "event_type"),
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              event_type FROM events
              WHERE ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
                           AND TIMESTAMP '2024-01-15 00:00:00'""")),

    // ---- P8: equality-parameter predicate (app.py:350 — WHERE address=%s).
    Q("p8_param_equality",
      (s, d) => customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE c_mktsegment = 'BUILDING'""")),

    // ---- J1: left equi-join, single key (int_transaction_flows.sql:44 —
    //      tx→blocks enrichment). The reference's semantics are the JOIN,
    //      not a physical strategy (SURVEY.md §2.3): physical choice is
    //      left to statistics + AQE, which broadcast the dim wherever it
    //      is actually small (PlanSpec pins BroadcastHashJoin at gate
    //      scale) and fall back to a shuffled hash/SMJ where it is not.
    //      customer here GROWS with the fact (fact/10) — a forced
    //      broadcast() is the exact per-executor-OOM bug class SCALE.md
    //      decade 5 measured (q18's forced ~1 GB customer broadcast
    //      killed the SparkContext at sf100), so no hint.
    Q("j1_left_single",
      (s, d) => {
        val o = orders(s, d); val c = customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "left")
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
            col("c_mktsegment"))
      },
      Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment
              FROM orders LEFT JOIN customer ON o_custkey = c_custkey""")),

    // ---- J2: equi-join on a composite key (int_transaction_flows.sql:45-46
    //      — (transaction_hash, block_id)). Self-join on the lineitem PK;
    //      both sides shuffle on the same composite key → single exchange
    //      each, SMJ at scale (or bucketed co-location, see sources/).
    Q("j2_composite_key",
      (s, d) => {
        val l = lineitem(s, d).as("l")
        val m = lineitem(s, d).as("m")
        l.join(m, col("l.l_orderkey") === col("m.l_orderkey")
            && col("l.l_linenumber") === col("m.l_linenumber"), "left")
          .select(col("l.l_orderkey").as("orderkey"),
            col("l.l_linenumber").as("line_no"),
            col("l.l_quantity").as("qty"),
            col("m.l_extendedprice").as("price"))
      },
      Some("""SELECT l.l_orderkey AS orderkey, l.l_linenumber AS line_no,
              l.l_quantity AS qty, m.l_extendedprice AS price
              FROM lineitem l LEFT JOIN lineitem m
              ON l.l_orderkey = m.l_orderkey
              AND l.l_linenumber = m.l_linenumber""")),

    // ---- J3: left join preserving unmatched left rows
    //      (int_address_balances_with_history.sql:50).
    Q("j3_left_enrich",
      (s, d) => {
        val c = customer(s, d); val o = orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"))
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey""")),

    // ---- J4: inner equi-join (app.py:372 — trace→dim_blocks). part
    //      scales with the fact (20M rows at sf100), so as in J1 the
    //      broadcast decision is left to statistics + AQE — identical
    //      plan at gate scale (PlanSpec), shuffled join where broadcast
    //      would OOM an executor.
    Q("j4_inner",
      (s, d) => {
        val l = lineitem(s, d); val p = part(s, d)
        l.join(p, l("l_partkey") === p("p_partkey"))
          .filter(col("p_size") > 25)
          .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
            col("p_size"))
      },
      Some("""SELECT l_orderkey, l_linenumber, p_brand, p_size
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_size > 25""")),

    // ---- A1: hash-agg SUM by group (dim_addresses.sql:12-16). Money sums
    //      via exact decimals (Parity); partial+final agg is automatic.
    Q("a1_sum_group",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              ${sqlDecSum("l_quantity")} AS sum_qty,
              ${sqlDecSum("l_extendedprice")} AS sum_price,
              COUNT(*) AS count_order
              FROM lineitem GROUP BY 1, 2""")),

    // ---- A2: COUNT(DISTINCT) by group (dim_addresses.sql:14). Exact
    //      two-phase expand; approx_count_distinct is the 100 TB variant
    //      (see a2_approx in Scale module).
    Q("a2_distinct_group",
      (s, d) => lineitem(s, d).groupBy("l_suppkey")
        .agg(countDistinct(col("l_orderkey")).as("distinct_orders")),
      Some("""SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS distinct_orders
              FROM lineitem GROUP BY 1""")),

    // ---- A3: global filtered COUNT(DISTINCT) (app.py:289-293 — "Total
    //      Transactions" metric).
    Q("a3_filtered_distinct",
      (s, d) => orders(s, d)
        .filter(col("o_orderdate").between(
          to_timestamp(lit("1996-01-01 00:00:00")),
          to_timestamp(lit("1997-12-31 00:00:00"))))
        .agg(countDistinct(col("o_custkey")).as("active_custs")),
      Some("""SELECT COUNT(DISTINCT o_custkey) AS active_custs FROM orders
              WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                    AND TIMESTAMP '1997-12-31 00:00:00'""")),

    // ---- A4: AVG with null-guard (app.py:304-308 —
    //      COALESCE(AVG(NULLIF(fee,0)),0)). Single-row output; round(6)
    //      absorbs accumulation-order ulps.
    Q("a4_avg_nullguard",
      (s, d) => lineitem(s, d).agg(
        round(coalesce(avg(nullif(col("l_discount"), lit(0.0))), lit(0.0)), 6)
          .as("avg_nonzero_discount")),
      Some("""SELECT ROUND(COALESCE(AVG(NULLIF(l_discount, 0.0)), 0.0), 6)
              AS avg_nonzero_discount FROM lineitem""")),

    // ---- A5: top-k group by COUNT(*) (app.py:239-246 — most-active
    //      address). Sort+limit folds to TakeOrderedAndProject: only the
    //      per-partition top-1 ever reaches the driver.
    Q("a5_top_group",
      (s, d) => orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(desc("n_orders"), asc("o_custkey")).limit(1),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders FROM orders
              GROUP BY 1 ORDER BY n_orders DESC, o_custkey LIMIT 1""")),

    // ---- W1: running balance — cumulative SUM with the default RANGE
    //      frame (int_address_balances_with_history.sql:44-46): ties in ts
    //      share the cumulative value. Decimal input keeps the window sum
    //      exact and order-independent.
    Q("w1_running_balance",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        events(s, d).select(col("event_id"), col("user_id"), col("ts"),
          outDec(sum(dec(col("value"))).over(w)).as("running_value"))
      },
      Some(s"""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
              ${sqlOutDec("SUM(CAST(value AS DECIMAL(18,6))) OVER " +
                "(PARTITION BY user_id ORDER BY ts)")} AS running_value
              FROM events""")),

    // ---- W2: ROW_NUMBER ranking (fct_transaction_traces.sql:24). Ordering
    //      key made total with the event_id tiebreak.
    Q("w2_row_number",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"),
          col("event_id"))
        events(s, d).select(col("event_id"), col("user_id"),
          row_number().over(w).as("seq"))
      },
      Some("""SELECT event_id, user_id, ROW_NUMBER() OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS seq
              FROM events""")),

    // ---- O1: global top-1 by value (app.py:319-324 — richest address).
    Q("o1_top1",
      (s, d) => orders(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(1)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 1""")),

    // ---- O2: ordered page (app.py:373-374 — ORDER BY ... LIMIT 1000).
    //      TakeOrderedAndProject — no global sort materialized.
    Q("o2_ordered_page",
      (s, d) => events(s, d).orderBy(col("ts"), col("event_id")).limit(1000)
        .select("event_id", "ts", "user_id", "event_type"),
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              event_type FROM events
              ORDER BY ts, event_id LIMIT 1000""")),

    // ---- O3: multi-key sort (app.py:373 — ORDER BY hop, tx_time).
    Q("o3_multikey_sort",
      (s, d) => lineitem(s, d)
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(1000)
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber LIMIT 1000""")),

    // ---- U1 (+P6): UNION ALL of sign-flipped debit/credit streams
    //      (int_address_balances_with_history.sql:31-35). unionByName =
    //      bag semantics, no dedup shuffle.
    Q("u1_union_all",
      (s, d) => {
        val debits = orders(s, d).select(col("o_custkey").as("cust"),
          col("o_orderdate").as("ts"), (-col("o_totalprice")).as("delta"))
        val credits = customer(s, d).select(col("c_custkey").as("cust"),
          to_timestamp(lit("1990-01-01 00:00:00")).as("ts"),
          col("c_acctbal").as("delta"))
        debits.unionByName(credits)
      },
      Some("""SELECT o_custkey AS cust, o_orderdate AS ts,
              -o_totalprice AS delta FROM orders
              UNION ALL
              SELECT c_custkey AS cust, TIMESTAMP '1990-01-01 00:00:00' AS ts,
              c_acctbal AS delta FROM customer""")),

    // ---- F4: BETWEEN with explicit timestamp casts (app.py:292 — string
    //      date literals vs TIMESTAMP column).
    Q("f4_ts_cast",
      (s, d) => events(s, d)
        .filter(col("ts") >= to_timestamp(lit("2024-01-05 00:00:00"))
          && col("ts") < to_timestamp(lit("2024-01-06 00:00:00")))
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
              WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
                AND ts < TIMESTAMP '2024-01-06 00:00:00' GROUP BY 1""")),

    // ---- F6: date truncation/parse (generate_snowflake_ddl.py:196-218
    //      DATE vs TIMESTAMP classification → here as date_trunc parity).
    Q("f6_date_trunc",
      (s, d) => orders(s, d)
        .select(date_trunc("month", col("o_orderdate")).as("order_month"))
        .groupBy("order_month").agg(count(lit(1)).as("n")),
      Some("""SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
              COUNT(*) AS n FROM orders GROUP BY 1""")),

    // ---- F7: regex predicate (app.py:99-102 address validation →
    //      generic rlike).
    Q("f7_regex_match",
      (s, d) => documents(s, d)
        .filter(col("text").rlike("spark [a-z]+ join"))
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
              WHERE regexp_matches(text, 'spark [a-z]+ join')""")),

    // ---- F8: max string length (generate_snowflake_ddl.py:392-393 —
    //      VARCHAR tier driver).
    Q("f8_max_strlen",
      (s, d) => documents(s, d).groupBy("lang")
        .agg(max(length(col("text"))).as("max_len"),
          count(lit(1)).as("n_docs")),
      Some("""SELECT lang, CAST(MAX(LENGTH(text)) AS INT) AS max_len,
              COUNT(*) AS n_docs FROM documents GROUP BY 1""")),

    // ---- M8: data-quality assertion queries (dbt schema tests,
    //      models/staged/schema.yml — unique / not_null / orphan checks).
    Q("m8_quality_checks",
      (s, d) => {
        val dupPk = orders(s, d).groupBy("o_orderkey")
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(count(lit(1)).as("violations"))
          .select(lit("orders_pk_unique").as("check_name"),
            col("violations"))
        val nullKey = customer(s, d).filter(col("c_custkey").isNull)
          .agg(count(lit(1)).as("violations"))
          .select(lit("customer_key_not_null").as("check_name"),
            col("violations"))
        val l = lineitem(s, d); val o = orders(s, d)
        val orphans = l.join(o, l("l_orderkey") === o("o_orderkey"),
            "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("lineitem_no_orphans").as("check_name"),
            col("violations"))
        dupPk.unionByName(nullKey).unionByName(orphans)
      },
      Some("""SELECT 'orders_pk_unique' AS check_name, COUNT(*) AS violations
              FROM (SELECT o_orderkey FROM orders GROUP BY 1
                    HAVING COUNT(*) > 1)
              UNION ALL
              SELECT 'customer_key_not_null', COUNT(*) FROM customer
              WHERE c_custkey IS NULL
              UNION ALL
              SELECT 'lineitem_no_orphans', COUNT(*) FROM lineitem
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_orderkey = l_orderkey)"""))
  )
}
