package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import Parity._

/** Operator-class extensions beyond the reference's surface: generators
  * (explode), grouping-set rollups, lag/lead windows, semi/anti joins,
  * and an as-of join. The reference needs none of these (SURVEY.md §2
  * "absent" rows) — they round out the engine to a complete analytics
  * surface, each with a DuckDB oracle.
  */
object Extensions extends QueryModule {

  def all: Seq[Q] = Seq(

    // ---- Generator: explode after array filtering (stopword removal) —
    //      the UDTF-shaped operator class. One Generate node, no shuffle.
    Q("x1_explode_tokens",
      (s, d) => documents(s, d)
        .select(col("doc_id"),
          explode(filter(split(col("text"), " "),
            w => !w.isin("the", "a", "of", "and"))).as("token")),
      Some("""SELECT doc_id, unnest(list_filter(string_split(text, ' '),
              w -> w NOT IN ('the', 'a', 'of', 'and'))) AS token
              FROM documents""")),

    // ---- Grouping sets: ROLLUP totals. Spark and ANSI both mark
    //      super-aggregate rows with NULL group keys.
    Q("x2_rollup_agg",
      (s, d) => orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice")).as("total")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              ${sqlDecSum("o_totalprice")} AS total
              FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),

    // ---- lag/lead over an event-time window (delta vs previous event of
    //      the same user). Single subtraction — exact, no rounding needed.
    Q("x3_window_lag",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"),
          col("event_id"))
        events(s, d).select(col("event_id"), col("user_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
          (lead(col("value"), 1).over(w) - col("value")).as("delta_next"))
      },
      Some("""SELECT event_id, user_id,
              value - lag(value, 1) OVER w AS delta_prev,
              lead(value, 1) OVER w - value AS delta_next
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // ---- rank() <= k per key: the LocalTopK RankMode pre-reduce fires
    //      (boundary tie-classes kept whole, so the row set is exact and
    //      deterministic — tied rows share a rank). At scale this turns
    //      the full-partition window shuffle into ≤(k+ties) rows per key
    //      per map task.
    Q("x16_rank_topk",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("event_type"))
        events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .withColumn("r", rank().over(w))
          .filter(col("r") <= 2)
      },
      Some("""SELECT * FROM (
              SELECT event_id, user_id, event_type,
                     rank() OVER (PARTITION BY user_id ORDER BY event_type)
                       AS r
              FROM events) WHERE r <= 2""")),

    // ---- Scalar subqueries, uncorrelated + correlated: orders above
    //      the global mean whose price also tops their customer's mean.
    //      Spark plans the uncorrelated one as a reusable subquery
    //      result and decorrelates the correlated one into an aggregate
    //      + join — no per-row re-execution. The mean comparison is
    //      phrased as price·count > sum in DECIMAL so the boundary
    //      decision is exact in both engines (a float AVG could flip a
    //      row that sits on the mean).
    Q("x22_scalar_subquery",
      (s, d) => Sql.withView(s, orders(s, d), "graft_orders_ss") { v =>
        s.sql(s"""SELECT o_orderkey, o_custkey
                 FROM $v o
                 WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
                     (SELECT COUNT(*) FROM $v) >
                   (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    FROM $v)
                   AND CAST(o_totalprice AS DECIMAL(18,6)) *
                     (SELECT COUNT(*) FROM $v o2
                      WHERE o2.o_custkey = o.o_custkey) >
                   (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,6)))
                    FROM $v o2
                    WHERE o2.o_custkey = o.o_custkey)""")
      },
      Some("""SELECT o_orderkey, o_custkey
              FROM orders o
              WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
                  (SELECT COUNT(*) FROM orders) >
                (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 FROM orders)
                AND CAST(o_totalprice AS DECIMAL(18,6)) *
                  (SELECT COUNT(*) FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey) >
                (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,6)))
                 FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)""")),

    // ---- Explicit GROUPING SETS with grouping() markers — the general
    //      form behind x2's ROLLUP / x9's CUBE; the Dataset API stops at
    //      rollup/cube so this goes through spark.sql. grouping() is cast
    //      to INT on both engines (Spark emits TINYINT, DuckDB BIGINT).
    Q("x20_grouping_sets",
      (s, d) => Sql.withView(s, orders(s, d), "graft_orders_gs") { v =>
        s.sql(s"""SELECT o_orderstatus, o_orderpriority,
                   CAST(grouping(o_orderstatus) AS INT) AS g_status,
                   CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                   COUNT(*) AS n
                 FROM $v
                 GROUP BY GROUPING SETS ((o_orderstatus),
                   (o_orderpriority), ())""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
              CAST(grouping(o_orderstatus) AS INT) AS g_status,
              CAST(grouping(o_orderpriority) AS INT) AS g_prio,
              COUNT(*) AS n
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus),
                (o_orderpriority), ())""")),

    // ---- Array-function suite over tokenized text: distinct count,
    //      membership, deterministic head slice. All per-row — no
    //      shuffle, whole-stage codegen.
    Q("x21_array_funcs",
      (s, d) => documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_contains(col("toks"), "the").as("has_the"),
          array_join(slice(sort_array(array_distinct(col("toks"))), 1, 3),
            ",").as("first3")),
      Some("""SELECT doc_id,
              CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                AS n_distinct,
              list_contains(string_split(text, ' '), 'the') AS has_the,
              array_to_string(
                list_sort(list_distinct(string_split(text, ' ')))[1:3],
                ',') AS first3
              FROM documents""")),

    // ---- posexplode: ordinal-preserving flatten (the UDTF shape with
    //      position). DuckDB has no WITH ORDINALITY; the oracle pairs
    //      each token with its 1-based subscript via unnest(range).
    Q("x23_posexplode",
      (s, d) => documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token"))),
      Some("""WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
              ix AS (
                SELECT doc_id, toks,
                  unnest(range(1, len(toks) + 1)) AS i
                FROM t)
              SELECT doc_id, CAST(i - 1 AS INT) AS pos,
                toks[i] AS token
              FROM ix""")),

    // ---- Statistical aggregate suite: correlation, covariance,
    //      sample stddev/variance, median. Both engines accumulate in
    //      double; ROUND(6) absorbs accumulation-order noise (~1e-15
    //      relative) far below the rounding grain.
    Q("x24_stats_agg",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("covar_qty_price"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(median(col("l_quantity")), 6).as("med_qty")),
      Some("""SELECT l_returnflag,
              ROUND(corr(l_quantity, l_extendedprice), 6)
                AS corr_qty_price,
              ROUND(covar_samp(l_quantity, l_extendedprice), 2)
                AS covar_qty_price,
              ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
              ROUND(var_samp(l_quantity), 6) AS var_qty,
              ROUND(median(l_quantity), 6) AS med_qty
              FROM lineitem GROUP BY 1""")),

    // ---- Fuzzy matching: all-pairs edit distance over the DISTINCT
    //      key domain — the blocking step of fuzzy dedup. The distinct
    //      set is tiny (it is the point: dedupe the domain, then join
    //      back), so the pair join is a broadcast NLJ over k², not n².
    Q("x25_fuzzy_match",
      (s, d) => {
        val types = events(s, d).select(col("event_type")).distinct()
        val a = types.select(col("event_type").as("ta"))
        val b = types.select(col("event_type").as("tb"))
        a.join(b, col("ta") < col("tb"))
          .select(col("ta"), col("tb"),
            levenshtein(col("ta"), col("tb")).as("edit_dist"))
      },
      Some("""WITH t AS (SELECT DISTINCT event_type FROM events)
              SELECT a.event_type AS ta, b.event_type AS tb,
                     levenshtein(a.event_type, b.event_type) AS edit_dist
              FROM t a JOIN t b ON a.event_type < b.event_type""")),

    // ---- ntile: equal-depth bucketing per key (quartiles of each
    //      user's event history). Deterministic under the total order
    //      (ts, event_id). Same single-exchange window shape as w2.
    Q("x17_ntile",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"),
          col("event_id"))
        events(s, d).select(col("event_id"), col("user_id"),
          ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT event_id, user_id,
              ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS quartile
              FROM events""")),

    // ---- Unpivot (wide→long melt): per-lineitem measures to rows. The
    //      relational dual of x7_pivot; a narrow Expand, no shuffle.
    Q("x18_unpivot",
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "measure", "val"),
      Some("""SELECT l_orderkey, l_linenumber, measure, val
              FROM (SELECT l_orderkey, l_linenumber,
                      CAST(l_quantity AS DOUBLE) AS quantity,
                      CAST(l_extendedprice AS DOUBLE) AS extendedprice,
                      CAST(l_discount AS DOUBLE) AS discount
                    FROM lineitem)
              UNPIVOT (val FOR measure IN (quantity, extendedprice,
                discount))""")),

    // ---- Ordered set aggregation: collect_list is unordered by
    //      contract, so the deterministic form sorts the collected array
    //      before joining — same discipline the oracle applies.
    Q("x19_sorted_collect",
      // explicit null guard on BOTH sides: Spark's collect_list drops
      // NULLs while DuckDB's list() keeps them — without the shared
      // filter a null event_type would diverge the engines
      (s, d) => events(s, d)
        .filter(col("event_type").isNotNull)
        .groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_list(col("event_type"))), ",")
          .as("types_csv"),
          count(lit(1)).as("n")),
      Some("""SELECT user_id,
              array_to_string(list_sort(list(event_type)), ',')
                AS types_csv,
              COUNT(*) AS n
              FROM events WHERE event_type IS NOT NULL
              GROUP BY user_id""")),

    // ---- Semi join: customers WITH orders in a window (EXISTS shape —
    //      no fan-out, build side broadcastable when small).
    Q("j7_semi_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_orderdate") >=
          to_timestamp(lit("1998-01-01 00:00:00")))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')""")),

    // ---- Anti join: customers WITHOUT orders in the window.
    Q("j8_anti_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_orderdate") >=
          to_timestamp(lit("1998-01-01 00:00:00")))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')""")),

    // ---- Set operators with DISTINCT semantics: customers active in
    //      both/only-one of two years. The oracle keeps the textbook
    //      INTERSECT/EXCEPT formulation; the Spark side computes the SAME
    //      relation as ONE scan + ONE aggregate — the literal operator
    //      pair costs 4 scans of orders and 2 independent shuffle-dedups,
    //      which is the first plan a 100×-scale user would have to
    //      rewrite. Presence in each year collapses to a conditional MAX
    //      per customer (map-side combinable), and the both/only labels
    //      are derived from the two presence bits.
    Q("x8_set_ops",
      (s, d) => {
        val t96 = to_timestamp(lit("1996-01-01 00:00:00"))
        val t97 = to_timestamp(lit("1997-01-01 00:00:00"))
        val t98 = to_timestamp(lit("1998-01-01 00:00:00"))
        orders(s, d)
          .filter(col("o_orderdate") >= t96 && col("o_orderdate") < t98)
          .groupBy(col("o_custkey").as("cust"))
          .agg(
            max(when(col("o_orderdate") < t97, 1).otherwise(0)).as("in96"),
            max(when(col("o_orderdate") >= t97, 1).otherwise(0)).as("in97"))
          .filter(col("in96") === 1)
          .select(col("cust"),
            when(col("in97") === 1, lit("both"))
              .otherwise(lit("only_1996")).as("which"))
      },
      Some("""WITH c96 AS (SELECT o_custkey AS cust FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
              c97 AS (SELECT o_custkey AS cust FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
              SELECT cust, 'both' AS which
              FROM (SELECT cust FROM c96 INTERSECT SELECT cust FROM c97)
              UNION ALL
              SELECT cust, 'only_1996'
              FROM (SELECT cust FROM c96 EXCEPT SELECT cust FROM c97)""")),

    // ---- CUBE: all grouping-set combinations.
    Q("x9_cube_agg",
      (s, d) => orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders
              GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // ---- String-function suite over one projection (upper/lower, trim,
    //      pad, substring, replace, concat_ws, length).
    Q("x10_string_funcs",
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        lower(col("c_mktsegment")).as("lower_seg"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        regexp_replace(col("c_name"), "Customer", "Cust")
          .as("short_name"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
        length(col("c_name")).as("name_len")),
      Some("""SELECT c_custkey,
              upper(c_name) AS upper_name,
              lower(c_mktsegment) AS lower_seg,
              substring(c_name, 1, 8) AS name_prefix,
              lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
              regexp_replace(c_name, 'Customer', 'Cust', 'g')
                AS short_name,
              concat_ws('|', c_name, c_mktsegment) AS joined,
              CAST(length(c_name) AS INT) AS name_len
              FROM customer""")),

    // ---- Date-function suite (year/month/day extraction, date
    //      difference in days, month arithmetic via truncation).
    Q("x11_date_funcs",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        datediff(to_timestamp(lit("2002-01-01 00:00:00")),
          col("o_orderdate")).as("days_to_2002"),
        date_trunc("quarter", col("o_orderdate")).as("order_quarter")),
      Some("""SELECT o_orderkey,
              CAST(year(o_orderdate) AS INT) AS y,
              CAST(month(o_orderdate) AS INT) AS m,
              CAST(day(o_orderdate) AS INT) AS dom,
              CAST(date_diff('day', o_orderdate,
                TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
              date_trunc('quarter', o_orderdate) AS order_quarter
              FROM orders""")),

    // ---- Pivot: per-user event-type counts as columns. Oracle via
    //      conditional aggregation (the portable spelling of PIVOT).
    Q("x7_pivot",
      (s, d) => events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L),
      Some("""SELECT user_id,
              COUNT(*) FILTER (event_type = 'click') AS click,
              COUNT(*) FILTER (event_type = 'view') AS view,
              COUNT(*) FILTER (event_type = 'purchase') AS purchase,
              COUNT(*) FILTER (event_type = 'signup') AS signup,
              COUNT(*) FILTER (event_type = 'error') AS error
              FROM events GROUP BY 1""")),

    // ---- Window value functions with explicit full-partition frames
    //      (the default RANGE..CURRENT frame makes last_value return the
    //      current row — the classic gotcha; both sides pin the frame).
    Q("x15_window_values",
      (s, d) => {
        val ordered = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val full = ordered.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        events(s, d).select(col("event_id"), col("user_id"),
          first(col("event_type")).over(full).as("first_type"),
          last(col("event_type")).over(full).as("last_type"),
          round(col("value") - first(col("value")).over(full), 6)
            .as("drift_from_first"))
      },
      Some("""SELECT event_id, user_id,
              first_value(event_type) OVER w AS first_type,
              last_value(event_type) OVER w AS last_type,
              ROUND(value - first_value(value) OVER w, 6)
                AS drift_from_first
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)""")),

    // ---- Exact percentiles per group (continuous interpolation — the
    //      same method in both engines); approx_percentile is the sketch
    //      variant at scale.
    Q("x14_percentiles",
      (s, d) => events(s, d).groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n")),
      Some("""SELECT event_type,
              ROUND(quantile_cont(value, 0.5), 6) AS p50,
              ROUND(quantile_cont(value, 0.9), 6) AS p90,
              COUNT(*) AS n
              FROM events GROUP BY 1""")),

    // ---- Sessionization: 30-minute-gap sessions per user — the classic
    //      lag → gap-flag → cumulative-sum session id, then per-session
    //      aggregates. One shuffle on user_id shared by both windows.
    //      (The streaming variant uses the built-in session_window —
    //      see graft.streaming.StreamIngest.)
    Q("x13_sessionize",
      (s, d) => {
        val byTime = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val gapSecs = 1800L
        val newSess = when(lag(col("ts"), 1).over(byTime).isNull
          || unix_timestamp(col("ts"))
            - unix_timestamp(lag(col("ts"), 1).over(byTime)) > gapSecs, 1L)
          .otherwise(0L)
        events(s, d)
          .withColumn("sess_id", sum(newSess).over(byTime))
          .groupBy("user_id", "sess_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("sess_start"),
            max(col("ts")).as("sess_end"))
      },
      Some("""WITH flagged AS (
                SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                  -- FLOOR(epoch) matches the whole-second
                  -- unix_timestamp on the Spark side; fractional gaps
                  -- would flip boundaries in the (1800, 1801)s window
                  CASE WHEN lag(ts, 1) OVER w IS NULL
                         OR FLOOR(epoch(CAST(ts AS TIMESTAMP)))
                          - FLOOR(epoch(CAST(lag(ts, 1) OVER w
                              AS TIMESTAMP)))
                          > 1800
                       THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              numbered AS (
                SELECT user_id, ts,
                  CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS BIGINT) AS sess_id
                FROM flagged)
              SELECT user_id, sess_id, COUNT(*) AS n_events,
                MIN(ts) AS sess_start, MAX(ts) AS sess_end
              FROM numbered GROUP BY 1, 2""")),

    // ---- Range (interval) join: clicks within ±1 hour of each purchase
    //      by the same user. The naive formulation is an inequality join
    //      (quadratic per user); the scale shape is BANDING — bin both
    //      sides into interval-width buckets, equi-join on
    //      (user, bucket ∈ {b−1, b, b+1}), then apply the exact predicate.
    //      Each left row expands to 3 bucket probes regardless of data
    //      size. Oracle = the plain inequality join.
    Q("x12_range_join",
      (s, d) => {
        val ev = events(s, d)
        val hour = 3600L
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"),
            (unix_timestamp(col("ts")) / hour).cast("long").as("b"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"),
            (unix_timestamp(col("ts")) / hour).cast("long").as("cb"))
        val probes = purchases.withColumn("cb",
          explode(array(col("b") - 1, col("b"), col("b") + 1)))
        probes.join(clicks, Seq("user_id", "cb"))
          .filter(abs(unix_timestamp(col("c_ts"))
            - unix_timestamp(col("p_ts"))) <= hour)
          .groupBy("purchase_id", "user_id")
          .agg(count(lit(1)).as("n_clicks_within_1h"))
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
              COUNT(*) AS n_clicks_within_1h
              FROM events p JOIN events c
                ON p.user_id = c.user_id
                AND c.event_type = 'click'
                AND abs(FLOOR(epoch(CAST(c.ts AS TIMESTAMP)))
                      - FLOOR(epoch(CAST(p.ts AS TIMESTAMP)))) <= 3600
              WHERE p.event_type = 'purchase'
              GROUP BY 1, 2""")),

    // ---- As-of join: for each purchase event, the user's latest click
    //      at-or-before it. Implemented with the union + running-last
    //      window — one sort-shuffle on (user, time), O(n log n), instead
    //      of the quadratic per-key range join; this is the 100 TB shape.
    //      The right side is deduplicated to one click per (user, ts)
    //      (arg-max event_id) so tie resolution is deterministic and
    //      matches DuckDB's ASOF semantics on a unique time axis.
    //
    //      NOTE for readers picking an as-of shape to copy: prefer
    //      `x28_asof_join` below — same linear union+window family, but
    //      with ONE window pass carrying a struct payload (this query
    //      runs two `last(..)` windows over the same frame), an EXPLICIT
    //      isNotNull key/time contract (here it is fixture-accidental),
    //      and an oracle that is DuckDB's native ASOF JOIN rather than a
    //      hand-rolled re-implementation. The two differ in direction
    //      and fixture (x4: purchase → latest click; x28: click →
    //      latest purchase), so both stay gated — but new code should
    //      copy x28's shape.
    Q("x4_asof_join",
      (s, d) => {
        val ev = events(s, d)
        val clickW = Window.partitionBy("user_id", "ts")
          .orderBy(desc("event_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .withColumn("rn", row_number().over(clickW))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"))
        val u = clicks
          .withColumn("purchase_id", lit(null).cast("long"))
          .withColumn("side", lit(0))
          .unionByName(purchases
            .withColumn("click_id", lit(null).cast("long"))
            .withColumn("click_value", lit(null).cast("double"))
            .withColumn("side", lit(1)))
        // clicks sort before purchases at equal ts → inclusive (>=) as-of
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("side"), col("purchase_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("asof_click_id",
            last(col("click_id"), ignoreNulls = true).over(w))
          .withColumn("asof_click_value",
            last(col("click_value"), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("purchase_id"), col("user_id"), col("ts"),
            col("asof_click_id"), col("asof_click_value"))
      },
      Some("""WITH clicks AS (
                -- dedup on the MICROSECOND-cast ts: Spark reads the
                -- ns-precision column truncated to micros, so two
                -- clicks in the same microsecond are one tie-class
                -- there — partitioning on raw ns ts would keep both
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       event_id AS click_id,
                       value AS click_value,
                       ROW_NUMBER() OVER (
                         PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                         ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'),
              dedup AS (SELECT user_id, ts, click_id, click_value
                        FROM clicks WHERE rn = 1),
              purchases AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       event_id AS purchase_id
                FROM events WHERE event_type = 'purchase')
              SELECT p.purchase_id, p.user_id, p.ts,
                     d.click_id AS asof_click_id,
                     d.click_value AS asof_click_value
              FROM purchases p ASOF LEFT JOIN dedup d
                ON p.user_id = d.user_id AND p.ts >= d.ts""")),

    // ---- x26: CDC upsert (MERGE INTO semantics as a relational plan):
    //      a change batch of updates + inserts merged into a snapshot
    //      via full-outer join + change-wins COALESCE. At 100 TB this is
    //      the incremental-maintenance primitive the reference's daily
    //      full rebuild lacks: the snapshot side shuffles once on the
    //      merge key (or not at all if both sides are bucketed on it —
    //      sources/Bucketing), and the change batch is the small side.
    //      Delete handling is the same plan with a tombstone filter
    //      after the coalesce.
    Q("x26_upsert",
      (s, d) => {
        val snap = customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal")
        val updates = snap.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("u_key"),
            col("c_name").as("u_name"),
            (col("c_acctbal") + 100.0).as("u_bal"))
        val inserts = s.range(5).select(
          (col("id") + 9000000L).as("u_key"),
          concat(lit("Customer#new_"), col("id")).as("u_name"),
          lit(0.0).as("u_bal"))
        val changes = updates.unionByName(inserts)
        snap.join(changes, col("c_custkey") === col("u_key"),
            "full_outer")
          .select(
            coalesce(col("c_custkey"), col("u_key")).as("merged_key"),
            coalesce(col("u_name"), col("c_name")).as("merged_name"),
            coalesce(col("u_bal"), col("c_acctbal")).as("merged_bal"))
      },
      Some("""WITH updates AS (
                SELECT c_custkey AS u_key, c_name AS u_name,
                  c_acctbal + 100.0 AS u_bal
                FROM customer WHERE c_custkey % 10 = 0),
              inserts AS (
                SELECT 9000000 + i AS u_key,
                  'Customer#new_' || i AS u_name,
                  CAST(0.0 AS DOUBLE) AS u_bal
                FROM range(5) t(i)),
              changes AS (SELECT * FROM updates
                          UNION ALL SELECT * FROM inserts)
              SELECT COALESCE(c_custkey, u_key) AS merged_key,
                COALESCE(u_name, c_name) AS merged_name,
                COALESCE(u_bal, c_acctbal) AS merged_bal
              FROM customer FULL OUTER JOIN changes
                ON c_custkey = u_key""")),

    // ---- AS-OF join: for each click, the same user's most recent
    //      purchase at-or-before it. Spark has no ASOF operator; the
    //      naive formulation is an inequality join (quadratic per user,
    //      then an argmax). The SCALE shape is the union+window
    //      composition: tag both sides, union them, and take the last
    //      non-null right payload over a (key, time)-ordered running
    //      window — TWO exchanges total (the right-side dedup aggregate
    //      on (key, time), then the window's sort-shuffle on the key),
    //      zero joins, linear in rows. Right rows sort BEFORE left rows
    //      at equal times (is_left tiebreak) to realize the <= as-of
    //      bound; the right side is pre-deduplicated to one row per
    //      (key, time) (max event_id) so tie resolution is
    //      engine-independent, and BOTH payload columns ride in one
    //      struct through a SINGLE window pass so they always come from
    //      the same matched row. NULL keys/times are filtered on both
    //      engines: ASOF's equality/inequality predicates never match
    //      NULL, while Spark's window would group NULL keys together —
    //      the explicit filter makes the null contract identical
    //      instead of fixture-accidental. The oracle is DuckDB's NATIVE
    //      ASOF LEFT JOIN — two entirely different evaluation
    //      strategies, one relation.
    Q("x28_asof_join",
      (s, d) => {
        val ev = events(s, d)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("k"), col("ts").as("t"),
            col("event_id").as("click_id"), lit(1).as("is_left"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("k"), col("ts").as("t"))
          .agg(max(col("event_id")).as("purchase_id"))
          .withColumn("is_left", lit(0))
        val tagged = clicks
          .withColumn("purchase_id", lit(null).cast("long"))
          .unionByName(purchases
            .withColumn("click_id", lit(null).cast("long")))
        val w = Window.partitionBy("k").orderBy(col("t"), col("is_left"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("asof", last(
            when(col("is_left") === 0,
              struct(col("purchase_id"), col("t"))),
            ignoreNulls = true).over(w))
          .filter(col("is_left") === 1)
          .select(col("click_id"), col("k").as("user_id"),
            col("t").as("click_ts"),
            col("asof.purchase_id").as("purchase_id"),
            col("asof.t").as("purchase_ts"))
      },
      Some("""WITH clicks AS (
                SELECT event_id AS click_id, user_id,
                  CAST(ts AS TIMESTAMP) AS click_ts
                FROM events
                WHERE event_type = 'click'
                  AND user_id IS NOT NULL AND ts IS NOT NULL),
              purchases AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
                  MAX(event_id) AS purchase_id
                FROM events
                WHERE event_type = 'purchase'
                  AND user_id IS NOT NULL AND ts IS NOT NULL
                GROUP BY 1, 2)
              SELECT c.click_id, c.user_id, c.click_ts,
                p.purchase_id, p.purchase_ts
              FROM clicks c ASOF LEFT JOIN purchases p
                ON c.user_id = p.user_id
                AND p.purchase_ts <= c.click_ts""")),

    // ---- x29: ordered event funnel (view → click → purchase, strictly
    //      increasing event time) — the sequence-analytics operator
    //      behind conversion reporting. The per-user recurrence (stage
    //      k's earliest time depends on stage k-1's) is unrolled into
    //      one keyed aggregate PER STAGE: filter to the stage's type,
    //      join to the previous stage's per-user frontier, keep rows
    //      strictly later, take min(ts). Every aggregate and every join
    //      is keyed on user_id, so at scale the plan is (funnel length)
    //      sequential hash aggregates over ONE key — all partial
    //      (map-side combined), all linear, no window over the full
    //      event set and no per-user sorted scan. Depth is derived from
    //      frontier nullness after two left joins of user-level (small)
    //      relations. NULL user/ts rows are filtered up front on both
    //      engines so the join/grouping null contracts are identical.
    Q("x29_funnel_steps",
      (s, d) => {
        val ev = events(s, d)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("ts"), col("event_type"))
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t_view"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min("ts").as("t_click"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy("user_id").agg(min("ts").as("t_purchase"))
        s1.join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"),
            col("t_purchase"),
            when(col("t_purchase").isNotNull, 3)
              .when(col("t_click").isNotNull, 2)
              .otherwise(1).as("depth"))
      },
      Some("""WITH ev AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
              s1 AS (
                SELECT user_id, min(ts) AS t_view
                FROM ev WHERE event_type = 'view' GROUP BY 1),
              s2 AS (
                SELECT e.user_id, min(e.ts) AS t_click
                FROM ev e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t_view
                GROUP BY 1),
              s3 AS (
                SELECT e.user_id, min(e.ts) AS t_purchase
                FROM ev e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
                GROUP BY 1)
              SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
                CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                          WHEN s2.t_click IS NOT NULL THEN 2
                          ELSE 1 END AS INT) AS depth
              FROM s1 LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)""")),

    // ---- x30: weekly retention cohorts — cohort = the Monday-truncated
    //      week of a user's first event; each (cohort, week-offset) cell
    //      counts the distinct users active that week. Two keyed
    //      aggregates (user frontier, then the cohort cell) plus one
    //      user-keyed join of the event stream to its own per-user
    //      min — the same one-key co-partitioned shape as x29, linear in
    //      events. Both engines truncate weeks to Monday 00:00, and the
    //      offset divides an exact multiple of 7 days, so the cell keys
    //      are engine-independent. COUNT(DISTINCT user) per cell
    //      shuffles (cohort, offset, user) once — expand-free because
    //      it is the only distinct aggregate in the query.
    Q("x30_retention_cohorts",
      (s, d) => {
        val ev = events(s, d)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"),
            date_trunc("week", col("ts")).as("wk"))
        val firstWk = ev.groupBy("user_id").agg(min("wk").as("w0"))
        ev.join(firstWk, "user_id")
          .groupBy(col("w0").as("cohort_week"),
            (datediff(col("wk"), col("w0")) / 7).cast("int")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("users"))
      },
      Some("""WITH ev AS (
                -- DuckDB's week-truncation yields DATE; Spark's yields
                -- TIMESTAMP — cast at the source so every derived
                -- column (min, join keys, output) carries one type
                SELECT user_id,
                  CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                    AS TIMESTAMP) AS wk
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
              firstwk AS (
                SELECT user_id, min(wk) AS w0 FROM ev GROUP BY 1)
              SELECT f.w0 AS cohort_week,
                CAST(datediff('day', f.w0, e.wk) / 7 AS INT)
                  AS week_offset,
                count(DISTINCT e.user_id) AS users
              FROM ev e JOIN firstwk f USING (user_id)
              GROUP BY 1, 2"""))
  )
}
