package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._
import Parity._

/** The remainder of the TPC-H workload, adapted to the reduced schema
  * (no partsupp, no commit/receipt dates, no shipmode/phone/comment —
  * each missing column is re-expressed on an available one with the same
  * query SHAPE, which is what exercises the planner: conditional
  * aggregation ratios, outer-join count distributions, correlated
  * averages, nested semi-joins, global-scalar thresholds, disjunctive
  * pushdown).
  *
  * With ClassicQueries (Q1-Q5, Q7, Q18, Q21) this completes all 22 TPC-H
  * query shapes. Scale discipline as in ClassicQueries: dims broadcast,
  * facts shuffle at most once on their join key, every aggregate
  * map-side-combinable, decimal parity per ops/Parity.
  */
object ClassicQueries2 extends QueryModule {

  private def ts(x: String) = to_timestamp(lit(x))
  private val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Decimal-exact conditional sum: both branches DECIMAL(18,6) so the
    * aggregate is accumulation-order-independent (Parity discipline). */
  private def decSumIf(cond: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column) =
    outDec(sum(when(cond, dec(c)).otherwise(dec(lit(0.0)))))
  private def sqlDecSumIf(cond: String, e: String): String =
    s"""CAST(SUM(CASE WHEN $cond THEN CAST($e AS DECIMAL(18,6))
       ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS DOUBLE)"""

  def all: Seq[Q] = Seq(

    // ---- Q6: forecasting revenue change — the pure scan-aggregate. All
    //      three predicates push to the parquet scan; no shuffle at all
    //      (single-row global aggregate, partial-combined).
    Q("q6_forecast_revenue",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(decSum(col("l_extendedprice") * col("l_discount"))
          .as("revenue")),
      Some(s"""SELECT ${sqlDecSum("l_extendedprice * l_discount")} AS revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                AND l_discount >= 0.05 AND l_discount <= 0.07
                AND l_quantity < 24""")),

    // ---- Q8: national market share — the conditional-aggregation ratio.
    //      Selectivity first (the q5 discipline): part-type and
    //      region-of-customer restrictions walk down as broadcast joins
    //      before any fact-fact shuffle; the numerator/denominator pair
    //      is ONE aggregate pass with a decimal CASE sum.
    Q("q8_market_share",
      (s, d) => {
        val p = part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")
        val n = nation(s, d)
        val su = supplier(s, d).join(broadcast(n),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val asiaN = n.join(
            broadcast(region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("asia_nationkey"))
        val cu = customer(s, d).join(broadcast(asiaN),
            col("c_nationkey") === col("asia_nationkey"))
          .select("c_custkey")
        val o = orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1998-01-01 00:00:00"))
          .join(cu, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
        val l = lineitem(s, d)
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .groupBy(col("o_year"))
          .agg(round(
            decSumIf(col("supp_nation") === "NATION_18", vol) /
              decSum(vol), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      Some(s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                ROUND(${sqlDecSumIf("n1.n_name = 'NATION_18'",
                  "l_extendedprice * (1 - l_discount)")} /
                  ${sqlDecSum("l_extendedprice * (1 - l_discount)")},
                  6) AS mkt_share
              FROM lineitem
              JOIN part ON p_partkey = l_partkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation n1 ON n1.n_nationkey = s_nationkey
              JOIN nation n2 ON n2.n_nationkey = c_nationkey
              JOIN region ON r_regionkey = n2.n_regionkey
              WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY 1 ORDER BY 1""")),

    // ---- Q9: product-type profit — p_retailprice*0.5 stands in for the
    //      missing ps_supplycost; the profit measure is an exact decimal
    //      difference so the group sums stay order-independent. The only
    //      shuffle is lineitem⋈orders (both fact-sized); part and
    //      supplier⋈nation ride as broadcasts.
    Q("q9_product_profit",
      (s, d) => {
        val p = part(s, d).filter(col("p_name").like("%widget%"))
          .select(col("p_partkey"), col("p_retailprice"))
        val su = supplier(s, d).join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        val o = orders(s, d)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
        val l = lineitem(s, d)
        val amount = dec(vol) -
          dec(col("p_retailprice") * lit(0.5) * col("l_quantity"))
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("nation"), col("o_year"))
          .agg(outDec(sum(amount)).as("sum_profit"))
          .orderBy(asc("nation"), desc("o_year"))
      },
      Some("""SELECT n_name AS nation,
                CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                CAST(SUM(
                  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) -
                  CAST(p_retailprice * 0.5 * l_quantity AS DECIMAL(18,6)))
                  AS DOUBLE) AS sum_profit
              FROM lineitem
              JOIN part ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              JOIN orders ON o_orderkey = l_orderkey
              WHERE p_name LIKE '%widget%'
              GROUP BY 1, 2 ORDER BY 1, 2 DESC""")),

    // ---- Q10: returned-item reporting — top-20 customers by lost
    //      revenue in a half-year window. Returnflag filter prunes the
    //      fact before the join; customer/nation broadcast; the final
    //      TakeOrderedAndProject carries a custkey tiebreak.
    Q("q10_returned_items",
      (s, d) => {
        val o = orders(s, d)
          .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
            col("o_orderdate") < ts("1997-07-01 00:00:00"))
          .select("o_orderkey", "o_custkey")
        val l = lineitem(s, d).filter(col("l_returnflag") === "R")
        val c = customer(s, d)
        val n = nation(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(decSum(vol).as("revenue"))
          .orderBy(desc("revenue"), asc("c_custkey")).limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
                ${sqlDecSum("l_extendedprice * (1 - l_discount)")} AS revenue
              FROM lineitem
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation ON n_nationkey = c_nationkey
              WHERE l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
              GROUP BY 1, 2, 3, 4
              ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- Q11: important value concentration — per-part value vs a
    //      global-scalar threshold. The one-row total is broadcast back
    //      over the per-part aggregate (no second shuffle); both sides
    //      derive the threshold from the identical decimal sum so the
    //      strict > compares identical doubles.
    Q("q11_important_value",
      (s, d) => {
        val n7 = nation(s, d).filter(col("n_name") === "NATION_7")
        val su = supplier(s, d).join(broadcast(n7),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val l = lineitem(s, d).join(su,
          col("l_suppkey") === col("s_suppkey"))
        val perPart = l.groupBy(col("l_partkey"))
          .agg(decSum(vol).as("part_value"))
        val total = l.agg((decSum(vol) * lit(0.001)).as("threshold"))
        perPart.crossJoin(broadcast(total))
          .filter(col("part_value") > col("threshold"))
          .select(col("l_partkey"), col("part_value"))
          .orderBy(desc("part_value"), asc("l_partkey"))
      },
      Some(s"""SELECT l_partkey,
                ${sqlDecSum("l_extendedprice * (1 - l_discount)")}
                  AS part_value
              FROM lineitem
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              WHERE n_name = 'NATION_7'
              GROUP BY 1
              HAVING ${sqlDecSum("l_extendedprice * (1 - l_discount)")} > (
                SELECT ${sqlDecSum("l_extendedprice * (1 - l_discount)")}
                  * 0.001
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_7')
              ORDER BY part_value DESC, l_partkey""")),

    // ---- Q12: priority class by line status (l_linestatus stands in for
    //      the missing l_shipmode) — the two-bucket conditional count over
    //      a date-banded fact join.
    Q("q12_priority_class",
      (s, d) => {
        val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val l = lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
            col("l_shipdate") < ts("1998-01-01 00:00:00"))
          .select("l_orderkey", "l_linestatus")
        val o = orders(s, d).select("o_orderkey", "o_orderpriority")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
              FROM lineitem JOIN orders ON o_orderkey = l_orderkey
              WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY 1 ORDER BY 1""")),

    // ---- Q13: customer order-count distribution — the outer-join-count
    //      histogram. The right side is pre-filtered (ON-clause semantics),
    //      the first aggregate shuffles on c_custkey, the second on the
    //      tiny count domain.
    Q("q13_customer_distribution",
      (s, d) => {
        val o = orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select("o_orderkey", "o_custkey")
        val counts = customer(s, d).select("c_custkey")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        counts.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist
              FROM (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
                GROUP BY 1) t
              GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // ---- Q14: promo revenue ratio — one month of the fact against the
    //      broadcast part dim, numerator/denominator in a single pass.
    Q("q14_promo_revenue",
      (s, d) => {
        val l = lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1997-03-01 00:00:00") &&
            col("l_shipdate") < ts("1997-04-01 00:00:00"))
        val p = part(s, d).select("p_partkey", "p_type")
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            decSumIf(col("p_type") === "PROMO", vol) / decSum(vol), 6)
            .as("promo_revenue"))
      },
      Some(s"""SELECT ROUND(100.0 *
                ${sqlDecSumIf("p_type = 'PROMO'",
                  "l_extendedprice * (1 - l_discount)")} /
                ${sqlDecSum("l_extendedprice * (1 - l_discount)")},
                6) AS promo_revenue
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""")),

    // ---- Q15: top supplier — a named revenue aggregate referenced twice
    //      (join input + scalar MAX). Runs through SQL so Catalyst plans
    //      the scalar subquery as its own stage; equality on doubles is
    //      safe because both engines derive total_revenue identically
    //      from the exact decimal sum. (A window-max over one pass is the
    //      alternative that avoids the double CTE scan; kept as the
    //      scalar-subquery shape deliberately — that is the Q15 workout.)
    Q("q15_top_supplier",
      (s, d) => Sql.withView(s, lineitem(s, d), "graft_l_q15") { vl =>
        Sql.withView(s, supplier(s, d), "graft_s_q15") { vs =>
          s.sql(s"""WITH revenue AS (
                     SELECT l_suppkey AS supplier_no,
                       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
                     FROM $vl
                     WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                     GROUP BY 1)
                   SELECT s_suppkey, s_name, total_revenue
                   FROM $vs JOIN revenue ON s_suppkey = supplier_no
                   WHERE total_revenue =
                     (SELECT MAX(total_revenue) FROM revenue)""")
        }
      },
      Some("""WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                GROUP BY 1)
              SELECT s_suppkey, s_name, total_revenue
              FROM supplier JOIN revenue ON s_suppkey = supplier_no
              WHERE total_revenue =
                (SELECT MAX(total_revenue) FROM revenue)""")),

    // ---- Q16: supplier-count distribution — COUNT(DISTINCT) per part
    //      attribute triple, with a NOT IN anti-join (negative-balance
    //      suppliers stand in for the missing complaint-comment filter).
    Q("q16_supplier_cnt",
      (s, d) => {
        val p = part(s, d).filter(col("p_brand") =!= "Brand#13" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        val badSupp = supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        lineitem(s, d).select("l_partkey", "l_suppkey")
          .join(badSupp,
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
            asc("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
                COUNT(DISTINCT l_suppkey) AS supplier_cnt
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
                AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
                AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              GROUP BY 1, 2, 3
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ---- Q17: small-quantity revenue — the correlated-average filter.
    //      Through SQL so Catalyst decorrelates the per-part AVG into an
    //      aggregate + join (PlanSpec pins the decorrelation); the average
    //      is sum/count per the Parity discipline, never a native AVG.
    Q("q17_small_qty_revenue",
      (s, d) => Sql.withView(s, lineitem(s, d), "graft_l_q17") { vl =>
        Sql.withView(s, part(s, d), "graft_p_q17") { vp =>
          s.sql(s"""SELECT ROUND(
                     CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)))
                       AS DOUBLE) / 7.0, 4) AS avg_yearly
                   FROM $vl l JOIN $vp p ON p.p_partkey = l.l_partkey
                   WHERE p.p_brand = 'Brand#21'
                     AND l.l_quantity < (
                       SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
                       FROM $vl l2 WHERE l2.l_partkey = l.l_partkey)""")
        }
      },
      Some("""SELECT ROUND(
                CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)))
                  AS DOUBLE) / 7.0, 4) AS avg_yearly
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_brand = 'Brand#21'
                AND l.l_quantity < (
                  SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity
                      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
                  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")),

    // ---- Q19: discounted revenue — the disjunctive three-branch
    //      predicate. The join key is shared across branches so the OR
    //      stays a residual filter over one broadcast hash join (never a
    //      nested-loop); per-branch part filters cannot push below the
    //      join because each pairs with a lineitem range.
    Q("q19_disjunctive_revenue",
      (s, d) => {
        val p = part(s, d).select("p_partkey", "p_brand", "p_size")
        val branch = (col("p_brand") === "Brand#12" &&
            col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" &&
            col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        lineitem(s, d)
          .join(p, col("l_partkey") === col("p_partkey"))
          .filter(branch)
          .agg(decSum(vol).as("revenue"))
      },
      Some(s"""SELECT ${sqlDecSum("l_extendedprice * (1 - l_discount)")}
                AS revenue
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                  AND l_quantity BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                  AND l_quantity BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                  AND l_quantity BETWEEN 20 AND 30)""")),

    // ---- Q20: excess-inventory suppliers — the nested semi-join chain:
    //      red parts → per-(supplier,part) shipped-quantity aggregate over
    //      one year → HAVING threshold → semi-join into the
    //      nation-filtered supplier dim. The decimal qty sum keeps the
    //      HAVING boundary exact on both engines.
    Q("q20_excess_inventory",
      (s, d) => {
        val redParts = part(s, d).filter(col("p_name").like("red%"))
          .select("p_partkey")
        val qualifying = lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
            col("l_shipdate") < ts("1998-01-01 00:00:00"))
          .join(redParts, col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(dec(col("l_quantity"))).as("qty"))
          .filter(col("qty") > 50)
          .select(col("l_suppkey"))
        val n = nation(s, d).filter(col("n_name") === "NATION_3")
        supplier(s, d)
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(qualifying, col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name
              FROM supplier
              JOIN nation ON n_nationkey = s_nationkey
              WHERE n_name = 'NATION_3'
                AND s_suppkey IN (
                  SELECT l_suppkey
                  FROM lineitem JOIN part ON p_partkey = l_partkey
                  WHERE p_name LIKE 'red%'
                    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                  GROUP BY l_suppkey, l_partkey
                  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50)
              ORDER BY s_suppkey""")),

    // ---- Q22: global sales opportunity — anti-join against orders plus
    //      a global-average threshold (the last-2-digits "country code"
    //      stands in for the missing c_phone prefix). The one-row average
    //      broadcasts; the anti-join shuffles customer once.
    Q("q22_global_sales",
      (s, d) => {
        val codes = Seq("11", "17", "23", "29", "31", "41", "47")
        val c = customer(s, d)
          .withColumn("cntrycode", expr("right(c_name, 2)"))
          .filter(col("cntrycode").isin(codes: _*))
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg((decSum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(orders(s, d).select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"),
            decSum(col("c_acctbal")).as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some(s"""WITH cust AS (
                SELECT c_custkey, c_acctbal, RIGHT(c_name, 2) AS cntrycode
                FROM customer
                WHERE RIGHT(c_name, 2) IN
                  ('11','17','23','29','31','41','47'))
              SELECT cntrycode, COUNT(*) AS numcust,
                ${sqlDecSum("c_acctbal")} AS totacctbal
              FROM cust
              WHERE c_acctbal > (
                  SELECT ${sqlDecSum("c_acctbal")} / COUNT(*)
                  FROM cust WHERE c_acctbal > 0)
                AND NOT EXISTS
                  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              GROUP BY 1 ORDER BY 1"""))
  )
}
