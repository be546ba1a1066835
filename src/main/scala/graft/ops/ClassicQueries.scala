package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import Parity._

/** Classic multi-way analytics over the star schema — the join-planning
  * workout: selective dimension filters, broadcast chains over
  * region→nation→supplier/customer, fact-to-fact equi-joins, and ranked
  * aggregates. Catalyst reorders and broadcasts these; at 100 TB the
  * fact-side joins shuffle on the fact keys once, dims stay broadcast.
  */
object ClassicQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // ---- TPC-H Q3 shape: shipping priority.
    Q("q3_shipping_priority",
      (s, d) => {
        val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = orders(s, d).filter(col("o_orderdate") <
          to_timestamp(lit("1998-01-01 00:00:00")))
        val l = lineitem(s, d).filter(col("l_shipdate") >
          to_timestamp(lit("1998-01-01 00:00:00")))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey")).limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              ${sqlDecSum("l_extendedprice * (1 - l_discount)")} AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY 1, 2, 3
              ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- TPC-H Q5 shape: revenue by nation inside one region, suppliers
    //      and customers co-national. Six-way join. Selectivity first:
    //      Catalyst won't reorder the fact-fact join below the region
    //      filter without CBO stats, so the plan applies the ASIA
    //      restriction bottom-up by hand — region→nation→customer stay
    //      broadcast, orders is pre-filtered to ASIA customers (~1/5
    //      survive), and only then does lineitem join. The dominant
    //      lineitem⋈orders exchange therefore carries a fifth of the
    //      orders rows it carried when the facts joined first; at 100 TB
    //      (where customer outgrows broadcast) the same shape holds with
    //      the customer join becoming a shuffle on o_custkey — still
    //      strictly cheaper than shuffling unfiltered lineitem⋈orders.
    Q("q5_local_supplier",
      (s, d) => {
        val r = region(s, d).filter(col("r_name") === "ASIA")
        val n = nation(s, d)
        val asiaNation = n.join(broadcast(r),
            n("n_regionkey") === r("r_regionkey"))
          .select(n("n_nationkey"), n("n_name"))
        val c = customer(s, d)
        val asiaCust = c.join(broadcast(asiaNation),
            c("c_nationkey") === asiaNation("n_nationkey"))
          .select(c("c_custkey"), c("c_nationkey"), asiaNation("n_name"))
        val o = orders(s, d)
        val asiaOrders = o.join(asiaCust,
            o("o_custkey") === asiaCust("c_custkey"))
          .select(o("o_orderkey"), asiaCust("c_nationkey"),
            asiaCust("n_name"))
        val l = lineitem(s, d)
        val su = supplier(s, d)
        l.join(asiaOrders, l("l_orderkey") === asiaOrders("o_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey")
            && col("c_nationkey") === su("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some(s"""SELECT n_name,
              ${sqlDecSum("l_extendedprice * (1 - l_discount)")} AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
                AND s_nationkey = c_nationkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
              GROUP BY 1 ORDER BY revenue DESC, n_name""")),

    // ---- TPC-H Q1 shape: the pricing-summary scan-aggregate — one pass
    //      over the fact, grouped by two low-cardinality flags, with the
    //      canonical chained measures. Decimal discipline: sums aggregate
    //      in DECIMAL(18,6) then cast DOUBLE; averages are decimal-sum /
    //      count (identical double division on both engines — a native
    //      AVG would be accumulation-order-dependent).
    Q("q1_pricing_summary",
      (s, d) => {
        val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
        lineitem(s, d)
          .filter(col("l_shipdate") <=
            to_timestamp(lit("2000-01-01 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_base_price"),
            decSum(disc).as("sum_disc_price"),
            decSum(disc * (lit(1) + col("l_tax"))).as("sum_charge"),
            (decSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (decSum(col("l_extendedprice")) / count(lit(1)))
              .as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(asc("l_returnflag"), asc("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              ${sqlDecSum("l_quantity")} AS sum_qty,
              ${sqlDecSum("l_extendedprice")} AS sum_base_price,
              ${sqlDecSum("l_extendedprice * (1 - l_discount)")}
                AS sum_disc_price,
              ${sqlDecSum(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
                AS sum_charge,
              ${sqlDecSum("l_quantity")} / COUNT(*) AS avg_qty,
              ${sqlDecSum("l_extendedprice")} / COUNT(*) AS avg_price,
              COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- TPC-H Q4 shape: order-priority checking — an EXISTS semi-join
    //      with a non-equi residual (a line shipped well after the order
    //      date stands in for the schema's missing commit/receipt pair).
    //      The semi-join keeps orders narrow; the count rolls up by
    //      priority.
    Q("q4_order_priority",
      (s, d) => {
        val o = orders(s, d)
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(asc("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
              FROM orders o
              WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
              GROUP BY 1 ORDER BY 1""")),

    // ---- TPC-H Q18 shape: large-volume customers — a having-sum
    //      semi-join (orders restricted to those whose lineitems sum past
    //      a quantity threshold), then the customer/orders/lineitem
    //      rollup. The semi input is a map-side-combinable hash aggregate
    //      over the fact table alone; only qualifying orders reach the
    //      three-way join. Threshold 250 ≈ p99 of per-order quantity sums
    //      in the synthetic data (TPC-H uses 300 at its own scale).
    Q("q18_large_volume",
      (s, d) => {
        val l = lineitem(s, d)
        val big = l.groupBy("l_orderkey")
          .agg(sum(dec(col("l_quantity"))).as("qsum"))
          .filter(col("qsum") > 250)
          .select(col("l_orderkey").as("o_orderkey"))
        val o = orders(s, d).join(big, Seq("o_orderkey"), "left_semi")
        val c = customer(s, d)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(decSum(col("l_quantity")).as("sum_qty"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(100)
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                o_totalprice, ${sqlDecSum("l_quantity")} AS sum_qty
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250)
              GROUP BY 1, 2, 3, 4, 5
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // ---- TPC-H Q21 shape: the semi + anti chain. The reference schema
    //      lacks commit/receipt dates, so "late" is re-expressed on the
    //      columns available: suppliers with a returned ('R') line in a
    //      finalized multi-supplier order where NO other supplier had a
    //      returned line — same EXISTS + NOT EXISTS decorrelation workout
    //      (two self-joins on the fact with an inequality residual).
    Q("q21_sole_blame",
      (s, d) => {
        val l = lineitem(s, d)
        val l1 = l.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
        val fOrders = orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        val l2 = l.select(col("l_orderkey").as("k2"),
          col("l_suppkey").as("s2"))
        val l3 = l.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
        val base = l1.join(fOrders,
          col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
        val semi = base.join(l2,
          col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        val anti = semi.join(l3,
          col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
        anti.join(supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name")).limit(100)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
              FROM lineitem l1
              JOIN orders ON o_orderkey = l1.l_orderkey
              JOIN supplier ON s_suppkey = l1.l_suppkey
              WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
                AND EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (
                  SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
              GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""")),

    // ---- TPC-H Q2 shape: correlated-min subquery — for each part, the
    //      lineitem rows at that part's minimum extended price (the Q2
    //      min-supplycost pattern on the tables available). Runs through
    //      SQL so Catalyst's decorrelation rewrites the correlated scalar
    //      subquery into an aggregate + join; double equality is safe
    //      because both engines compare the same unarithmetized values.
    Q("q2_min_price_part",
      (s, d) => Sql.withView(s, part(s, d), "graft_part_q2") { vp =>
        Sql.withView(s, lineitem(s, d), "graft_lineitem_q2") { vl =>
          s.sql(s"""SELECT p.p_partkey, p.p_name, l.l_suppkey,
                     l.l_extendedprice AS min_price
                   FROM $vp p
                   JOIN $vl l ON l.l_partkey = p.p_partkey
                   WHERE l.l_extendedprice = (
                     SELECT MIN(l2.l_extendedprice)
                     FROM $vl l2
                     WHERE l2.l_partkey = p.p_partkey)""")
        }
      },
      Some("""SELECT p.p_partkey, p.p_name, l.l_suppkey,
                l.l_extendedprice AS min_price
              FROM part p
              JOIN lineitem l ON l.l_partkey = p.p_partkey
              WHERE l.l_extendedprice = (
                SELECT MIN(l2.l_extendedprice)
                FROM lineitem l2
                WHERE l2.l_partkey = p.p_partkey)""")),

    // ---- Q2's 100 TB shape (SCALE.md decade 5, finding 4): the same
    //      query as a window formulation. Catalyst decorrelates the
    //      subquery form above into aggregate + join — correct, but that
    //      plan scans and exchanges lineitem TWICE on l_partkey (~20 GB
    //      of exchange at sf100, the measured spill-regime onset).
    //      min(...) OVER (PARTITION BY l_partkey) computes the per-part
    //      floor and the row filter in ONE lineitem scan and ONE
    //      exchange — half the fact traffic, same rows. The correlated
    //      twin stays registered as the decorrelation exercise; this one
    //      gates the shape you would ship at scale. Same DuckDB oracle.
    Q("q2_min_price_window",
      (s, d) => {
        val w = Window.partitionBy("l_partkey")
        val atMin = lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"))
          .withColumn("min_price",
            min(col("l_extendedprice")).over(w))
          .filter(col("l_extendedprice") === col("min_price"))
        part(s, d).select(col("p_partkey"), col("p_name"))
          .join(atMin, col("p_partkey") === col("l_partkey"))
          .select(col("p_partkey"), col("p_name"), col("l_suppkey"),
            col("min_price"))
      },
      Some("""SELECT p.p_partkey, p.p_name, l.l_suppkey,
                l.l_extendedprice AS min_price
              FROM part p
              JOIN lineitem l ON l.l_partkey = p.p_partkey
              WHERE l.l_extendedprice = (
                SELECT MIN(l2.l_extendedprice)
                FROM lineitem l2
                WHERE l2.l_partkey = p.p_partkey)""")),

    // ---- TPC-H Q7 shape: bilateral volume shipping — the disjunctive
    //      two-nation pairing. Selectivity first: suppliers and
    //      customers pre-restrict to the two nations via broadcast
    //      joins, after which the textbook OR condition
    //      ((n1=A AND n2=B) OR (n1=B AND n2=A)) reduces to the residual
    //      supp_nation <> cust_nation over two-valued columns — no
    //      disjunctive join predicate survives into the fact joins, so
    //      both stay hashable. Lineitem is scanned once with the
    //      ship-date band pushed down.
    Q("q7_volume_shipping",
      (s, d) => {
        val two = nation(s, d)
          .filter(col("n_name").isin("NATION_18", "NATION_19"))
        val su = supplier(s, d).join(broadcast(two),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cu = customer(s, d).join(broadcast(two),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val o = orders(s, d).join(cu,
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("cust_nation"))
        val l = lineitem(s, d)
          .filter(col("l_shipdate") >=
              to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        l.join(su, l("l_suppkey") === su("s_suppkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                ${sqlDecSum("l_extendedprice * (1 - l_discount)")}
                  AS revenue
              FROM lineitem
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
                  OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY 1, 2, 3
              ORDER BY 1, 2, 3""")),

    // ---- rank family over event values per user (rank/dense_rank are
    //      deterministic under ties; percent_rank is exact rational math).
    Q("x5_rank_windows",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(desc("value"))
        events(s, d).select(col("event_id"), col("user_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"))
      },
      Some("""SELECT event_id, user_id,
              rank() OVER w AS rnk,
              dense_rank() OVER w AS drnk,
              ROUND(percent_rank() OVER w, 6) AS prnk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY value DESC)"""))
  )
}
