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
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
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
        val asiaOrders = o.join(broadcast(asiaCust),
            o("o_custkey") === asiaCust("c_custkey"))
          .select(o("o_orderkey"), asiaCust("c_nationkey"),
            asiaCust("n_name"))
        val l = lineitem(s, d)
        val su = supplier(s, d)
        l.join(asiaOrders, l("l_orderkey") === asiaOrders("o_orderkey"))
          .join(broadcast(su), l("l_suppkey") === su("s_suppkey")
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
