package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.BloomExprs
import graft.ops.Parity._

/** Bloom-filter join pruning — the canonical 100 TB technique for a
  * selective join whose build side is too LARGE to broadcast as rows
  * but whose KEY SET compresses into a few-MB sketch.
  *
  * The problem shape: `fact ⋈ dim` where dim passes a selective
  * predicate, dim is past the broadcast threshold (so Spark picks a
  * shuffle join), and only a small fraction of fact rows survive the
  * join. A plain SMJ shuffles EVERY fact row — at 100 TB that shuffle
  * is the job. The two-pass fix: (1) one cheap pass over dim builds a
  * Bloom filter of its join keys (`DataFrameStatFunctions
  * .bloomFilter` — a treeAggregate, no shuffle); (2) the fact scan is
  * pre-filtered by an O(1)-probe codegen'd expression
  * ([[graft.functions.BloomMightContainLong]]) BEFORE the exchange,
  * so only might-match rows are ever hashed/sorted/shuffled. Bloom
  * filters have NO false negatives, so the subsequent exact join
  * removes the false positives and the result is row-identical to the
  * plain join — which is exactly what makes the operator
  * oracle-gateable against DuckDB's plain join.
  *
  * This is the same plan shape Spark's own AQE runtime filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for
  * shuffle joins; the explicit operator (a) works regardless of
  * planner heuristics and join shape, (b) lets the caller size
  * expectedItems/fpp from domain knowledge, and (c) exposes the
  * pruning measurement (the `bloom_prune_stats` gate) so the
  * fpp/selectivity trade-off is measured, not guessed.
  *
  * Sizing at scale: a 100M-key dim at 1% fpp is a ~114 MB filter —
  * the practical ceiling; past that, prefer partition-level pruning
  * (the dim's key range per partition) or accept the shuffle. The
  * filter rides the task-binary broadcast once per stage (see
  * BloomExprs), so its cost is one dim pass + one broadcast, against
  * a saved shuffle of (1 − selectivity) of the fact.
  */
object BloomOps extends QueryModule {

  /** Two-pass bloom-pruned inner equi-join; row-identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey))`. EAGER: pass 1
    * (the filter build) runs a Spark job. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(BloomExprs.mightContainLong(col(factKey), bf))
      .join(dim, fact(factKey) === dim(dimKey))
  }

  /** The dim side both queries share: orders in the top price band —
    * selective (~4% of orders at every sf; the synthetic totalprice is
    * uniform-ish up to ~500k), and NOT artificially tiny, the regime
    * where the operator earns its keep. */
  private def expensiveOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_totalprice") > 480000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  def all: Seq[Q] = Seq(

    // ---- The operator under the full hash gate: bloom-pruned join of
    //      lineitem against the expensive-order band, aggregated per
    //      return flag. The oracle is the PLAIN join — no-false-
    //      negatives makes the bloom plan result-identical, so any
    //      probe bug (hash mismatch between build and probe side,
    //      serialization corruption, a dropped true key) breaks the
    //      hash. Eager (pass 1 is a job): no caches pinned; schema
    //      pinned by BloomOpsSpec.
    Q("bloom_pruned_join",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_extendedprice"))
        bloomPrunedJoin(li, expensiveOrders(s, d), "l_orderkey",
          "o_orderkey", expectedItems = 100000L, fpp = 0.01)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_items"),
            decSum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n_items,
              ${sqlDecSum("l_extendedprice")} AS sum_price
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_totalprice > 480000.0
              GROUP BY 1"""),
      eager = true),

    // ---- The pruning MEASUREMENT as a vanish-on-regression gate
    //      (recall-gate shape): one summary row with the measured
    //      pruning, emitted ONLY if the bloom invariants hold on this
    //      data — zero false negatives (every true-match row passes
    //      the filter; a violation means the probe or serialization is
    //      broken) and a false-positive rate within 5× the requested
    //      1% fpp. A regression yields 0 rows and fails the driver's
    //      rows>0 check. `survived_frac` is the fraction of the fact
    //      scan that would reach the shuffle — the number that decides
    //      whether the two-pass plan wins at scale.
    Q("bloom_prune_stats",
      (s, d) => {
        val dimDf = expensiveOrders(s, d)
        val bf = dimDf.stat.bloomFilter("o_orderkey", 100000L, 0.01)
        val keyed = lineitem(s, d).select(col("l_orderkey"))
          .withColumn("bloom_pass",
            BloomExprs.mightContainLong(col("l_orderkey"), bf))
          .join(dimDf.select(col("o_orderkey")).distinct()
            .withColumn("is_match", lit(1L)),
            col("l_orderkey") === col("o_orderkey"), "left")
        keyed.agg(
          count(lit(1)).as("total"),
          sum(col("bloom_pass").cast("long")).as("survived"),
          sum(coalesce(col("is_match"), lit(0L))).as("matching"),
          sum(when(col("is_match").isNotNull && !col("bloom_pass"), 1L)
            .otherwise(0L)).as("false_negatives"))
          .select(col("total"), col("survived"), col("matching"),
            col("false_negatives"),
            round(col("survived").cast("double") / col("total"), 6)
              .as("survived_frac"),
            round((col("survived") - col("matching")).cast("double") /
              greatest(col("total") - col("matching"), lit(1L)), 6)
              .as("fp_rate"))
          .filter(col("false_negatives") === 0 && col("fp_rate") <= 0.05)
      },
      None,
      eager = true)
  )
}
