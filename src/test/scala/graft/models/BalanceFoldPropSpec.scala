package graft.models

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized invariant for the O(day) balance fold: over random change
  * streams (random addresses, random intra-day time ties, debit/credit
  * mixes, partial snapshots), folding day-by-day from an empty checkpoint
  * must reproduce the full rebuild's activity rows and the from-scratch
  * state. (Deterministic seeds — failures reproduce.) */
class BalanceFoldPropSpec extends SparkSpec {

  import spark.implicits._

  /** One synthetic stg-shaped change table (inputs OR outputs side). */
  private def stgFrame(rows: Seq[(String, String, Long, String)]): DataFrame =
    rows.toDF("address", "ts", "value_sats", "transaction_hash")
      .select(
        col("address").as("recipient"),
        col("ts").cast("timestamp").as("time"),
        col("value_sats"),
        (col("value_sats") / 100000000.0).as("value_btc"),
        (col("value_sats") * 1.7e-4).as("value_usd"),
        col("transaction_hash"))

  private def emptyLike(df: DataFrame): DataFrame = df.filter(lit(false))

  test("sequential day folds == full rebuild (12 random trials)") {
    for (trial <- 1 to 12) {
      val rnd = new Random(trial * 104729L)
      val nAddr = 3 + rnd.nextInt(6)
      val addrs = (0 until nAddr).map(i => s"addr$i")
      // partial snapshot: ~75% of addresses known
      val snapAddrs = addrs.filter(_ => rnd.nextDouble() < 0.75)
      val snapshot = snapAddrs.map(a => (a, rnd.nextInt(1000000).toLong))
        .toDF("address", "balance_sats")
        .withColumn("balance_btc", col("balance_sats") / 100000000.0)
      val days = Seq("2025-08-20", "2025-08-21", "2025-08-22")
      // per day, a random mix of debit/credit rows; intra-day time ties
      // are likely (offsets drawn from a small set)
      def genDay(day: String, tag: String) = {
        val offs = Seq("00:01:00", "00:02:00", "00:03:00")
        Seq.fill(2 + rnd.nextInt(18)) {
          (addrs(rnd.nextInt(nAddr)),
            s"$day ${offs(rnd.nextInt(offs.size))}",
            (rnd.nextInt(1000000) + 1).toLong,
            s"tx_${tag}_${rnd.nextInt(1000)}")
        }
      }
      val inDays = days.map(d => stgFrame(genDay(d, "i")))
      val outDays = days.map(d => stgFrame(genDay(d, "o")))
      val allIn = inDays.reduce(_ unionByName _)
      val allOut = outDays.reduce(_ unionByName _)

      // fold day-by-day from an empty checkpoint
      var state = Models.balanceState(emptyLike(allIn), emptyLike(allOut))
      val hists = days.indices.map { i =>
        val (h, s2) =
          Models.foldBalancesDay(state, snapshot, inDays(i), outDays(i))
        state = s2.localCheckpoint(true) // the next fold reads it thrice
        h
      }
      val folded = hists.reduce(_ unionByName _)

      val full = Models.intAddressBalances(snapshot, allIn, allOut)
        .filter(col("time").isNotNull) // activity rows only
      // an all-address anchor (null balances) makes the full rebuild
      // cover the NON-snapshot addresses too, so their per-row running
      // balances are checked — not just their aggregate state
      val allAnchor = addrs.toDF("address")
        .withColumn("balance_sats", lit(null).cast("long"))
        .withColumn("balance_btc", lit(null).cast("double"))
      val fullAll = Models.intAddressBalances(allAnchor, allIn, allOut)
        .filter(col("time").isNotNull)

      // exact on longs; tolerance compare on UNROUNDED doubles (double
      // accumulation order differs legitimately between one long prefix
      // sum and day-chunked sums, and rounding can flip at half-way
      // points — a fixed-decimal compare would be machine-dependent)
      def exact(df: DataFrame, withSnapshotCols: Boolean) = df
        .select(Seq(col("address"), col("time"), col("transaction_hash"),
          col("value_change_sats"), col("running_balance_sats")) ++
          (if (withSnapshotCols) Seq(col("current_balance_sats"))
           else Seq.empty): _*)
        .collect().map(_.toString).sorted
      def doubles(df: DataFrame): Map[String, (Double, Double)] = df
        .select(col("address"), col("time"), col("transaction_hash"),
          col("value_change_sats"), col("running_balance_btc"),
          col("running_balance_usd"))
        .collect()
        .map(r => (0 to 3).map(r.get(_).toString).mkString("|") ->
          (r.getAs[Double]("running_balance_btc"),
            r.getAs[Double]("running_balance_usd"))).toMap
      def close(a: Map[String, (Double, Double)],
          b: Map[String, (Double, Double)]): Boolean =
        a.keySet == b.keySet && a.forall { case (k, (x, y)) =>
          math.abs(x - b(k)._1) < 1e-6 && math.abs(y - b(k)._2) < 1e-6
        }

      val foldedSnap = folded.filter(col("address").isin(snapAddrs: _*))
      assert(exact(foldedSnap, withSnapshotCols = true)
        .sameElements(exact(full, withSnapshotCols = true)),
        s"trial $trial: sats history diverged (addrs=$nAddr, " +
          s"snap=${snapAddrs.size})")
      assert(exact(folded, withSnapshotCols = false)
        .sameElements(exact(fullAll, withSnapshotCols = false)),
        s"trial $trial: all-address sats history diverged")
      assert(close(doubles(folded), doubles(fullAll)),
        s"trial $trial: btc/usd history diverged")

      // final state == from-scratch state over all history
      def stExact(df: DataFrame) = df
        .select(col("address"), col("last_time"), col("cum_sats"))
        .collect().map(_.toString).sorted
      def stDoubles(df: DataFrame) = df.collect()
        .map(r => r.getAs[String]("address") ->
          (r.getAs[Double]("cum_btc"), r.getAs[Double]("cum_usd"))).toMap
      val fullState = Models.balanceState(allIn, allOut)
      assert(stExact(state).sameElements(stExact(fullState)),
        s"trial $trial: advanced state != from-scratch state")
      assert(close(stDoubles(state), stDoubles(fullState)),
        s"trial $trial: state cum_btc/cum_usd diverged")
    }
  }
}
