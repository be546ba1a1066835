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

      // exact on sats; 6-dp on btc/usd (double accumulation order differs
      // legitimately between one long prefix sum and day-chunked sums)
      def exact(df: DataFrame) = df
        .filter(col("address").isin(snapAddrs: _*))
        .select(col("address"), col("time"), col("transaction_hash"),
          col("value_change_sats"), col("running_balance_sats"),
          col("current_balance_sats"))
        .collect().map(_.toString).sorted
      def approx(df: DataFrame) = df
        .filter(col("address").isin(snapAddrs: _*))
        .select(col("address"), col("time"), col("transaction_hash"),
          round(col("running_balance_btc"), 6),
          round(col("running_balance_usd"), 6))
        .collect().map(_.toString).sorted
      assert(exact(folded).sameElements(exact(full)),
        s"trial $trial: sats history diverged (addrs=$nAddr, " +
          s"snap=${snapAddrs.size})")
      assert(approx(folded).sameElements(approx(full)),
        s"trial $trial: btc/usd history diverged")

      // final state == from-scratch state over all history
      def stRows(df: DataFrame) = df
        .select(col("address"), col("last_time"), col("cum_sats"),
          round(col("cum_btc"), 6), round(col("cum_usd"), 6))
        .collect().map(_.toString).sorted
      val fullState = Models.balanceState(allIn, allOut)
      assert(stRows(state).sameElements(stRows(fullState)),
        s"trial $trial: advanced state != from-scratch state")
    }
  }
}
