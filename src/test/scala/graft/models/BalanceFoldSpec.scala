package graft.models

import graft.{Fixtures, SparkSpec}
import graft.ingest.Tsv
import graft.schema.BlockchairSchemas
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared two-day fixture derivation: day-2 rows from the day-1 fixtures
  * with new block ids (2xx), new tx hashes (uN), and times shifted
  * 2025-08-* → 2025-09-*. Replacements are anchored (row-leading block
  * id, tab-delimited hash) so no other field can be clipped. */
object FixtureDays {
  def shiftDay(rows: Seq[String]): Seq[String] =
    rows.map(_.replaceFirst("^100\t", "200\t")
      .replaceFirst("^101\t", "201\t")
      .replace("\t2025-08-", "\t2025-09-")
      .replace("\tt1\t", "\tu1\t")
      .replace("\tt2\t", "\tu2\t")
      .replace("\tt3\t", "\tu3\t"))
}

/** The O(day) balance fold must be indistinguishable from the full
  * rebuild on append-only history — same rows, same running balances —
  * and must refuse history that arrives behind the checkpoint. */
class BalanceFoldSpec extends SparkSpec {

  private lazy val ctx = {
    val d = Files.createTempDirectory("graft-fold")
    val paths = Fixtures.writeAll(d)
    def w(name: String, header: String, rows: Seq[String]) = {
      val p = d.resolve(name)
      Files.writeString(p, (header +: rows).mkString("\n") + "\n")
      p
    }
    val in2p = w("blockchair_bitcoin_inputs_20250920.tsv",
      Fixtures.inputsHeader, FixtureDays.shiftDay(Fixtures.inputsRows))
    val out2p = w("blockchair_bitcoin_outputs_20250920.tsv",
      Fixtures.outputsHeader, FixtureDays.shiftDay(Fixtures.outputsRows))
    def rd(p: java.nio.file.Path,
        sch: org.apache.spark.sql.types.StructType) =
      Tsv.read(spark, p.toString, sch)
    (Models.stgInputs(rd(paths("inputs"), BlockchairSchemas.inputs)),
      Models.stgOutputs(rd(paths("outputs"), BlockchairSchemas.outputs)),
      Models.stgAddresses(rd(paths("addresses"),
        BlockchairSchemas.addresses)),
      Models.stgInputs(rd(in2p, BlockchairSchemas.inputs)),
      Models.stgOutputs(rd(out2p, BlockchairSchemas.outputs)))
  }

  private def exactCols(df: DataFrame) = df.select(
    col("address"), col("time"), col("transaction_hash"),
    col("value_change_sats"), col("running_balance_sats"),
    col("current_balance_sats"))
    .collect().map(_.toString).sorted

  private def doubleCols(df: DataFrame) = df.select(
    col("address"), col("time"),
    round(col("running_balance_btc"), 6).as("btc"),
    round(col("running_balance_usd"), 6).as("usd"))
    .collect().map(_.toString).sorted

  test("day-2 fold reproduces the full rebuild's day-2 rows exactly") {
    val (in1, out1, addr, in2, out2) = ctx
    val full = Models.intAddressBalances(addr,
      in1.unionByName(in2), out1.unionByName(out2))
    val fullDay2 = full.filter(
      col("time") >= lit("2025-09-01 00:00:00").cast("timestamp"))
    val state = Models.balanceState(in1, out1)
    val (hist, newState) = Models.foldBalancesDay(state, addr, in2, out2)
    assert(hist.count() > 0)
    assert(exactCols(hist).sameElements(exactCols(fullDay2)),
      "sats history diverged from the full rebuild")
    assert(doubleCols(hist).sameElements(doubleCols(fullDay2)),
      "btc/usd history diverged from the full rebuild")
    // the advanced state equals the from-scratch state over all history
    // (null coinbase recipients excluded on both paths)
    def stateRows(df: DataFrame) = df
      .select(col("address"), col("last_time"), col("cum_sats"),
        round(col("cum_btc"), 6), round(col("cum_usd"), 6))
      .collect().map(_.toString).sorted
    val fullState = Models.balanceState(
      in1.unionByName(in2), out1.unionByName(out2))
    assert(stateRows(newState).sameElements(stateRows(fullState)))
  }

  test("ties WITHIN the folded day keep RANGE-frame semantics") {
    val (in1, out1, addr, in2, out2) = ctx
    // day-2 addrA: coinbase credit and a debit at the same shifted time —
    // both rows must show the same (tied) running balance, on top of
    // addrA's day-1 cumulative
    val (hist, _) =
      Models.foldBalancesDay(Models.balanceState(in1, out1), addr, in2, out2)
    val a = hist.filter(col("address") === "addrA").collect()
    assert(a.length == 2)
    assert(a.map(_.getAs[Long]("running_balance_sats")).toSet.size == 1)
  }

  test("a not-yet-snapshotted address still emits history (null snapshot " +
    "balances) and accumulates state") {
    val (in1, out1, addr, in2, out2) = ctx
    val partialSnapshot = addr.filter(col("address") =!= "addrD")
    val (hist, newState) = Models.foldBalancesDay(
      Models.balanceState(in1, out1), partialSnapshot, in2, out2)
    // history rows exist — the materialized table must not permanently
    // miss the pre-snapshot days of a late-appearing address — with null
    // snapshot balances (denormalized attribute, refreshed at read time)
    val d2 = hist.filter(col("address") === "addrD").collect()
    assert(d2.nonEmpty)
    assert(d2.forall(_.isNullAt(d2.head.fieldIndex("current_balance_sats"))))
    // running balances match the full rebuild's for the same rows
    val fullD = Models.intAddressBalances(addr,
      in1.unionByName(in2), out1.unionByName(out2))
      .filter(col("address") === "addrD" &&
        col("time") >= lit("2025-09-01 00:00:00").cast("timestamp"))
      .select("address", "time", "running_balance_sats")
      .collect().map(_.toString).sorted
    val foldD = hist.filter(col("address") === "addrD")
      .select("address", "time", "running_balance_sats")
      .collect().map(_.toString).sorted
    assert(foldD.sameElements(fullD))
    // and the state advances with the day's changes
    val d = newState.filter(col("address") === "addrD").collect()
    assert(d.length == 1)
    val full = Models.balanceState(
      in1.unionByName(in2), out1.unionByName(out2))
      .filter(col("address") === "addrD").collect()(0)
    assert(d(0).getAs[Long]("cum_sats") == full.getAs[Long]("cum_sats"))
  }

  test("null-time rows are refused (no position in the prefix order)") {
    val (in1, out1, addr, in2, out2) = ctx
    val in2Null = in2.withColumn("time",
      when(col("transaction_hash") === "u2" && col("index") === 0,
        lit(null).cast("timestamp")).otherwise(col("time")))
    intercept[IllegalArgumentException] {
      Models.foldBalancesDay(Models.balanceState(in1, out1), addr,
        in2Null, out2)
    }
  }

  test("late history (rows at or before the checkpoint) is refused") {
    val (in1, out1, addr, _, _) = ctx
    val state = Models.balanceState(in1, out1)
    intercept[IllegalArgumentException] {
      Models.foldBalancesDay(state, addr, in1, out1)
    }
  }
}
