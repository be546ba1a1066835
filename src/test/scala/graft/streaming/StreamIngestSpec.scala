package graft.streaming

import graft.{Fixtures, SparkSpec}
import graft.models.Models
import graft.schema.BlockchairSchemas
import java.nio.file.Files

class StreamIngestSpec extends SparkSpec {

  test("streaming TSV ingest → staging → windowed agg via memory sink") {
    val dir = Files.createTempDirectory("graft-stream")
    Files.writeString(dir.resolve("blockchair_bitcoin_transactions_20250820.tsv"),
      (Fixtures.txHeader +: Fixtures.txRows).mkString("\n") + "\n")

    val stream = StreamIngest.readTsvStream(spark, dir.toString,
      BlockchairSchemas.transactions)
    assert(stream.isStreaming)
    // batch staging transform composes unchanged over the stream
    val stg = Models.stgTransactions(stream)
    val agg = StreamIngest.txMetricsByWindow(stg)
    val q = StreamIngest.toMemorySink(agg, "tx_metrics", "append").start()
    q.awaitTermination(60000)
    // Append mode only emits closed windows; with a finite file the
    // watermark cannot advance past the last batch, so assert on the
    // complete-mode rerun instead:
    val q2 = StreamIngest.toMemorySink(agg, "tx_metrics_complete",
      "complete").start()
    q2.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT * FROM tx_metrics_complete ORDER BY window_start").collect()
    assert(rows.length == 1) // all three txs land in the 00:00 hour window
    assert(rows(0).getAs[Long]("tx_count") == 3)
    assert(rows(0).getAs[Long]("fee_sats_total") == 13100000L)
  }

  test("streaming dedup drops repeated keys within the watermark") {
    val dir = Files.createTempDirectory("graft-stream3")
    // the same transactions file landed twice (a re-delivered daily dump)
    val body = (Fixtures.txHeader +: Fixtures.txRows).mkString("\n") + "\n"
    Files.writeString(dir.resolve("blockchair_bitcoin_transactions_20250820.tsv"), body)
    Files.writeString(dir.resolve("blockchair_bitcoin_transactions_20250820_redelivery.tsv"), body)
    val stream = StreamIngest.readTsvStream(spark, dir.toString,
      graft.schema.BlockchairSchemas.transactions, maxFilesPerTrigger = 2)
    val stg = graft.models.Models.stgTransactions(stream)
    val deduped = StreamIngest.dedupStream(stg, "tx_time", "1 day",
      "transaction_hash", "block_id")
    val q = deduped.writeStream.format("memory").queryName("tx_dedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val n = spark.sql("SELECT COUNT(*) FROM tx_dedup").collect()(0).getLong(0)
    assert(n == 3) // six landed rows (3 × 2 files) → 3 distinct
  }

  test("streaming session windows aggregate with bounded state") {
    val dir = Files.createTempDirectory("graft-stream4")
    Fixtures.writeAll(dir)
    val inputs = StreamIngest.readTsvStream(spark, dir.toString + "/*inputs*",
      graft.schema.BlockchairSchemas.inputs)
    val ev = graft.models.Models.stgInputs(inputs)
      .selectExpr("recipient AS user_id", "time AS ts")
      .filter("user_id IS NOT NULL")
    val sess = StreamIngest.sessionWindows(ev, "ts", "30 minutes")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT * FROM sessions").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_events") >= 1))
  }

  test("stateful running flow with mapGroupsWithState") {
    val dir = Files.createTempDirectory("graft-stream2")
    Fixtures.writeAll(dir)
    val inputs = StreamIngest.readTsvStream(spark, dir.toString + "/*inputs*",
      BlockchairSchemas.inputs)
    val changes = Models.stgInputs(inputs)
      .selectExpr("recipient AS address",
        "-value_sats AS value_change_sats")
      .filter("address IS NOT NULL")
    val flow = StreamIngest.runningAddressFlow(spark, changes)
    val q = flow.writeStream.format("memory").queryName("flows_state")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT * FROM flows_state").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("addrA") == -3000000000000L)
    assert(rows("addrC") == -2000000000L)
  }
}
