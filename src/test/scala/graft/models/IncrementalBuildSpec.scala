package graft.models

import graft.{Fixtures, SparkSpec}
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Incremental materialization: a day-2 build must rewrite ONLY the day-2
  * `load_date` partitions of the date-closed tables — byte-untouched day-1
  * files, identical full-table content vs a full rebuild. */
class IncrementalBuildSpec extends SparkSpec {

  import FixtureDays.shiftDay

  private lazy val dirs: (Path, Path) = {
    val raw = Files.createTempDirectory("graft-incr-raw")
    Fixtures.writeAll(raw) // day 1 (20250820), incl. the address snapshot
    def w(name: String, header: String, rows: Seq[String]): Unit =
      Files.writeString(raw.resolve(name),
        (header +: rows).mkString("\n") + "\n")
    w("blockchair_bitcoin_blocks_20250920.tsv",
      Fixtures.blocksHeader, shiftDay(Fixtures.blocksRows))
    w("blockchair_bitcoin_transactions_20250920.tsv",
      Fixtures.txHeader, shiftDay(Fixtures.txRows))
    w("blockchair_bitcoin_inputs_20250920.tsv",
      Fixtures.inputsHeader, shiftDay(Fixtures.inputsRows))
    w("blockchair_bitcoin_outputs_20250920.tsv",
      Fixtures.outputsHeader, shiftDay(Fixtures.outputsRows))
    (raw, Files.createTempDirectory("graft-incr-out"))
  }

  private def snapshot(p: Path): Map[String, Long] =
    scala.util.Using(Files.list(p)) {
      _.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          Files.getLastModifiedTime(f).toMillis)
        .toMap
    }.get

  test("day-2 incremental build rewrites only day-2 partitions") {
    val (raw, out) = dirs
    val bld = Pipeline.readRaw(spark, raw.toString)
    Pipeline.writeBuildIncremental(bld, out.toString) // initial full build

    for (table <- Seq("int_transaction_flows", "fct_transaction_traces")) {
      val day1 = out.resolve(table).resolve("load_date=20250820")
      val day2 = out.resolve(table).resolve("load_date=20250920")
      assert(Files.isDirectory(day1), s"$table missing day-1 partition")
      assert(Files.isDirectory(day2), s"$table missing day-2 partition")
    }
    val flowsDir = out.resolve("int_transaction_flows")
    val d1Before = snapshot(flowsDir.resolve("load_date=20250820"))
    val d2Before = snapshot(flowsDir.resolve("load_date=20250920"))
    val fullContent = spark.read.parquet(flowsDir.toString)
      .select("transaction_hash", "input_address", "output_address",
        "load_date")
      .collect().map(_.toString).sorted
    assert(fullContent.length == 12) // 6 edges per day

    Thread.sleep(1100) // step past filesystem mtime granularity
    Pipeline.writeBuildIncremental(bld, out.toString,
      loadDates = Some(Seq("20250920")))

    assert(snapshot(flowsDir.resolve("load_date=20250820")) == d1Before,
      "day-1 partition files were rewritten by the day-2 build")
    assert(snapshot(flowsDir.resolve("load_date=20250920")) != d2Before,
      "day-2 partition was not rewritten")
    val after = spark.read.parquet(flowsDir.toString)
      .select("transaction_hash", "input_address", "output_address",
        "load_date")
      .collect().map(_.toString).sorted
    assert(after.sameElements(fullContent),
      "incremental rewrite changed table content vs the full build")
  }

  test("a stale sentinel partition is cleared when the build no longer " +
    "has null-time rows") {
    val (raw, _) = dirs
    val bld = Pipeline.readRaw(spark, raw.toString)
    val out = Files.createTempDirectory("graft-incr-sentinel")
    Pipeline.writeBuildIncremental(bld, out.toString)
    val flows = out.resolve("int_transaction_flows")
    val sentinel = flows.resolve("load_date=00000000")
    // plant a sentinel partition, as if an earlier build had landed
    // null-time rows whose block has since arrived under a real date
    Files.createDirectories(sentinel)
    val src = scala.util.Using(Files.list(flows.resolve("load_date=20250820"))) {
      _.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
    }.get
    Files.copy(src, sentinel.resolve(src.getFileName.toString))
    // a restricted rewrite with no sentinel rows in the build must clear
    // it — dynamic overwrite alone would leave the stale rows readable
    Pipeline.writeBuildIncremental(bld, out.toString,
      loadDates = Some(Seq("20250920")))
    assert(!Files.exists(sentinel),
      "stale sentinel partition survived the incremental rewrite")
  }

  test("re-dated sentinel rows whose destination date is OUTSIDE the " +
    "rewrite scope are still written (scope widening), never lost") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val out = Files.createTempDirectory("graft-incr-redate")
    // minimal date-closed table: h1's block is missing on day 1 (null
    // tx_time → sentinel); h2 is a normal day-1 row
    def flows(h1Time: Option[String]) = {
      import spark.implicits._
      Seq("h1" -> h1Time, "h2" -> Some("2025-08-20 10:00:00"))
        .toDF("transaction_hash", "t")
        .select(col("transaction_hash"),
          to_timestamp(col("t")).as("tx_time"),
          lit("a").as("source_address"),
          lit("b").as("destination_address"))
    }
    def bld(df: org.apache.spark.sql.DataFrame) =
      Pipeline.Build(df, df, df, df, df, df, df, df, df, df)
    Pipeline.writeBuildIncremental(bld(flows(None)), out.toString)
    val flowsDir = out.resolve("int_transaction_flows")
    assert(Files.isDirectory(flowsDir.resolve("load_date=00000000")),
      "null-time row did not land in the sentinel partition")
    // h1's block arrives: it re-dates to 20250820, but the incremental
    // run is scoped to a DIFFERENT day. Without scope widening the write
    // filters h1 out while the sentinel cleanup deletes its only copy.
    Pipeline.writeBuildIncremental(
      bld(flows(Some("2025-08-20 10:05:00"))), out.toString,
      loadDates = Some(Seq("20250920")))
    assert(!Files.exists(flowsDir.resolve("load_date=00000000")),
      "stale sentinel partition survived")
    val rows = spark.read.parquet(flowsDir.toString)
      // partition values are type-inferred on read (integer here)
      .select(col("transaction_hash"), col("load_date").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq("h1" -> "20250820", "h2" -> "20250820"),
      s"re-dated row lost or duplicated: ${rows.mkString(", ")}")
  }

  test("the sentinel survives when its transactions VANISH from the " +
    "build (aged-out raw data) — deletion requires every stored " +
    "transaction to have a destination") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val out = Files.createTempDirectory("graft-incr-vanish")
    def flows(rows: Seq[(String, Option[String])]) = {
      import spark.implicits._
      rows.toDF("transaction_hash", "t")
        .select(col("transaction_hash"),
          to_timestamp(col("t")).as("tx_time"),
          lit("a").as("source_address"),
          lit("b").as("destination_address"))
    }
    def bld(df: org.apache.spark.sql.DataFrame) =
      Pipeline.Build(df, df, df, df, df, df, df, df, df, df)
    // day 1: h1 blockless → sentinel; h2 normal
    Pipeline.writeBuildIncremental(bld(flows(Seq(
      "h1" -> None, "h2" -> Some("2025-08-20 10:00:00")))), out.toString)
    val flowsDir = out.resolve("int_transaction_flows")
    assert(Files.isDirectory(flowsDir.resolve("load_date=00000000")))
    // later: h1's raw dumps aged past retention — the build no longer
    // contains h1 AT ALL (and has no sentinel rows). The old cleanup
    // deleted the sentinel ("no sentinel rows in this build") and lost
    // h1's only copy.
    Pipeline.writeBuildIncremental(bld(flows(Seq(
      "h2" -> Some("2025-08-20 10:00:00"),
      "h3" -> Some("2025-09-20 09:00:00")))), out.toString,
      loadDates = Some(Seq("20250920")))
    assert(Files.isDirectory(flowsDir.resolve("load_date=00000000")),
      "sentinel deleted while holding the only copy of a vanished tx")
    val kept = spark.read
      .parquet(flowsDir.resolve("load_date=00000000").toString)
      .select("transaction_hash").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("h1"), s"sentinel content changed: $kept")
  }

  test("MIXED sentinel: re-dated rows leave, vanished rows keep their " +
    "only copy — neither duplicated nor lost") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val out = Files.createTempDirectory("graft-incr-mixed")
    def flows(rows: Seq[(String, Option[String])]) = {
      import spark.implicits._
      rows.toDF("transaction_hash", "t")
        .select(col("transaction_hash"),
          to_timestamp(col("t")).as("tx_time"),
          lit("a").as("source_address"),
          lit("b").as("destination_address"))
    }
    def bld(df: org.apache.spark.sql.DataFrame) =
      Pipeline.Build(df, df, df, df, df, df, df, df, df, df)
    // day 1: h1 AND h4 blockless → both in the sentinel; h2 normal
    Pipeline.writeBuildIncremental(bld(flows(Seq(
      "h1" -> None, "h4" -> None,
      "h2" -> Some("2025-08-20 10:00:00")))), out.toString)
    val flowsDir = out.resolve("int_transaction_flows")
    // later: h1's block arrived (re-dated to 0820), h4 aged out of the
    // build entirely. The all-or-nothing cleanup kept the WHOLE stored
    // sentinel because h4 vanished — so h1 existed both re-dated and in
    // the surviving sentinel: duplicate rows on read.
    Pipeline.writeBuildIncremental(bld(flows(Seq(
      "h1" -> Some("2025-08-20 10:05:00"),
      "h2" -> Some("2025-08-20 10:00:00")))), out.toString,
      loadDates = Some(Seq("20250920")))
    val sentinelKept = spark.read
      .parquet(flowsDir.resolve("load_date=00000000").toString)
      .select("transaction_hash").collect().map(_.getString(0)).toSeq
    assert(sentinelKept == Seq("h4"),
      s"sentinel must hold exactly the vanished tx: $sentinelKept")
    val all = spark.read.parquet(flowsDir.toString)
      .select(col("transaction_hash"), col("load_date").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    // partition values are type-inferred on read: "00000000" reads as 0
    assert(all.toSeq == Seq("h1" -> "20250820", "h2" -> "20250820",
      "h4" -> "0"),
      s"re-dated row duplicated or vanished row lost: ${all.mkString(", ")}")
  }

  test("a build with NEW sentinel rows still preserves stored vanished " +
    "rows (dynamic overwrite must not destroy their only copy)") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val out = Files.createTempDirectory("graft-incr-newsent")
    def flows(rows: Seq[(String, Option[String])]) = {
      import spark.implicits._
      rows.toDF("transaction_hash", "t")
        .select(col("transaction_hash"),
          to_timestamp(col("t")).as("tx_time"),
          lit("a").as("source_address"),
          lit("b").as("destination_address"))
    }
    def bld(df: org.apache.spark.sql.DataFrame) =
      Pipeline.Build(df, df, df, df, df, df, df, df, df, df)
    // day 1: h4 blockless → sentinel
    Pipeline.writeBuildIncremental(bld(flows(Seq(
      "h4" -> None, "h2" -> Some("2025-08-20 10:00:00")))), out.toString)
    val flowsDir = out.resolve("int_transaction_flows")
    // day 2: h4 aged out; h5 arrives blockless. The dynamic overwrite
    // rewrites the sentinel partition with h5 — h4's only copy must be
    // re-attached, not silently destroyed.
    Pipeline.writeBuildIncremental(bld(flows(Seq(
      "h5" -> None, "h2" -> Some("2025-08-20 10:00:00")))), out.toString,
      loadDates = Some(Seq("20250920")))
    val sentinelKept = spark.read
      .parquet(flowsDir.resolve("load_date=00000000").toString)
      .select("transaction_hash").collect().map(_.getString(0)).sorted.toSeq
    assert(sentinelKept == Seq("h4", "h5"),
      s"sentinel must hold new blockless AND vanished tx: $sentinelKept")
  }

  test("day-2 partitions contain exactly the day-2 transactions") {
    val (raw, out) = dirs
    val bld = Pipeline.readRaw(spark, raw.toString)
    Pipeline.writeBuildIncremental(bld, out.toString)
    val day2 = spark.read
      .parquet(out.resolve("int_transaction_flows").toString)
      .where(org.apache.spark.sql.functions.col("load_date") === "20250920")
    val hashes = day2.select("transaction_hash").distinct()
      .collect().map(_.getString(0)).toSet
    assert(hashes == Set("u1", "u2", "u3"))
    assert(day2.count() == 6) // same fan-out as day 1: 4 + 1 + 1
  }
}
