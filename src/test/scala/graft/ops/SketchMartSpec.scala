package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted mergeable-sketch mart (`ScaleOps.dailyUserSketches` /
  * `sketch_mart_users`): the gate query pins accuracy + mergeability in
  * one plan; this spec pins the two properties the gate cannot express
  * lazily — the sketch column survives a REAL parquet round-trip, and
  * the day-N+1 incremental union (new day unioned into a STORED union
  * of history) equals the from-scratch union. Those two together are
  * the 100 TB claim: distinct counts over any window without re-scanning
  * history.
  */
class SketchMartSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val ev = graft.Tables.events(spark, sf)
    .select(to_date(col("ts")).as("day"), col("user_id"))

  private def estimate(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long"))
      .head().getLong(0)

  test("gate query emits its one row (mergeability exact, error <= 5%)") {
    val rows = graft.SparkEntry.queries("sketch_mart_users")(spark, sf)
      .collect()
    assert(rows.length == 1, "gate row missing — invariant regressed")
    val r = rows.head
    assert(r.getAs[Long]("merged_est") == r.getAs[Long]("global_est"))
    assert(r.getAs[Double]("rel_err") <= 0.05)
  }

  test("daily exact twin matches distinct users per day") {
    val mart = graft.SparkEntry.queries("sketch_daily_exact")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val expect = ev.distinct().groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(mart == expect)
  }

  test("sketch column survives a parquet round-trip with its estimate " +
    "intact") {
    val daily = ScaleOps.dailyUserSketches(ev)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sketch-mart").toString
    graft.util.TempDirs.deleteOnExit(dir)
    daily.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(estimate(back) == estimate(daily),
      "read-back union estimate must equal the in-memory one")
  }

  test("incremental union: last day folded into a stored union of " +
    "prior days equals the from-scratch union") {
    val daily = ScaleOps.dailyUserSketches(ev).localCheckpoint(true)
    // With a single distinct day, `prior` aggregates zero input rows →
    // hll_union_agg yields one null-sketch row and the test's meaning
    // (fold a new day into stored history) silently vanishes. Fail the
    // FIXTURE loudly instead of passing on the degenerate shape.
    assert(daily.count() >= 2,
      "fixture must span >= 2 distinct days for the incremental-union " +
        "test to exercise a real fold; regenerate sf0.001 or widen ts")
    val lastDay = daily.agg(max("day")).head().getDate(0)
    val prior = daily.filter(col("day") < lit(lastDay))
      .agg(hll_union_agg(col("sk")).as("sk")) // the stored history union
    val newest = daily.filter(col("day") === lit(lastDay))
      .select(col("sk"))
    val incremental = estimate(prior.select("sk").union(newest))
    assert(incremental == estimate(daily),
      "incremental fold must equal re-union of all days")
  }
}
