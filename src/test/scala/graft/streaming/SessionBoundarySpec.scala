package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the exact-gap boundary semantics of the BUILT-IN session_window
  * — the ground truth the custom-state sessionizer and the DuckDB oracle
  * must both reproduce (found in round 6: one exact-30-min pair at sf0.1
  * made the three disagree by one session). */
class SessionBoundarySpec extends SparkSpec {

  test("builtin session_window MERGES events exactly gap apart " +
    "(closed boundary) — and the custom-state merge agrees") {
    import spark.implicits._
    val df = Seq((1L, "2026-01-01 10:00:00"), (1L, "2026-01-01 10:30:00"))
      .toDF("user_id", "t")
      .select(col("user_id"), to_timestamp(col("t")).as("ts"))
    val n = df.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n")).count()
    assert(n == 1, "builtin boundary semantics changed — realign " +
      "mergeSessions and the sessionize gate oracle")
    // custom-state operator: same two points, same single session
    val gap = 30L * 60 * 1000
    def m(h: Int, min: Int) = ((h * 60L + min) * 60 * 1000) +
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val merged = StreamIngest.mergeSessions(Nil,
      Seq(m(10, 0), m(10, 30)), gap)
    assert(merged.size == 1,
      s"custom merge disagrees with the builtin at the boundary: $merged")
  }
}
