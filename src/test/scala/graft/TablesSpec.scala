package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import java.nio.file.Files

/** Pins [[Tables.events]]'s schema-adaptive `ts` normalization.
  *
  * The driver's fixture generator has shipped `events.ts` under three
  * physical parquet types across rounds: TIMESTAMP(NANOS) (read as
  * epoch-nanos long via `nanosAsLong`), raw epoch-nanos BIGINT (the
  * [[DataGen]] output), and plain TIMESTAMP_NTZ micros (current driver
  * fixtures). The round-7 gate lost all 31 events-reading oracle rows to
  * exactly this drift — the loader assumed the long reading and threw on
  * the timestamp-typed column. This spec writes the same wall-clock
  * instants under each Spark-writable physical type and requires
  * [[Tables.events]] to yield identical session-TZ timestamps for all of
  * them, so the next fixture-generation change fails here instead of in
  * the driver's correctness gate. (TIMESTAMP(NANOS) itself is not
  * Spark-writable; its `nanosAsLong` reading is byte-identical to the
  * BIGINT variant, which stands in for it.)
  */
class TablesSpec extends SparkSpec {

  private def dirFor(variant: String): String = {
    val d = graft.util.TempDirs.deleteOnExit(
      Files.createTempDirectory(s"graft-ts-$variant").toString)
    // Distinct sub-second micros exercise the lossless sub-millisecond path.
    val base = spark.range(0, 100).select(
      col("id").as("event_id"),
      // 2024-01-15 00:00:00 UTC + id seconds + id*7 micros
      (lit(1705276800000000L) + col("id") * 1000000L + col("id") * 7L)
        .as("micros"))
    val df = variant match {
      case "long_nanos" => base.select(col("event_id"),
        (col("micros") * 1000L).as("ts"))
      case "ntz_micros" => base.select(col("event_id"),
        timestamp_micros(col("micros")).cast("timestamp_ntz").as("ts"))
      case "ltz_micros" => base.select(col("event_id"),
        timestamp_micros(col("micros")).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("ts normalizes identically across all shipped physical types") {
    val readings = Seq("long_nanos", "ntz_micros", "ltz_micros").map { v =>
      val ev = Tables.events(spark, dirFor(v))
      assert(ev.schema("ts").dataType == TimestampType,
        s"$v: expected session-TZ timestamp, got ${ev.schema("ts").dataType}")
      val rows = ev.select(col("event_id"), unix_micros(col("ts")))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      (v, rows)
    }
    val (refName, ref) = readings.head
    for ((v, rows) <- readings.tail)
      assert(rows.sameElements(ref), s"$v diverges from $refName")
    // And the values are the intended instants, not just mutually equal.
    assert(ref(99) == (99L, 1705276800000000L + 99L * 1000000L + 99L * 7L))
  }
}
