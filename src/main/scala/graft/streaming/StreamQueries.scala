package graft.streaming

import java.nio.file.Paths
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
import graft.Tables._
import graft.ops.{Q, QueryModule}

/** The streaming tier's representation in the DRIVER gate. Until round 6
  * the streaming operators were ScalaTest-only — a semantics regression
  * between rounds would never surface in CORRECTNESS_r{N}. Two queries
  * close that:
  *
  *  - `sessionize_closed_batch`: the built-in `session_window` aggregate
  *    over events, filtered to the sessions a final watermark (max ts −
  *    1 min) proves closed — ORACLE-green against a DuckDB
  *    gaps-and-islands re-implementation.
  *  - `sessionize_stream`: the SAME relation produced by actually
  *    RUNNING Structured Streaming — file source → custom-state
  *    `sessionizeWithState` (flatMapGroupsWithState, EventTimeTimeout)
  *    → AvailableNow trigger → memory sink — and checked against the
  *    SAME oracle. The two operators are drop-in interchangeable
  *    (StreamIngestSpec proves it row-for-row), so the streaming path
  *    gets a full hash gate, not just rows>0.
  *
  * Event times are truncated to whole seconds on BOTH engines: the
  * custom-state operator keys its merge arithmetic on epoch
  * milliseconds (java.sql.Timestamp), and the synthetic events carry
  * microsecond precision that would silently shear off — the gate pins
  * semantics, so it removes the precision mismatch rather than hiding
  * it. Boundary semantics (SessionBoundarySpec pins both): events
  * exactly `gap` apart DO merge (the builtin's closed boundary — the
  * oracle breaks only on `> gap`), and a session is closed only when
  * `sess_end = last event + gap` is STRICTLY below the watermark (a row
  * at exactly the watermark is admissible and would merge at exactly
  * sess_end).
  */
object StreamQueries extends QueryModule {

  private val ctr = new java.util.concurrent.atomic.AtomicLong()
  private val gapMs = 30L * 60 * 1000

  /** Shared by both queries — the relation is identical by design. The
    * null filters are the EXPLICIT contract, not fixture-accidental: a
    * null ts would silently diverge the engines (DuckDB's
    * gaps-and-islands folds it into the user's last session because
    * `NULL > INTERVAL` is not true ⇒ brk = 0, while Spark's
    * session_window drops the row), so both engines exclude null
    * user_id/ts up front — the same contract x28_asof_join pins. */
  private val closedSessionsOracle =
    """WITH e AS (
         SELECT user_id,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
         FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS wm FROM e),
       flagged AS (
         SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       grp AS (
         SELECT user_id, ts,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS g
         FROM flagged),
       sess AS (
         SELECT user_id, MIN(ts) AS sess_start,
           MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
           COUNT(*) AS n_events
         FROM grp GROUP BY user_id, g)
       SELECT user_id, sess_start, sess_end,
         CAST(n_events AS BIGINT) AS n_events
       FROM sess, wm WHERE sess_end < wm.wm"""

  private def truncatedEvents(s: org.apache.spark.sql.SparkSession,
      d: String) =
    events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"))

  def all: Seq[Q] = Seq(

    // Batch twin: ONE shuffle on user_id for the session aggregate; the
    // watermark scalar rides as a broadcast one-row aggregate so the
    // whole thing stays a single lazy plan (the repo's standard shape
    // for data-dependent scalars).
    Q("sessionize_closed_batch",
      (s, d) => {
        val ev = truncatedEvents(s, d)
        val wm = ev.agg(
          (max(col("ts")) - expr("INTERVAL 1 MINUTE")).as("wm"))
        ev.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .crossJoin(broadcast(wm))
          .filter(col("w.end") < col("wm"))
          .select(col("user_id"), col("w.start").as("sess_start"),
            col("w.end").as("sess_end"), col("n_events"))
      },
      Some(closedSessionsOracle)),

    // EAGER by nature: constructing the result RUNS a streaming query
    // (AvailableNow processes every file, then the no-data batch fires
    // the event-time timeouts at watermark = max ts − delay). The sink
    // is a FILE sink read back as a DataFrame — executor-side all the
    // way. It was a memory sink until round 10's fourth scaling decade
    // killed it: memory-sink rows serialize to the DRIVER, and at sf30
    // the session set crossed spark.driver.maxResultSize (1054 MiB >
    // 1 GiB) — exactly the collect-shaped scale bug this repo bans
    // elsewhere. The file sink keeps the driver holding only file
    // metadata at any sf; no SQL cache is pinned and nothing stays
    // registered (StreamIngestSpec pins schema + cache hygiene).
    Q("sessionize_stream",
      (s, d) => {
        // Stage the (truncated) events as ONE parquet file in a
        // per-(process, sf) staging dir: one file → one micro-batch →
        // the run is deterministic, and parquet keeps timestamp values
        // exact where a CSV round-trip would re-parse them. The pid
        // component keeps two concurrent gate processes from
        // overwriting each other's staged file mid-stream; floorMod
        // (not abs, which is still negative at Int.MinValue) keeps the
        // name clean.
        // The staged parquet is only read by THIS session's streaming
        // query (the oracle reads the events table, not this file), so
        // it can die with the JVM; stale dirs from crashed processes are
        // reclaimed on the next staging.
        graft.util.TempDirs.cleanStale("graft_stream_gate_")
        val stage = graft.util.TempDirs.deleteOnExit(
          Paths.get(System.getProperty("java.io.tmpdir"),
            s"graft_stream_gate_${ProcessHandle.current().pid()}_${
              math.floorMod(d.hashCode, 1000000)}").toString)
        truncatedEvents(s, d).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val src = s.readStream
          .schema(new StructType()
            .add("user_id", LongType).add("ts", TimestampType))
          .parquet(stage)
        val sess = StreamIngest.sessionizeWithState(
          s, src, "ts", delay = "1 minute", gapMs = gapMs)
        val qn = s"graft_gate_sessions_${ctr.incrementAndGet()}"
        val outDir = graft.util.TempDirs.deleteOnExit(s"${stage}_out_$qn")
        val ckptDir = graft.util.TempDirs.deleteOnExit(s"${stage}_ckpt_$qn")
        // Scale-adaptive STATE partitioning (r14, guide §2): the state
        // store count is frozen from spark.sql.shuffle.partitions at
        // first batch, and each store pays per-batch open/commit file
        // I/O whether or not it holds keys — at gate scale that fixed
        // cost dominated the whole query (65 near-empty state tasks,
        // 76 s summed executor time). Derive the count from the staged
        // input's bytes (cap = the session's configured value, so a
        // real load keeps the cluster-sized parallelism; fail-closed to
        // the cap). The conf is set only for the duration of this
        // query's run and restored in the finally — query construction
        // is single-threaded in every entry point (Bench/Verify/specs),
        // the same session-conf discipline the bucketed writes use.
        val oldShuffle = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions",
          graft.util.SizeGate.partitionsForBytes(
            s, stage, oldShuffle.toInt).toString)
        try {
          val q = sess.writeStream.format("parquet")
            .option("path", outDir)
            .option("checkpointLocation", ckptDir)
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          try require(q.awaitTermination(300000),
            "streaming sessionization did not terminate")
          finally q.stop()
        } finally s.conf.set("spark.sql.shuffle.partitions", oldShuffle)
        // explicit schema: a zero-session run leaves only the sink's
        // metadata log, which a schemaless read would refuse
        s.read.schema(sess.schema).parquet(outDir)
      },
      Some(closedSessionsOracle),
      eager = true)
  )
}
