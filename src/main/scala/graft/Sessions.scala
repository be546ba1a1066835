package graft
import org.apache.spark.sql.SparkSession

/** The one local-mode session shape shared by the measurement entry
  * points (Bench, Profile). The stability knobs live HERE and only here:
  * the two mains drifted once already (Profile hardcoded cores/shuffle
  * while Bench read the env), and a timeout tweak made in one place but
  * not the other silently changes what an artifact measured. */
object Sessions {

  /** Builder with the measurement-session config applied; callers add
    * nothing but `.getOrCreate()`.
    *
    * @param cpus    local-mode thread count (`local[cpus]`)
    * @param shuffle `spark.sql.shuffle.partitions` — decoupled from core
    *                count for the cluster-shape sweeps (SCALE.md: 32 vs
    *                128 at sf100 changes spill-bound queries 1.2-2.3×)
    */
  def builder(cpus: String, shuffle: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      // Heavy sf100 stages can starve the in-JVM heartbeater for minutes
      // (32 saturated threads + spill I/O + GC). If one heartbeat misses
      // the default 120 s window the driver expires the executor, and
      // local mode cannot re-register (the BlockManager re-register path
      // asks for the CoarseGrainedScheduler endpoint, which only exists
      // on a cluster) — the context then dies after 60 failed
      // heartbeats. Measured: j4's sf100 SMJ killed the q2 solo that
      // followed it. Same knob a busy cluster would set.
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "20s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.plans.GraftExtensions.install)
}
