package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hub-graph demonstration of the weighted-frontier trace bound
  * (BENCH_NOTES "trace frontier" entry; TraceFrontierSpec pins the
  * cardinality invariant, this main measures what it buys).
  *
  * The oracle-gated traces (j5/j6/j9/sankey) run on the bounded residue
  * graph where both shapes are cheap — they prove correctness, not the
  * bound's value. This main runs the regime the weighted frontier exists
  * for: a complete digraph on n nodes (every node a hub), where the
  * number of PATHS from one source multiplies by n per hop (n^h) — the
  * fan-out the reference punts on with LIMIT + OOM retry
  * (transaction_tracing/app.py:364-383). Arms:
  *   - weighted (TraceOps.trace): hop state ≤ n² rows, paths as counts;
  *   - rowPerPath (the pre-r9 shape): hop-h frontier = n^(h-1)·n rows.
  * At n=120, hop 4 the row-per-path shape materializes 207M path rows
  * vs ≤14 400 weighted; the weighted-only arm (n=300, SIX hops, 7.3e14
  * paths) is a depth the row-per-path shape cannot materialize on any
  * host — the paths exceed addressable rows — while the weighted
  * frontier holds at 90 000 rows per hop.
  *
  * Protocol: min-of-3 per arm after a warmup (graft.Profile discipline).
  * Output: one JSON line.
  */
object TraceBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def complete(n: Int): DataFrame =
      spark.range(n.toLong * n).select(
        (col("id") / n).cast("long").as("src"),
        (col("id") % n).as("dst"))
        .repartition(cpus.toInt).localCheckpoint(true)

    // Consume: total path mass + result rows (detects lost/dup rows).
    def drain(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        sum(col("paths")).as("m")).collect()(0)
      (r.getAs[Long]("n"), r.getAs[Long]("m"))
    }

    def rowPerPath(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
      var frontier = edges.filter(col("src") === source)
        .withColumn("hop", lit(1))
      var acc = frontier
      for (h <- 2 to maxHops) {
        frontier = frontier.select(col("dst").as("prev_dst"))
          .join(edges, col("prev_dst") === col("src"))
          .select(col("src"), col("dst")).withColumn("hop", lit(h))
        acc = acc.unionByName(frontier)
      }
      acc.groupBy("hop", "src", "dst").agg(count(lit(1)).as("paths"))
    }

    def minOf3(mk: () => DataFrame): (Double, Long, Long) = {
      drain(mk()) // warmup
      var best = Double.MaxValue; var nm = (0L, 0L)
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        nm = drain(mk())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, nm._1, nm._2)
    }

    val hops = 4
    val eSmall = complete(120)   // 207M paths at hop 4
    val eBig = complete(300)     // 7.29e14 paths at hop 6

    val (tw, nw, mw) = minOf3(() =>
      graft.ops.TraceOps.trace(eSmall, 0L, hops))
    val (tr, nr, mr) = minOf3(() => rowPerPath(eSmall, 0L, hops))
    require(nw == nr && mw == mr,
      s"arm results diverge: weighted ($nw,$mw) vs rowPerPath ($nr,$mr)")
    val (tb, nb, mb) = minOf3(() =>
      graft.ops.TraceOps.trace(eBig, 0L, 6))

    println(s"""{"bench":"trace_hub","hops":$hops,""" +
      s""""n120":{"weighted_sec":${f"$tw%.3f"},"row_per_path_sec":${f"$tr%.3f"},""" +
      s""""rows":$nw,"paths":$mw},""" +
      s""""n300_hop6_weighted_only":{"sec":${f"$tb%.3f"},"rows":$nb,"paths":$mb}}""")
    spark.stop()
  }
}
