package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Honest skew demonstration (BENCH_NOTES "skew crossover" entry).
  *
  * The oracle-gated `skew_salted_join` runs on uniform TPC-H keys, where
  * salting can only add overhead — it proves correctness of the
  * decomposition, not its value. This main measures the regime salting
  * exists for: a deliberately skewed fixture (~half the probe rows on ONE
  * key, row count amplified ×10) joined plain vs salted with broadcast
  * and AQE skew mitigation DISABLED — the straggler regime a fixed
  * partitioning hits at 100 TB when the build side is too big to
  * broadcast — plus plain-with-AQE-skew-join as the runtime-mitigation
  * reference (AQE splits sort-merge skew on its own; explicit salting is
  * the tool when AQE is off, for aggregate-then-join pipelines, or for
  * known-hot keys).
  *
  * Protocol: min-of-3 per arm after a warmup (graft.Profile discipline —
  * this host shows 2-4× load spikes). Output: one JSON line.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val salts = sys.env.getOrElse("SPARK_GRAFT_SALTS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables._

    // Skewed probe: every even orderkey collapses onto key 1 (~50% of
    // rows), amplified ×10 so the straggler task is measurable on
    // local[32]. Deterministic — no rand().
    def skewedFact: DataFrame = lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .withColumn("_rep", explode(sequence(lit(1), lit(10))))
      .drop("_rep")
      .withColumn("k", when(col("l_orderkey") % 2 === 0, lit(1L))
        .otherwise(col("l_orderkey")))

    // Unique-key build side over the same key domain (too big to matter
    // as a broadcast here only because we disable broadcast — the point
    // is the shuffle-join regime).
    def dim: DataFrame = orders(spark, sfDir)
      .select(when(col("o_orderkey") % 2 === 0, lit(1L))
        .otherwise(col("o_orderkey")).as("k"))
      .distinct()
      .withColumn("payload", pmod(col("k"), lit(97)).cast("double"))

    // Per-joined-row work heavy enough that reduce-side cost dominates
    // the (identical) scan cost of each arm — sha2 stands in for the real
    // per-row effort of a wide join+aggregate. It runs AFTER the join, on
    // the reducer that owns the key: exactly where the straggler forms.
    // The final select CONSUMES the hashed sum — a bare .count() would let
    // Catalyst prune the unused aggregate and skip the work entirely.
    def run(j: DataFrame): Long = j.groupBy("k")
      .agg(sum(length(sha2(repeat(concat_ws(",", col("k"),
        col("l_extendedprice"), col("payload")), 8), 256))).as("h"))
      .select(max(col("h")).as("m"), count(lit(1)).as("n"))
      .collect()(0).getAs[Long]("n")

    def time(thunk: () => Long): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        thunk()
        (System.nanoTime() - t0) / 1e9
      }.min

    def withConf(pairs: (String, String)*)(body: => Double): Double = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val noMitigation = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false")

    run(skewedFact.join(dim, Seq("k"))) // warmup: JIT + codegen

    val plainRows = run(skewedFact.join(dim, Seq("k")))
    val saltedRows =
      run(graft.ops.ScaleOps.saltedJoin(skewedFact, dim, "k", salts))
    require(plainRows == saltedRows,
      s"salted join changed the result: $plainRows vs $saltedRows")

    val plain = withConf(noMitigation: _*) {
      time(() => run(skewedFact.join(dim, Seq("k"))))
    }
    val salted = withConf(noMitigation: _*) {
      time(() =>
        run(graft.ops.ScaleOps.saltedJoin(skewedFact, dim, "k", salts)))
    }
    val aqeSkew = withConf(noMitigation.init: _*) { // skew-join ON
      time(() => run(skewedFact.join(dim, Seq("k"))))
    }
    println(s"""{"fixture":"half-hot x10 $sfDir","salts":$salts,""" +
      s""""plain_smj":${Bench.num(plain)},""" +
      s""""salted":${Bench.num(salted)},""" +
      s""""plain_aqe_skew":${Bench.num(aqeSkew)},""" +
      s""""groups":$plainRows}""")
    spark.stop()
  }
}
