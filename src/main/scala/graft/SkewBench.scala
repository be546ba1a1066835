package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Honest skew demonstration (BENCH_NOTES "skew crossover" entry).
  *
  * The blanket-salt decomposition is result-pinned here (and in
  * SkewSpec) rather than registered as a suite query: its fixed fan-out
  * shuffles fact×salts rows regardless of skew — a measured scale-killer
  * at sf100 (SCALE.md decade 5, finding 3) — so it lives in this bench
  * as evidence, while the registry carries only `skew_adaptive_join`.
  * This main measures the regime salting
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Shared fixture (ScaleOps.skewedFixture — SkewSpec pins the same
    // shape): half the probe rows on ONE key, amplified ×10 so the
    // straggler task is measurable on local[32]; unique-key build side.
    // Broadcast is disabled in the measured arms — the point is the
    // shuffle-join regime where the build side is too big to broadcast.
    val (skewedFact, dim) =
      graft.ops.ScaleOps.skewedFixture(spark, sfDir, amplify = 10)

    // Per-joined-row work heavy enough that reduce-side cost dominates
    // the (identical) scan cost of each arm — sha2 stands in for the real
    // per-row effort of a wide join+aggregate. It runs AFTER the join, on
    // the reducer that owns the key: exactly where the straggler forms.
    // The final select CONSUMES the hashed sum — a bare .count() would let
    // Catalyst prune the unused aggregate and skip the work entirely.
    // Returns (group count, total hashed mass): the mass is 64 × joined
    // rows, so the pair detects both lost groups AND duplicated rows.
    def run(j: DataFrame): (Long, Long) = {
      val r = j.groupBy("k")
        .agg(sum(length(sha2(repeat(concat_ws(",", col("k"),
          col("l_extendedprice"), col("payload")), 8), 256))).as("h"))
        .select(count(lit(1)).as("n"), sum(col("h")).as("m"))
        .collect()(0)
      (r.getAs[Long]("n"), r.getAs[Long]("m"))
    }

    def time(thunk: () => (Long, Long)): Double =
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

    // Adaptive arm: same decomposition with the hot key DETECTED from a
    // 1% sample instead of known a priori — the rowsPerSalt target is
    // fixture-rows / salts so the detected fan-out lands in the same
    // regime as the hand-salted arm.
    val factRows = skewedFact.count()
    def adaptive() = graft.ops.ScaleOps.adaptiveSaltedJoin(
      skewedFact, dim, "k", sampleFraction = 0.01,
      rowsPerSalt = math.max(1L, factRows / salts), maxSalts = salts)

    val plainRes = run(skewedFact.join(dim, Seq("k")))
    val saltedRes =
      run(graft.ops.ScaleOps.saltedJoin(skewedFact, dim, "k", salts))
    require(plainRes == saltedRes,
      s"salted join changed the result: $plainRes vs $saltedRes")
    val adaptiveRes = run(adaptive())
    require(plainRes == adaptiveRes,
      s"adaptive join changed the result: $plainRes vs $adaptiveRes")

    val plain = withConf(noMitigation: _*) {
      time(() => run(skewedFact.join(dim, Seq("k"))))
    }
    val salted = withConf(noMitigation: _*) {
      time(() =>
        run(graft.ops.ScaleOps.saltedJoin(skewedFact, dim, "k", salts)))
    }
    val adaptiveSec = withConf(noMitigation: _*) {
      time(() => run(adaptive())) // includes per-run detection sampling
    }
    val aqeSkew = withConf(noMitigation.init: _*) { // skew-join ON
      time(() => run(skewedFact.join(dim, Seq("k"))))
    }
    println(s"""{"fixture":"half-hot x10 $sfDir","salts":$salts,""" +
      s""""plain_smj":${Bench.num(plain)},""" +
      s""""salted":${Bench.num(salted)},""" +
      s""""adaptive_salted":${Bench.num(adaptiveSec)},""" +
      s""""plain_aqe_skew":${Bench.num(aqeSkew)},""" +
      s""""groups":${plainRes._1}}""")
    spark.stop()
  }
}
