package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-pruned-join crossover measurement (BENCH_NOTES "bloom pruning"
  * entry) — the same honest-measurement shape as [[SkewBench]].
  *
  * The oracle-gated `bloom_pruned_join` proves the two-pass plan is
  * row-identical to the plain join; `bloom_prune_stats` pins FN=0 and
  * the fp rate. What neither records is whether the saved shuffle WINS
  * — the claim that matters at 100 TB, where the fact-side exchange is
  * the job. This main measures it: lineitem joined to the selective
  * expensive-order band (the gate query's exact shape, ~4% selectivity)
  * plain vs bloom-pruned, with broadcast DISABLED (the regime the
  * operator exists for: dim too big to broadcast, so Spark picks a
  * shuffle join) and Spark's own runtime bloom injection DISABLED in
  * both measured arms (it would silently convert the "plain" arm into
  * the bloom arm); a third arm re-enables it as the built-in reference.
  *
  * Output: one JSON line with min-of-3 wall times AND per-arm shuffle
  * write bytes (task-metrics listener) — the shuffle saving is the
  * mechanism, so it is recorded alongside the effect.
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.add(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
    def dim: DataFrame = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 480000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

    def consume(j: DataFrame): (Long, Double) = {
      val r = j.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s")).collect()(0)
      (r.getAs[Long]("n"), r.getAs[Double]("s"))
    }

    def plainJoin(): DataFrame = li.join(dim, col("l_orderkey") === col("o_orderkey"))
    // size the filter from the dim's scale: ~4% of orders pass the band.
    // A constant of the fixture — computed ONCE outside the timed loops,
    // so the bloom arm is charged only the bloomFilter construction, not
    // an extra per-iteration dim scan.
    val expected = math.max(10000L, Tables.orders(spark, sfDir).count() / 20)
    def bloomJoin(): DataFrame =
      graft.ops.BloomOps.bloomPrunedJoin(li, dim, "l_orderkey", "o_orderkey",
        expectedItems = expected, fpp = 0.01)

    def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val noRuntimeFilter = noBroadcast ++ Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false")

    // correctness pin: both arms must agree before anything is timed
    consume(plainJoin()) // warmup: JIT + codegen
    val pRes = consume(plainJoin())
    val bRes = consume(bloomJoin())
    require(pRes._1 == bRes._1 && math.abs(pRes._2 - bRes._2) < 1e-6 * math.abs(pRes._2),
      s"bloom join changed the result: $pRes vs $bRes")

    // (min seconds, shuffle bytes of the min run) per arm
    def time(thunk: () => Unit): (Double, Long) =
      (1 to 3).map { _ =>
        shuffleBytes.reset()
        val t0 = System.nanoTime()
        thunk()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously (the bus is
        // private[spark]); wait until the counter stabilizes
        var prev = -1L
        while (prev != shuffleBytes.sum()) {
          prev = shuffleBytes.sum()
          Thread.sleep(150)
        }
        (sec, shuffleBytes.sum())
      }.minBy(_._1)

    var plain = (0.0, 0L); var bloom = (0.0, 0L); var builtin = (0.0, 0L)
    withConf(noRuntimeFilter: _*) {
      plain = time(() => { consume(plainJoin()); () })
      bloom = time(() => { consume(bloomJoin()); () })
    }
    withConf((noBroadcast ++ Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true")): _*) {
      builtin = time(() => { consume(plainJoin()); () })
    }

    println(s"""{"fixture":"lineitem x expensive-orders $sfDir",""" +
      s""""plain_smj":${Bench.num(plain._1)},""" +
      s""""plain_shuffle_mb":${Bench.num(plain._2 / 1e6)},""" +
      s""""bloom_pruned":${Bench.num(bloom._1)},""" +
      s""""bloom_shuffle_mb":${Bench.num(bloom._2 / 1e6)},""" +
      s""""builtin_runtime_filter":${Bench.num(builtin._1)},""" +
      s""""builtin_shuffle_mb":${Bench.num(builtin._2 / 1e6)},""" +
      s""""rows":${pRes._1}}""")
    spark.stop()
  }
}
