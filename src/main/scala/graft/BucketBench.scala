package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the bucketed layout buys on the J2 composite-key
  * self-join (the most expensive cold join in the bench): the same join
  * over plain parquet vs over the bucketed table layout
  * `Pipeline.writeBuild`/`Bucketing` land, reporting Exchange/Sort node
  * counts and min-of-3 wall time for each. The bucketed write itself is
  * timed too — that's the once-per-layout cost the reads amortize. */
object BucketBench {
  private def exchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan).length

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val buckets = 32
    // Force SMJ: at the scale this layout targets neither join side
    // broadcasts, and the claim under measurement is shuffle
    // elimination, not broadcastability.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def time3(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to 3) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }

    def j2(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val l = df.as("l"); val m = df.as("m")
      l.join(m, col("l.l_orderkey") === col("m.l_orderkey")
          && col("l.l_linenumber") === col("m.l_linenumber"), "left")
        .select(col("l.l_orderkey"), col("l.l_linenumber"),
          col("l.l_quantity"), col("m.l_extendedprice"))
    }

    // Plain layout: the shuffle happens on every run.
    val plain = j2(Tables.lineitem(spark, d))
    val (tPlain, nPlain) = time3(() => plain.count())
    println(f"BUCKETBENCH plain exchanges=${exchanges(
      plain.queryExecution.executedPlan.toString)} " +
      f"time=$tPlain%.2f s rows=$nPlain")

    // Bucketed layout: pay the shuffle once at write.
    // Bucket by BOTH join keys: Spark's co-partition check
    // (spark.sql.requireAllClusterKeysForCoPartition, default true)
    // only elides the shuffle when the bucket keys exactly match the
    // join keys — subset bucketing would still exchange.
    spark.sql("DROP TABLE IF EXISTS bench_lineitem_bkt")
    val t0 = System.nanoTime()
    sources.Bucketing.writeBucketed(Tables.lineitem(spark, d),
      "bench_lineitem_bkt", Seq("l_orderkey", "l_linenumber"), buckets,
      Seq("l_orderkey", "l_linenumber"))
    println(f"BUCKETBENCH write_bucketed time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    val bkt = j2(spark.table("bench_lineitem_bkt"))
    val (tBkt, nBkt) = time3(() => bkt.count())
    println(f"BUCKETBENCH bucketed exchanges=${exchanges(
      bkt.queryExecution.executedPlan.toString)} " +
      f"time=$tBkt%.2f s rows=$nBkt")
    assert(nPlain == nBkt, s"row mismatch: $nPlain vs $nBkt")
    spark.sql("DROP TABLE IF EXISTS bench_lineitem_bkt")
    spark.stop()
  }
}
