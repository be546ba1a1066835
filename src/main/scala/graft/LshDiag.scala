package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Measures the LSH codegen cliff that motivated the fused
  * [[graft.functions.LshTableBuckets]] kernel (round 10).
  *
  * Both arms run the IDENTICAL logical shape — project per-table
  * buckets, posexplode to (vec_id, t, b), broadcast-join the query
  * side's buckets, count — differing only in how the bucket column is
  * computed: the retired compositional form (120 inlined literal-array
  * dot products in one expression tree) vs the fused kernel (one
  * codegen call). The compositional arm's fused stage blows past the
  * JVM's compiled-method limits and the whole stage — scan, dots,
  * probe — runs uncompiled; measured 97.8 s vs 1.2 s on sf10 (200k
  * vectors, min of 3). Arms are result-pinned equal before timing.
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf10")

    def arm(bucketsOf: Column => Column): DataFrame = {
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("tb", bucketsOf(col("v")))
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          posexplode(col("tb")).as(Seq("t", "b")))
      e.select(col("vec_id"), posexplode(col("tb")).as(Seq("t", "b")))
        .join(broadcast(qs), Seq("t", "b"))
        .filter(col("vec_id") =!= col("query_id"))
    }

    val fused = arm(v => VectorOps.lshTableBuckets(v))
    val comp = arm(v => VectorOps.lshTableBucketsCompositional(v))
    val nF = fused.count()
    val nC = comp.count()
    require(nF == nC, s"arms disagree: fused=$nF compositional=$nC")
    println(s"LSHDIAG arms result-pinned equal: $nF candidate rows")

    for ((label, df) <- Seq("fused_kernel" -> fused,
        "compositional" -> comp)) {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"LSHDIAG $label%-14s min_of_3 $t%.2f s")
    }
    spark.stop()
  }
}
