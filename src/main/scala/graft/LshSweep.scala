package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ANN-LSH geometry grid: for each (tables, bits) config,
  * mean top-10 recall against the exact brute-force twin and the
  * candidate fraction (distinct scored pairs / full scan), at each sf
  * dir given on the command line (defaults to sf0.01 + sf0.1). This is
  * the evidence behind the production config and the recall-gate floor
  * in `graft.ops.RecallOps` — measured, not guessed. */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // 5–7 bits: the near-uniform driver-fixture regime (neighbors at
    // cos 0.24–0.42 — low bits or nothing collides). 10–12 bits: the
    // clustered regime (DataGen `clustered` dirs, in-cluster cos ≈0.98 —
    // high bits keep recall while cross-cluster collisions vanish).
    val grid = Seq((8, 6), (12, 6), (16, 6), (20, 6), (12, 5), (16, 7),
      (4, 10), (8, 10), (8, 12), (16, 10))
    for (d <- dirs) {
      val exact = SparkEntry.queries("ann_cosine_topk")(spark, d)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
      val nVecs = Tables.embeddings(spark, d).count()
      for ((tables, bits) <- grid) {
        val cands = ops.VectorOps.lshCandidates(spark, d, tables, bits)
          .select("query_id", "vec_id").cache()
        val nCands = cands.count()
        val got = ops.VectorOps.lshTopK(spark, d, tables, bits)
          .select("query_id", "vec_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet }
        val recalls = exact.map { case (q, truth) =>
          truth.intersect(got.getOrElse(q, Set.empty)).size.toDouble /
            truth.size }
        val meanRecall = recalls.sum / recalls.size
        val candFrac = nCands.toDouble / (exact.size * (nVecs - 1))
        println(f"LSHSWEEP dir=$d tables=$tables bits=$bits " +
          f"recall=$meanRecall%.3f cand_frac=$candFrac%.3f")
        cands.unpersist(blocking = true)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
