package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.ops.TextOps
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"STAGE $tag ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val docs = Tables.documents(spark, d).select(col("doc_id"),
      array_distinct(TextOps.shingles(split(col("text")," "), 3)).as("sh"))
    for (_ <- 1 to 2) {
      time("shingle_only") { docs.count() }
      val exploded = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      time("explode") { exploded.count() }
      val sigCols = (0 until 16).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
      val sigs = exploded.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      time("sigs") { sigs.count() }
      time("full") { ops.TextOps.queries("minhash_lsh_pairs")(spark, d).count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
