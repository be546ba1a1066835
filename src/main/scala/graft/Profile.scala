package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_SHUFFLE sweeps spark.sql.shuffle.partitions without a
    // rebuild (SCALE.md cluster-shape audit: prove plans don't depend on
    // the local[32] sweet spot); cores stay pinned at 32.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      // same heartbeat armor as Bench: one >120 s heartbeat gap under a
      // saturated sf100 stage is fatal in local mode (no re-register path)
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "20s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.plans.GraftExtensions.install)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"PROFILE $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      // same reset as Bench: clearCache drops pinned blocks, System.gc()
      // prompts ContextCleaner to delete finished shuffle files — at
      // sf100 three runs of one heavy query otherwise stack ~3x residue
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
