package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // args(0) is always the query name; flags are parsed from the rest, so
    // a query whose name collides with a flag spelling still resolves.
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    // --final: execute first, so AQE's final plan (runtime join demotions,
    // ReusedExchange dedup of repeated subtrees) is what prints — the
    // pre-execution adaptive plan shows none of that. Must execute THIS
    // DataFrame's own plan: count(), foreachPartition, and a noop write
    // all build a SEPARATE QueryExecution and leave this one untouched.
    // Draining queryExecution.toRdd runs this plan's own
    // AdaptiveSparkPlanExec to its final phase with nothing buffered on
    // the driver, so it stays safe against a larger-than-fixture dir.
    if (args.drop(1).contains("--final"))
      df.queryExecution.toRdd.foreach(_ => ())
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
