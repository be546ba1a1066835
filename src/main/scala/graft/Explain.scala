package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    // --final: execute first, so AQE's final plan (runtime join demotions,
    // ReusedExchange dedup of repeated subtrees) is what prints — the
    // pre-execution adaptive plan shows none of that. Must execute THIS
    // DataFrame's own plan: count() builds a separate QueryExecution and
    // leaves this one untouched, so it is collect-and-discard here
    // (fixture-scale inputs only).
    if (args.contains("--final")) df.collect()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
