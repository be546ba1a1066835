package graft

object Profile {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_SHUFFLE sweeps spark.sql.shuffle.partitions without a
    // rebuild (SCALE.md cluster-shape audit: prove plans don't depend on
    // the local[32] sweet spot); cores stay pinned at 32.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // session shape (incl. heartbeat armor) shared with Bench via
    // Sessions — a stability-knob tweak lands in both entry points
    val spark = Sessions.builder(cpus, shuffle).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_EXPLAIN=1 additionally dumps the EXECUTED (post-AQE,
    // isFinalPlan=true) physical plan after run 1 — the evidence a
    // "does AQE coalesce this exchange" adjudication needs, which
    // .explain() before execution cannot show.
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // SPARK_GRAFT_ACTION=rdd times queryExecution.toRdd.count() — the
    // honest full-materialization action Bench uses for the window
    // family since r14 (count() prunes unreferenced Window nodes).
    // Default stays count() so sweep columns remain comparable to the
    // r11/r12 solo protocol; an rdd-action row is labeled as such.
    val rddAction = sys.env.get("SPARK_GRAFT_ACTION").contains("rdd")
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      val n = if (rddAction) df.queryExecution.toRdd.count() else df.count()
      val act = if (rddAction) "action=rdd " else ""
      println(f"PROFILE $name run$i $act${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      if (explain && i == 1) {
        // drive df's OWN plan to its final adaptive shape WITHOUT
        // materializing the result on the driver (fact-proportional
        // outputs would OOM an sf100 adjudication run — ADVICE r12).
        // Must be THIS queryExecution's toRdd: Dataset.foreach/rdd
        // build a separate deserializing QueryExecution, whose
        // execution would leave the plan printed below non-final.
        df.queryExecution.toRdd.foreach(_ => ())
        println(s"PLAN $name:\n${df.queryExecution.executedPlan}")
      }
      // same reset as Bench: clearCache drops pinned blocks, System.gc()
      // prompts ContextCleaner to delete finished shuffle files — at
      // sf100 three runs of one heavy query otherwise stack ~3x residue
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
