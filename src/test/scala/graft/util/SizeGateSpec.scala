package graft.util

import graft.SparkSpec

/** The size-gated broadcast hint: hints while Catalyst's size estimate
  * is bounded, degrades to the unhinted (shuffle-capable) frame past
  * the bound — the audit class for dims that are small at every
  * measured scale but fact-proportional in the limit. */
class SizeGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("small dim is hinted: the join plans as BroadcastHashJoin even " +
    "with the planner's own threshold disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable the planner's stats broadcast so the BHJ below can only
      // come from the gate's hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      val c = graft.Tables.customer(spark, sf).select("c_custkey", "c_name")
      val p = o.join(SizeGate.broadcastIfSmall(c),
          o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dim past the bound is NOT hinted") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      val c = graft.Tables.customer(spark, sf).select("c_custkey", "c_name")
      // a 1-byte bound: every real frame is "too big" — the scale-safe
      // arm must be the plain shuffled join
      val p = o.join(SizeGate.broadcastIfSmall(c, maxBytes = 1L),
          o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), p.take(1200))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
