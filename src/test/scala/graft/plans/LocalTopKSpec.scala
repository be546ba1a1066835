package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LocalTopKSpec extends AnyFunSuite {

  // the shared session carries the graft extensions
  private lazy val spark: SparkSession = graft.SparkSpec.session

  private def topkDf(k: Int) = {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val w = Window.partitionBy("user_id")
      .orderBy(desc("value"), asc("event_id"))
    e.select(col("event_id"), col("user_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  test("rule inserts LocalTopKExec below the window exchange") {
    val plan = topkDf(5).queryExecution.executedPlan.toString
    assert(plan.contains("LocalTopK"), plan.take(1500))
  }

  test("results identical to an unrewritten reference computation") {
    val accelerated = topkDf(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._2, t._4))
    // reference: full unfiltered window (rule needs the Filter to fire),
    // top-5 selection done driver-side
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val w = Window.partitionBy("user_id")
      .orderBy(desc("value"), asc("event_id"))
    val full = e.select(col("event_id"), col("user_id"), col("value"))
      .withColumn("rn", row_number().over(w))
    assert(!full.queryExecution.executedPlan.toString.contains("LocalTopK"))
    val expected = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .filter(_._4 <= 5)
      .sortBy(t => (t._2, t._4))
    assert(accelerated.toSeq == expected.toSeq)
    assert(accelerated.nonEmpty)
  }

  test("rn = 1 (argmax per key) also accelerates and matches") {
    val w = Window.partitionBy("user_id").orderBy(desc("value"),
      asc("event_id"))
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val top1 = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(top1.queryExecution.executedPlan.toString.contains("LocalTopK"))
    val n = top1.count()
    val users = e.select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(n == users)
  }

  test("cardinality overflow passes rows through; final result stays exact") {
    import graft.plans.{LocalTopKExec}
    import org.apache.spark.sql.catalyst.expressions.SortOrder
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("value"))
    val childPlan = e.queryExecution.executedPlan
    val userAttr = childPlan.output.find(_.name == "user_id").get
    val valueAttr = childPlan.output.find(_.name == "value").get
    val order = Seq(SortOrder(valueAttr,
      org.apache.spark.sql.catalyst.expressions.Descending))
    // tiny cap: with k=2, maxKeys = 4/2 = 2 tracked keys; the data has
    // 15 users, so most rows take the pass-through path
    val exec = LocalTopKExec(Seq(userAttr), order, k = 2,
      child = childPlan, maxRetainedRows = 4)
    val reduced = exec.execute().map(_.copy()).collect()
    val total = e.count()
    assert(reduced.length < total, "some reduction happened")
    // every user's true top-2 by value must survive the pre-reduction
    val schema = e.schema
    val survived = reduced.map { r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }.toSet
    val truth = e.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2)))
      .groupBy(_._2).values.flatMap(_.sortBy(-_._3).take(2))
    truth.foreach(t => assert(survived.contains(t),
      s"top row $t lost by pre-reduction"))
  }

  test("rank() <= k accelerates, keeping boundary ties") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    // coarse ordering value (event_type has few distinct values per user) →
    // guaranteed ties at the boundary, the case that needs tie-keeping
    val w = Window.partitionBy("user_id").orderBy(asc("event_type"))
    val ranked = e.select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(ranked.queryExecution.executedPlan.toString.contains("LocalTopK"),
      ranked.queryExecution.executedPlan.toString.take(1500))
    val accelerated = ranked.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._2, t._3, t._1)).toSeq
    val full = e.select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("r", rank().over(w))
    assert(!full.queryExecution.executedPlan.toString.contains("LocalTopK"))
    val expected = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .filter(_._4 <= 3).sortBy(t => (t._2, t._3, t._1)).toSeq
    assert(accelerated == expected)
    assert(accelerated.nonEmpty)
  }

  test("dense_rank() <= k accelerates and keeps whole value classes") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val w = Window.partitionBy("user_id").orderBy(asc("event_type"))
    val ranked = e.select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("dr", dense_rank().over(w)).filter(col("dr") <= 2)
    assert(ranked.queryExecution.executedPlan.toString.contains("LocalTopK"))
    val accelerated = ranked.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._2, t._3, t._1)).toSeq
    val full = e.select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("dr", dense_rank().over(w))
    val expected = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .filter(_._4 <= 2).sortBy(t => (t._2, t._3, t._1)).toSeq
    assert(accelerated == expected)
    assert(accelerated.nonEmpty)
  }

  test("row_number among other rank-family window exprs still accelerates") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val w = Window.partitionBy("user_id")
      .orderBy(desc("value"), asc("event_id"))
    val df = e.select(col("event_id"), col("user_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("r", rank().over(w))
      .filter(col("rn") <= 4)
    assert(df.queryExecution.executedPlan.toString.contains("LocalTopK"),
      df.queryExecution.executedPlan.toString.take(1500))
    val accelerated = df.collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val full = e.select(col("event_id"), col("user_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("r", rank().over(w))
    val expected = full.collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
      .filter(_._2 <= 4).sortBy(t => (t._1, t._2)).toSeq
    assert(accelerated == expected)
  }

  test("non-matching shapes are not rewritten") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val w = Window.partitionBy("user_id").orderBy(desc("value"))
    // a partition-wide aggregate alongside row_number: dropping rows
    // locally would change the sum — must stay stock
    val mixed = e.withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))))
      .withColumn("s", sum("value").over(Window.partitionBy("user_id")))
      .filter(col("rn") <= 3)
    assert(!mixed.queryExecution.executedPlan.toString.contains("LocalTopK"))
    // percent_rank reads the partition size — also unsafe
    val pct = e.withColumn("pr", percent_rank().over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))))
      .filter(col("rn") <= 3)
    // (separate Window specs may split into two Window nodes; the assert
    // is only that no unsafe plan is produced — results must match stock)
    val pctRows = pct.count()
    assert(pctRows > 0)
    // filter on something else entirely
    val other = e.withColumn("rn", row_number().over(
      Window.partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("value") > 100)
    assert(!other.queryExecution.executedPlan.toString.contains("LocalTopK"))
  }
}
