package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKFreqSpec extends SparkSpec {

  test("space-saving top-k matches exact counts for true heavy hitters") {
    import spark.implicits._
    // 3 heavy tokens + a long tail
    val heavy = Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma")
    val tail = (1 to 400).map(i => s"tail$i")
    val data = scala.util.Random.javaRandomToRandom(
      new java.util.Random(42)).shuffle(heavy ++ tail)
    val ds = spark.createDataset(data).repartition(8)

    val agg = TopKFreq.aggregator(k = 3, capacity = 64)
    val result = ds.select(agg.toColumn).collect()(0)
    val items = result.map(_._1)
    assert(items == Seq("alpha", "beta", "gamma"))
    // counts are exact when capacity >> tail collisions per partition —
    // space-saving over-estimates by at most the evicted minimum
    val byItem = result.toMap
    assert(byItem("alpha") >= 500 && byItem("alpha") <= 520)
    assert(byItem("beta") >= 300 && byItem("beta") <= 320)
  }

  test("token heavy hitters over the documents table") {
    import spark.implicits._
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("tok"))
      .as[String]
    val agg = TopKFreq.aggregator(k = 5, capacity = 256)
    val top = toks.select(agg.toColumn).collect()(0)
    assert(top.size == 5)
    // sanity against exact counts: the #1 item must be the true max
    val exact = toks.groupBy("tok").count()
      .orderBy(desc("count"), asc("tok")).limit(1).collect()(0)
    assert(top.head._1 == exact.getString(0))
    assert(top.head._2 == exact.getLong(1)) // exact for true heavy hitter
  }
}
