package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKFreqSpec extends SparkSpec {

  test("ties rank in UTF-8 binary order (SQL collation), not UTF-16 " +
    "code-unit order") {
    // U+FFFD (UTF-8: EF BF BD) vs U+1F600 (UTF-8: F0 9F 98 80):
    // binary collation puts U+FFFD FIRST; Java's compareTo would put
    // the emoji first (its high surrogate 0xD83D < 0xFFFD)
    val sketch = new TopKFreq.SpaceSaving(8)
    sketch.add("�"); sketch.add("😀")
    assert(sketch.top(1).map(_._1) == Seq("�"),
      "tie-break diverged from UTF-8 binary order")
  }

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

  test("overflow merges never underestimate (capacity < distinct)") {
    // capacity far below the distinct count across partitions forces
    // capacity-overflow merges; the floor must keep every reported count
    // an over-estimate bounded by its error field.
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta")
    val tail = (1 to 300).flatMap(i => Seq.fill(3)(s"tail$i")) // 300 distinct
    val data = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(heavy ++ tail)
    val exact: Map[String, Long] =
      data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    // drive the sketches directly so the partition split is deterministic
    val partitions = data.grouped(120).toSeq
    val merged = partitions.map { part =>
      val s = new TopKFreq.SpaceSaving(32)
      part.foreach(s.add)
      s
    }.reduce(_ mergeWith _)

    assert(merged.counts.size <= 32)
    merged.counts.foreach { case (item, count) =>
      val err = merged.errors(item)
      assert(count >= exact(item),
        s"$item underestimated: sketch=$count exact=${exact(item)}")
      assert(count - err <= exact(item),
        s"$item error bound broken: count=$count err=$err exact=${exact(item)}")
    }
    // the two real heavy hitters must survive every prune
    val top2 = merged.top(2).map(_._1)
    assert(top2 == Seq("alpha", "beta"))
  }

  test("merge floor covers items pruned on one side, seen on another") {
    // A{x,y}, B{z,w} at capacity 2: merging prunes two items whose mass
    // moves into the floor. C then contributes one pruned item ("y",
    // count 1, true total 11) — without floor inheritance y would
    // re-enter at 1 and underestimate by 10.
    val a = new TopKFreq.SpaceSaving(2)
    (1 to 10).foreach(_ => a.add("x")); (1 to 10).foreach(_ => a.add("y"))
    val b = new TopKFreq.SpaceSaving(2)
    (1 to 10).foreach(_ => b.add("z")); (1 to 10).foreach(_ => b.add("w"))
    val c = new TopKFreq.SpaceSaving(2)
    c.add("y")
    val merged = a.mergeWith(b).mergeWith(c)
    assert(merged.floor >= 10)
    merged.counts.get("y").foreach { cnt =>
      assert(cnt >= 11, s"y underestimated: $cnt < 11")
      assert(cnt - merged.errors("y") <= 11)
    }
  }
}
