package graft.sources

import graft.SparkSpec
import graft.ingest.Tsv
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val o = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory survives — clear both
    for (t <- Seq("li_bkt", "o_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketing.writeBucketed(li, "li_bkt", Seq("l_orderkey"), 4,
      Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bkt", Seq("l_orderkey"), 4,
      Seq("l_orderkey"))
    // force SMJ so the exchange-free claim is about bucketing, not
    // broadcasting
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "li_bkt", "o_bkt",
        Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange"), plan.take(1500))
      // and it is still correct
      val n = joined.count()
      val expected = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("landToParquet partitions by load_date and sorts within partitions") {
    val d = Files.createTempDirectory("graft-land")
    graft.Fixtures.writeAll(d)
    val blocks = Tsv.read(spark,
      d.resolve("blockchair_bitcoin_blocks_20250820.tsv.gz").toString,
      graft.schema.BlockchairSchemas.blocks).drop("_corrupt_record")
    val out = Files.createTempDirectory("graft-landed")
    Tsv.landToParquet(blocks, "2025-08-20", out.toString, Seq("id"))
    Tsv.landToParquet(blocks, "2025-08-21", out.toString, Seq("id"))
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 6)
    assert(back.select("load_date").distinct().count() == 2)
    // partition pruning: filtering one date reads one partition directory
    val pruned = back.filter(col("load_date") === "2025-08-20")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(pruned.count() == 3)
  }
}
