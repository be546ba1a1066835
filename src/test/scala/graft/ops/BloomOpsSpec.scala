package graft.ops

import graft.SparkSpec
import graft.functions.BloomExprs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Pins the bloom-pruned join: the no-false-negative invariant (result
  * identity with the plain join), the probe expression's behavior
  * under codegen and serialization, the eager-query schema contract,
  * and the plan shape that makes the operator worth having — the
  * bloom Filter sits DIRECTLY on the fact scan, before any exchange
  * or join. */
class BloomOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("probe expression: inserted keys always hit; nulls stay null") {
    import spark.implicits._
    val dim = (0L until 1000L).map(k => k * 7).toDF("k")
    val bf = dim.stat.bloomFilter("k", 1000L, 0.01)
    val probed = (0L until 7000L).toDF("v")
      .select(col("v"), BloomExprs.mightContainLong(col("v"), bf).as("hit"))
      .collect()
    probed.foreach { r =>
      val v = r.getLong(0)
      if (v % 7 == 0) assert(r.getBoolean(1), s"false negative at $v")
    }
    // false positives exist but must be rare at fpp=0.01
    val fp = probed.count(r => r.getLong(0) % 7 != 0 && r.getBoolean(1))
    assert(fp < 6000 * 0.05, s"fp=$fp out of 6000 non-members")
    val withNull = Seq[Option[Long]](Some(7L), None).toDF("v")
      .select(BloomExprs.mightContainLong(col("v"), bf).as("hit"))
      .collect()
    assert(withNull(0).getBoolean(0))
    assert(withNull(1).isNullAt(0), "null key must probe to null")
  }

  test("bloom-pruned join is row-identical to the plain join") {
    import spark.implicits._
    val fact = (0L until 5000L).map(i => (i % 701, i)).toDF("k", "payload")
    val dim = (0L until 701L by 13).toDF("k2")
    val pruned = BloomOps
      .bloomPrunedJoin(fact, dim, "k", "k2", 100L, 0.01)
      .select(col("k"), col("payload")).as[(Long, Long)].collect().sorted
    val plain = fact.join(dim, col("k") === col("k2"))
      .select(col("k"), col("payload")).as[(Long, Long)].collect().sorted
    assert(pruned.sameElements(plain))
  }

  test("eager contract: bloom_pruned_join output schema is pinned") {
    val df = graft.SparkEntry.queries("bloom_pruned_join")(spark, sf)
    assert(df.schema.fields.map(f => (f.name, f.dataType.simpleString))
      .toSeq == Seq(("l_returnflag", "string"), ("n_items", "bigint"),
        ("sum_price", "double")))
    assert(df.count() > 0)
  }

  test("eager contract: bloom_prune_stats emits its gate row with the " +
    "invariants intact") {
    val df = graft.SparkEntry.queries("bloom_prune_stats")(spark, sf)
    assert(df.schema.fieldNames.toSeq == Seq("total", "survived",
      "matching", "false_negatives", "survived_frac", "fp_rate"))
    val rows = df.collect()
    assert(rows.length == 1, "gate row vanished — bloom invariant broke")
    val r = rows.head
    assert(r.getAs[Long]("false_negatives") == 0L)
    assert(r.getAs[Double]("fp_rate") <= 0.05)
    // the whole point: most of the fact scan never reaches the join
    assert(r.getAs[Double]("survived_frac") < 0.25,
      s"pruning too weak: ${r.getAs[Double]("survived_frac")}")
    assert(r.getAs[Long]("survived") >= r.getAs[Long]("matching"))
  }

  test("plan: the bloom filter probes directly on the fact scan, below " +
    "any exchange or join") {
    val df = graft.SparkEntry.queries("bloom_pruned_join")(spark, sf)
    val plan = df.queryExecution.sparkPlan
    val bloomFilters = plan.collect {
      case f: FilterExec
          if f.condition.toString.contains("graft_bloom_might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "bloom probe filter missing from plan:\n" +
      plan.toString.take(2000))
    // the filter's child must be the raw fact scan — nothing (join,
    // exchange, aggregate) may run before the pruning
    val child = bloomFilters.head.child
    val isScan = child.isInstanceOf[FileSourceScanExec] ||
      child.isInstanceOf[BatchScanExec] ||
      child.getClass.getSimpleName.contains("Scan")
    assert(isScan, s"bloom filter sits on ${child.getClass.getSimpleName}, " +
      "not the scan")
    assert(child.toString.contains("lineitem"))
  }
}
