package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proves the Z-order layout actually prunes: per-file min/max boxes
  * (what the parquet footer exposes to the scan planner) must overlap a
  * 2-dim query box on only a small fraction of the z-ordered files,
  * while a single-column sort layout cannot prune the other dimension
  * at all.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val nFiles = 16

  /** files whose [min,max] box overlaps the query box on BOTH dims */
  private def overlapping(path: String, loP: Long, hiP: Long, loS: Long,
      hiS: Long): Long =
    Layout.fileBoxes(spark, path, Seq("l_partkey", "l_suppkey"))
      .filter(col("min_l_partkey") <= hiP && col("max_l_partkey") >= loP &&
        col("min_l_suppkey") <= hiS && col("max_l_suppkey") >= loS)
      .count()

  test("z-order boxes prune a 2-dim query; a 1-dim sort cannot") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity")
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val linDir = Files.createTempDirectory("graft_linear").toString
    try {
      Layout.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"),
        nFiles)
      // the naive alternative: sorted by partkey only
      li.repartitionByRange(nFiles, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(linDir)

      // a selective box on both dims (~5% of each dimension's range)
      val (loP, hiP) = (100L, 200L)
      val (loS, hiS) = (10L, 15L)
      val zHit = overlapping(zDir, loP, hiP, loS, hiS)
      val linHit = overlapping(linDir, loP, hiP, loS, hiS)
      // z-order: both dims partially cluster, few boxes overlap
      assert(zHit <= nFiles / 2, s"z-order overlapped $zHit/$nFiles")
      assert(zHit <= linHit,
        s"z-order ($zHit) pruned worse than linear ($linHit)")

      // the dimension the linear sort ignores: a pure suppkey range
      // overlaps EVERY linear file but only a fraction of z-order files
      val zS = overlapping(zDir, Long.MinValue, Long.MaxValue, loS, hiS)
      val linS = overlapping(linDir, Long.MinValue, Long.MaxValue,
        loS, hiS)
      assert(linS == nFiles,
        s"expected no suppkey pruning from the linear layout ($linS)")
      assert(zS < nFiles, s"z-order gave no suppkey pruning ($zS)")

      // correctness: the layout is a permutation, not a transformation
      val a = spark.read.parquet(zDir)
        .agg(count(lit(1)), sum("l_quantity")).head
      val b = li.agg(count(lit(1)), sum("l_quantity")).head
      assert(a == b, "z-ordered rewrite changed the data")
    } finally {
      def rm(p: String): Unit = {
        val d = new java.io.File(p)
        Option(d.listFiles).foreach(_.foreach(f => f.delete()))
        d.delete()
      }
      rm(zDir); rm(linDir)
    }
  }

  test("z-value is built from codegen'd integer ops (no UDF) and one " +
    "exchange feeds the write") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey")
    val planned = Layout.withZValue(li, Seq("l_partkey", "l_suppkey"))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
    val p = planned.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "z-value fell out of codegen")
    assert(
      "Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one range exchange:\n${p.take(1200)}")
  }
}
