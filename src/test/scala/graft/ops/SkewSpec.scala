package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew salting on an actually-skewed fixture (the gated
  * `skew_salted_join` query runs on uniform keys, which proves the
  * decomposition, not its value): exact result parity, and the salt
  * distribution property that removes the straggler. SkewBench (main)
  * measures the wall-clock crossover at sf0.1. */
class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the SAME construction SkewBench measures (ScaleOps.skewedFixture):
  // every even orderkey collapses onto key 1 — ~half the rows hot
  private lazy val (skewed, dim) =
    ScaleOps.skewedFixture(spark, sf, amplify = 1)

  test("salted join reproduces the plain join exactly on skewed keys") {
    def agg(j: org.apache.spark.sql.DataFrame) = j.groupBy("k")
      .agg(count(lit(1)).as("n"),
        Parity.decSum(col("l_extendedprice") * col("payload")).as("s"))
      .collect().map(_.toString).sorted
    val plain = agg(skewed.join(dim, Seq("k")))
    val salted = agg(ScaleOps.saltedJoin(skewed, dim, "k", 8))
    assert(plain.sameElements(salted))
  }

  test("salting spreads the hot key's rows near-uniformly over salts") {
    val salts = 8
    val bySalt = ScaleOps.saltFact(skewed.filter(col("k") === 1L), salts)
      .groupBy("_salt").count().collect()
      .map(r => r.getAs[Int]("_salt") -> r.getAs[Long]("count")).toMap
    assert(bySalt.keySet == (0 until salts).toSet,
      s"unused salts: ${(0 until salts).toSet -- bySalt.keySet}")
    val maxShare = bySalt.values.max.toDouble / bySalt.values.sum
    // fair share = 1/8 = 0.125; "no salt above 2× fair" is the property
    // that converts one straggler into `salts` balanced tasks
    assert(maxShare <= 0.25, s"max salt share $maxShare exceeds 2× fair")
  }
}
