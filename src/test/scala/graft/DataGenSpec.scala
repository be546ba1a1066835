package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins DataGen's load-bearing claim: every row derives only from its
  * id, so the generated content is IDENTICAL for any partition count —
  * which is what makes sf1+ regenerable (SCALE.md cites the data as
  * deterministic). Generates a tiny scale twice with different slice
  * counts and compares full-table hashes, plus the distribution
  * contracts queries depend on. */
class DataGenSpec extends SparkSpec {

  private lazy val (dirA, dirB) = {
    val a = graft.util.TempDirs.deleteOnExit(
      Files.createTempDirectory("graft-dgA").toString)
    val b = graft.util.TempDirs.deleteOnExit(
      Files.createTempDirectory("graft-dgB").toString)
    DataGen.generate(spark, 0.002, a, slices = Some(2))
    DataGen.generate(spark, 0.002, b, slices = Some(7))
    (a, b)
  }

  test("output is identical for different partition counts") {
    for (t <- Tables.names) {
      val ha = spark.read.parquet(s"$dirA/$t.parquet")
      val hb = spark.read.parquet(s"$dirB/$t.parquet")
      assert(ha.columns.sameElements(hb.columns), t)
      // order-insensitive content hash over every column (decimal sum:
      // a long sum of 64-bit hashes overflows under ANSI mode)
      def h(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = df
        .select(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(sum(col("h"))).head.getDecimal(0)
      assert(h(ha) == h(hb), s"$t content differs across slice counts")
      assert(ha.count() == hb.count(), t)
    }
  }

  test("distribution contracts the query set depends on") {
    val docs = spark.read.parquet(s"$dirA/documents.parquet")
    // floor of 500 docs below sf0.01; near-dups carry the " dup" suffix
    assert(docs.count() == 500)
    val nearDups = docs.filter(col("text").endsWith(" dup")).count()
    assert(nearDups == 25, s"expected 5% near-dups, got $nearDups")
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0)
    val ev = Tables.events(spark, dirA) // the nanos-as-long read path
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.filter(col("ts") < lit("2024-01-01") ||
      col("ts") >= lit("2024-01-31")).count() == 0)
    val li = spark.read.parquet(s"$dirA/lineitem.parquet")
    val perOrder = li.groupBy("l_orderkey").count()
      .agg(avg("count")).head.getDouble(0)
    // Poisson(4) conditioned on >=1 has mean 4/(1-e^-4) ~ 4.075
    assert(math.abs(perOrder - 4.075) < 0.2, s"lines/order $perOrder")
    val emb = spark.read.parquet(s"$dirA/embeddings.parquet")
    val norms = emb.select(graft.ops.VectorOps.dot(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double"))).as("n2"))
      .agg(min("n2"), max("n2")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-5, "embeddings not unit-norm")
  }
}
