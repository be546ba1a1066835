package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the corpus-size guard on the exact quadratic near-dup baseline
  * (VERDICT r6 item 2): at or below the cap the guard keeps EVERY
  * vector (the oracle hash must not move at test scales); above the cap
  * it hash-samples down to ~cap vectors deterministically, so the
  * all-pairs stage is bounded at any corpus size. */
class QuadGuardSpec extends SparkSpec {

  private def kept(n: Long): Long = {
    import spark.implicits._
    val ids = spark.range(n).select(col("id").as("vec_id"))
    val nv = ids.agg(count(lit(1)).as("n_vecs"))
    ids.crossJoin(broadcast(nv))
      .filter(VectorOps.quadGuard(col("vec_id"), col("n_vecs")))
      .count()
  }

  test("at or below the cap every vector passes — exact result") {
    assert(kept(2000L) === 2000L)
    assert(kept(VectorOps.quadCap) === VectorOps.quadCap)
  }

  test("above the cap the sample is ~cap and deterministic") {
    val n = 4 * VectorOps.quadCap
    val k1 = kept(n)
    // Binomial(n, cap/n): mean = cap, sd = sqrt(cap·(1−1/4)) ≈ 87.
    // ±6 sd keeps the assertion far outside flake range while still
    // pinning "bounded at ~cap, not ~n".
    assert(math.abs(k1 - VectorOps.quadCap) < 600,
      s"sampled $k1 of $n, expected ≈${VectorOps.quadCap}")
    assert(kept(n) === k1, "portable-hash sample must be deterministic")
  }

  test("emb_neardup_pairs still returns the exact pair set at test sf") {
    // At sf0.01 the guard is inert (500 ≤ cap): the guarded query must
    // equal the unguarded all-pairs result exactly.
    val d = "/root/testdata/sf0.01"
    val q = graft.SparkEntry.queries("emb_neardup_pairs")
    val guarded = q(spark, d)
    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(VectorOps.dot(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("norm").as("nb"))
    val plain = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorOps.cosineWithNorms(col("va"), col("vb"),
          col("na"), col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.9)
    assert(guarded.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(guarded).count() === 0L)
  }
}
