package graft.functions

import graft.SparkSpec
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

/** The fused LSH bucket kernel's spec IS the compositional when/dot
  * form it replaced (VectorOps.lshTableBucketsCompositional): both must
  * produce identical array<long> buckets on every vector, including the
  * degenerate shapes. The one intended divergence: a NULL input row is
  * null under the kernel (standard unary-expression null propagation)
  * but all-zero buckets under the compositional form (each when(null >
  * 0) falls to otherwise(0)); the query path never sees a null vector
  * (v is a transform of a non-null parquet column), and explode(null)
  * dropping the row is strictly safer than filing it in bucket 0. */
class LshExprsSpec extends SparkSpec {

  private val dims = 64
  private def rng(seed: Long): Seq[Double] = {
    var s = seed
    Seq.fill(dims) {
      s = SplitMix.mix(s)
      (math.floorMod(s, 2000L) / 1000.0) - 1.0
    }
  }

  test("fused kernel ≡ compositional form on random vectors, both geometries") {
    import spark.implicits._
    val vecs = (1L to 200L).map(rng)
    val df = vecs.toDF("v")
    for ((tables, bits) <- Seq((20, 6), (8, 10), (4, 12))) {
      val rows = df.select(
        VectorOps.lshTableBuckets(col("v"), tables, bits).as("fused"),
        VectorOps.lshTableBucketsCompositional(col("v"), tables, bits)
          .as("comp")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"geometry $tables x $bits diverged: " +
            s"${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }

  test("degenerate vectors: null element and wrong dimension give all-zero buckets in both forms") {
    import spark.implicits._
    val withNullElem: Seq[java.lang.Double] =
      rng(7L).map(x => x: java.lang.Double).updated(13, null)
    val degens: Seq[Seq[java.lang.Double]] = Seq(
      withNullElem,
      Seq[java.lang.Double](1.0, -2.0, 3.0), // dim 3 ≠ 64
      Seq.empty[java.lang.Double])
    val df = degens.toDF("v")
    val rows = df.select(
      VectorOps.lshTableBuckets(col("v")).as("fused"),
      VectorOps.lshTableBucketsCompositional(col("v")).as("comp"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).forall(_ == 0L), s"fused not all-zero: $r")
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("null input: kernel yields null, query path drops the row at explode") {
    import spark.implicits._
    val df = Seq(Option.empty[Seq[Double]]).toDF("v")
    assert(df.select(VectorOps.lshTableBuckets(col("v")))
      .collect()(0).isNullAt(0))
    assert(df.select(posexplode(VectorOps.lshTableBuckets(col("v"))))
      .count() == 0L)
  }

  test("two independently-built identical expressions are equal — " +
    "canonicalization/CSE can dedupe them") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // DISTINCT plane objects with equal content: structural equality
    // (Seq param, not Array reference identity) is what makes the two
    // trees compare equal — the property Catalyst canonicalization and
    // common-subexpression elimination key on. The child is shared so
    // the comparison isolates the planes parameter (a DSL col() would
    // drag call-site Origin metadata into equals).
    def freshPlanes: Seq[Seq[Double]] =
      (1L to 12L).map(s => rng(s).toVector)
    val child = Literal.default(ArrayType(DoubleType))
    val a = LshTableBuckets(child, freshPlanes, 2, 6)
    val b = LshTableBuckets(child, freshPlanes.map(_.toList), 2, 6)
    assert(a == b, "identical lshTableBuckets trees must be equal")
    assert(a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
  }

  test("codegen path and direct kernel call agree (they share LshKernel)") {
    import spark.implicits._
    val vecs = (1L to 50L).map(rng)
    val viaSql = vecs.toDF("v")
      .select(VectorOps.lshTableBuckets(col("v")))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val planes = VectorOps.planes.map(_.toArray).toArray
    val direct = vecs.map { v =>
      LshKernel.buckets(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
        planes, VectorOps.numTables, VectorOps.bitsPerTable)
        .toLongArray().toSeq
    }
    assert(viaSql == direct)
  }
}
