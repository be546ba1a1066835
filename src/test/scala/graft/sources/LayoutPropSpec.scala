package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized structural properties of the Morton z-value (computed
  * through the REAL Spark expression on a local frame, not a Scala
  * re-implementation): bijectivity on 16-bit pairs and per-dimension
  * monotonicity — the two facts the pruning argument rests on.
  */
class LayoutPropSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  /** Evaluate the z-value expression for raw 16-bit bucket pairs by
    * feeding bounds that make bucket16 the identity: lo=0, hi=65536
    * over a value domain scaled accordingly. */
  private def zOf(pairs: Seq[(Long, Long)]): Seq[Long] = {
    import spark.implicits._
    val df = pairs.toDF("x", "y")
      .withColumn("__min_x", lit(0L)).withColumn("__max_x", lit(65536L))
      .withColumn("__min_y", lit(0L)).withColumn("__max_y", lit(65536L))
      .withColumn("z", Layout.zValue2("x", "y"))
    df.select("z").collect().map(_.getLong(0)).toSeq
  }

  test("z-value is injective on random 16-bit pairs") {
    val rnd = new Random(42)
    val pairs = Seq.fill(2000)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).distinct
    val zs = zOf(pairs)
    assert(zs.distinct.size == pairs.size,
      "two distinct (x,y) pairs collided in z")
  }

  test("z-value is monotone in each dimension with the other fixed") {
    val rnd = new Random(7)
    val xs = Seq.fill(200)(rnd.nextInt(65536).toLong).distinct.sorted
    val yFix = 12345L
    val zX = zOf(xs.map(x => (x, yFix)))
    assert(zX == zX.sorted, "z not monotone in x at fixed y")
    val zY = zOf(xs.map(y => (yFix, y)))
    assert(zY == zY.sorted, "z not monotone in y at fixed x")
  }

  test("z-value interleaves fairly: single-dimension ranges map to " +
    "bounded z-spans (the pruning lemma, spot-checked)") {
    // an ALIGNED x-range of width 2^k at fixed y varies only k low
    // bits, which interleave into the low 2k z-bits — the span stays
    // under 2^(2k) instead of smearing over the 32-bit z-space.
    // (Alignment matters: an unaligned range crossing a high-bit carry
    // legitimately jumps in z — that is the curve's block structure.)
    val xs = (1024L to 1087L).toSeq // width 64, 64-aligned
    val zs = zOf(xs.map(x => (x, 40000L)))
    val span = zs.max - zs.min
    assert(span < (1L << 12),
      s"aligned 64-wide x-slice spanned $span of z-space (expected < 2^12)")
  }
}
