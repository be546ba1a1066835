package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {

  test("DotProduct matches the HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.1, 2.2, 3.3), Array(0.5, 0.25, 0.125)),
      (Array(0.0, 0.0), Array(1.0, 1.0)),
      (Array(1e-9, 1e9, -5.5), Array(2.0, 2.0, 2.0)))
      .toDF("a", "b")
    val r = df.select(
      VectorExprs.dotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"native=${row.getDouble(0)} hof=${row.getDouble(1)}")
    }
  }

  test("DotProduct survives both codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val out = df.select(VectorExprs.dotProduct(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    // interpreted (eval) path
    val e = DotProduct(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("a")),
      org.apache.spark.sql.graft.ColumnBridge.expression(col("b")))
    assert(e.prettyName == "graft_dot")
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Option.empty[Array[Double]], Option(Array(1.0))))
      .toDF("a", "b")
    val out = df.select(VectorExprs.dotProduct(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
  }

  test("degenerate shapes mirror the HOF fold: unequal lengths and null " +
    "elements yield null") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0, 3.0),
        Array[java.lang.Double](1.0, 2.0)), // unequal length
      (Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)), // null element
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](3.0, 4.0))) // healthy
      .toDF("a", "b")
    val out = df.select(
      VectorExprs.dotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null mismatch: native=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && !out(2).isNullAt(0))
  }
}
