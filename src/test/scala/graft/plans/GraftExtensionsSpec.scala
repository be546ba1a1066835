package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The extensions need their own session (withExtensions is builder-time),
  * so this spec does not share the SparkSpec session. */
class GraftExtensionsSpec extends AnyFunSuite {

  // the shared session carries the graft extensions
  private lazy val spark: SparkSession = graft.SparkSpec.session

  test("HOF dot-product pattern is rewritten to the native expression") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
    // resolution rule output is visible in the analyzed plan (the
    // optimizer then constant-folds this local-data example away)
    val plan = hof.queryExecution.analyzed.toString
    assert(plan.contains("graft_dot"), plan)
    assert(hof.collect()(0).getDouble(0) == 32.0)
    // and on a file-backed (non-foldable) frame it survives to the
    // physical plan:
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val filePlan = e.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("norm_sq"))
      .queryExecution.executedPlan.toString
    assert(filePlan.contains("graft_dot"), filePlan.take(800))
  }

  test("pattern with different shapes is left untouched") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // sum of sums, not a dot product — must NOT be rewritten
    val other = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!other.queryExecution.analyzed.toString.contains("graft_dot"))
    assert(other.collect()(0).getDouble(0) == 10.0)
    // non-zero init — must NOT be rewritten
    val init = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v).as("s"))
    assert(!init.queryExecution.analyzed.toString.contains("graft_dot"))
    assert(init.collect()(0).getDouble(0) == 12.0)
    // repeated lambda variable (sum of squares of a) — must NOT be
    // rewritten to DotProduct(a, b)
    val squares = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * x),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!squares.queryExecution.analyzed.toString.contains("graft_dot"))
    assert(squares.collect()(0).getDouble(0) == 1.0 + 4.0)
    // repeated accumulator variable — must NOT be rewritten
    val accacc = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + acc).as("s"))
    assert(!accacc.queryExecution.analyzed.toString.contains("graft_dot"))
  }

  test("graft_dot is registered as a SQL function") {
    import spark.implicits._
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) FROM vecs").collect()
    assert(r(0).getDouble(0) == 11.0)
  }

  test("graft_dot on the SQL surface widens integer arrays via an " +
    "implicit cast — never a byte reinterpretation") {
    import spark.implicits._
    Seq((Array(1, 2), Array(3.0, 4.0))).toDF("ai", "b")
      .createOrReplaceTempView("vecs_int")
    val q = spark.sql("SELECT graft_dot(ai, b) AS d FROM vecs_int")
    // analysis inserted a cast (ImplicitCastInputTypes), and the value
    // is the arithmetic answer, not reinterpreted garbage
    assert(q.queryExecution.analyzed.toString.contains("cast"))
    assert(q.collect()(0).getDouble(0) == 11.0)
  }
}
