package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized equivalence check for every LocalTopK mode: accelerated
  * plans must match a driver-side reference computation on random data
  * with heavy ties, across random k. (Deterministic seeds.) */
class LocalTopKPropSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  private def referenceTopK(rows: Seq[(Long, Long, Long)], k: Int,
      mode: String): Set[(Long, Long, Long)] =
    rows.groupBy(_._2).values.flatMap { grp =>
      // order by (v asc, id asc) — a total order for row_number;
      // rank/dense_rank ranked on v alone (ties share a rank)
      val sorted = grp.sortBy(r => (r._3, r._1))
      mode match {
        case "row_number" => sorted.take(k)
        case "rank" =>
          sorted.zipWithIndex.filter { case (r, i) =>
            sorted.count(_._3 < r._3) < k
          }.map(_._1)
        case "dense_rank" =>
          val classes = sorted.map(_._3).distinct.take(k).toSet
          sorted.filter(r => classes(r._3))
      }
    }.toSet

  test("accelerated rank-family limits match reference (12 random trials)") {
    import spark.implicits._
    for (trial <- 1 to 12) {
      val rnd = new Random(trial * 104729L)
      val nRows = 50 + rnd.nextInt(300)
      val nKeys = 1 + rnd.nextInt(8)
      val nVals = 1 + rnd.nextInt(6) // few distinct values → heavy ties
      val k = 1 + rnd.nextInt(4)
      val rows = (1 to nRows).map(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(nVals).toLong))
      val df = rows.toDF("id", "key", "v").repartition(8)

      val wTotal = Window.partitionBy("key").orderBy(asc("v"), asc("id"))
      val wTies = Window.partitionBy("key").orderBy(asc("v"))

      def run(c: org.apache.spark.sql.Column) =
        df.withColumn("r", c).filter(col("r") <= k)
          .select("id", "key", "v").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val rn = run(row_number().over(wTotal))
      assert(rn == referenceTopK(rows, k, "row_number"),
        s"trial $trial row_number mismatch (k=$k keys=$nKeys vals=$nVals)")

      val rk = run(rank().over(wTies))
      assert(rk == referenceTopK(rows, k, "rank"),
        s"trial $trial rank mismatch (k=$k keys=$nKeys vals=$nVals)")

      val dr = run(dense_rank().over(wTies))
      assert(dr == referenceTopK(rows, k, "dense_rank"),
        s"trial $trial dense_rank mismatch (k=$k keys=$nKeys vals=$nVals)")
    }
  }
}
