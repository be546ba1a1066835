package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized invariant check for the mergeable Space-Saving sketch:
  * across random streams, partitionings, capacities, and merge orders,
  * every surviving item must satisfy true <= count <= true + error.
  * (Deterministic seeds — failures reproduce.) */
class TopKFreqPropSpec extends AnyFunSuite {

  private def zipfStream(rnd: Random, n: Int, vocab: Int): Seq[String] =
    Seq.fill(n) {
      // crude zipf: item k with weight ~ 1/(k+1)
      val u = rnd.nextDouble()
      val k = ((math.pow(vocab.toDouble, u) - 1)).toInt.min(vocab - 1)
      s"tok$k"
    }

  test("merged sketches never underestimate (100 random trials)") {
    for (trial <- 1 to 100) {
      val rnd = new Random(trial * 7919L)
      val n = 200 + rnd.nextInt(800)
      val vocab = 5 + rnd.nextInt(200)
      val capacity = 2 + rnd.nextInt(32)
      val stream = zipfStream(rnd, n, vocab)
      val exact: Map[String, Long] =
        stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

      // random partition split
      val parts = stream.grouped(1 + rnd.nextInt(100)).toSeq
      val sketches = parts.map { p =>
        val s = new TopKFreq.SpaceSaving(capacity)
        p.foreach(s.add)
        s
      }
      // random merge order
      val merged = rnd.shuffle(sketches).reduce(_ mergeWith _)

      assert(merged.counts.size <= capacity)
      merged.counts.foreach { case (item, count) =>
        val err = merged.errors(item)
        val truth = exact(item)
        assert(count >= truth,
          s"trial $trial: $item underestimated ($count < $truth, " +
            s"cap=$capacity parts=${parts.size})")
        assert(count - err <= truth,
          s"trial $trial: $item error bound broken " +
            s"(count=$count err=$err truth=$truth cap=$capacity)")
      }
      // single-sketch (no merge) stays exact when capacity covers vocab
      if (capacity >= exact.size) {
        val s = new TopKFreq.SpaceSaving(capacity)
        stream.foreach(s.add)
        exact.foreach { case (item, truth) =>
          assert(s.counts(item) == truth && s.errors(item) == 0L)
        }
      }
    }
  }
}
