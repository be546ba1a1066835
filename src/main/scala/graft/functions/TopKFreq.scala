package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Space-Saving heavy hitters — a typed `Aggregator` (the user-facing
  * custom-aggregate tier) for "top frequent tokens without a full
  * groupBy", the aggregate a 100 TB text pipeline needs when the token
  * domain doesn't fit a shuffle.
  *
  * Metwally/Agrawal/El Abbadi Space-Saving with `capacity` counters:
  * counts are exact for any item whose true frequency exceeds n/capacity;
  * merge is the standard counter-sum + prune. The buffer is a bounded
  * map, so memory is O(capacity) per partition regardless of input size.
  */
object TopKFreq {

  final case class Counters(counts: Map[String, Long], error: Map[String, Long])

  /** An aggregator returning the top `k` items with their (over-)counts,
    * using `capacity` internal counters (capacity ≥ k; more capacity =
    * tighter error). */
  def aggregator(k: Int, capacity: Int): Aggregator[String, Counters, Seq[(String, Long)]] =
    new Aggregator[String, Counters, Seq[(String, Long)]] {

      override def zero: Counters = Counters(Map.empty, Map.empty)

      override def reduce(b: Counters, item: String): Counters = {
        val counts = mutable.Map.from(b.counts)
        val errors = mutable.Map.from(b.error)
        if (counts.contains(item)) counts(item) += 1
        else if (counts.size < capacity) { counts(item) = 1; errors(item) = 0 }
        else {
          // evict the current minimum; new item inherits its count+1 with
          // that count recorded as the possible over-estimate
          val (minItem, minCount) = counts.minBy(p => (p._2, p._1))
          counts.remove(minItem); errors.remove(minItem)
          counts(item) = minCount + 1
          errors(item) = minCount
        }
        Counters(counts.toMap, errors.toMap)
      }

      override def merge(a: Counters, b: Counters): Counters = {
        val counts = mutable.Map.from(a.counts)
        val errors = mutable.Map.from(a.error)
        b.counts.foreach { case (item, c) =>
          counts.updateWith(item) {
            case Some(x) => Some(x + c)
            case None => Some(c)
          }
          errors.updateWith(item) {
            case Some(x) => Some(x + b.error.getOrElse(item, 0L))
            case None => Some(b.error.getOrElse(item, 0L))
          }
        }
        if (counts.size > capacity) {
          val keep = counts.toSeq.sortBy(p => (-p._2, p._1)).take(capacity)
            .map(_._1).toSet
          counts.filterInPlace { case (i, _) => keep(i) }
          errors.filterInPlace { case (i, _) => keep(i) }
        }
        Counters(counts.toMap, errors.toMap)
      }

      override def finish(r: Counters): Seq[(String, Long)] =
        r.counts.toSeq.sortBy(p => (-p._2, p._1)).take(k)

      override def bufferEncoder: Encoder[Counters] = Encoders.product
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
