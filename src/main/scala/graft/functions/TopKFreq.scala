package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Space-Saving heavy hitters — a typed `Aggregator` (the user-facing
  * custom-aggregate tier) for "top frequent tokens without a full
  * groupBy", the aggregate a 100 TB text pipeline needs when the token
  * domain doesn't fit a shuffle.
  *
  * Metwally/Agrawal/El Abbadi Space-Saving with `capacity` counters.
  * On a single unmerged sketch, counts are exact for any item whose true
  * frequency exceeds n/capacity (error 0 ⇒ exact). After merges no
  * exactness is claimed — per-item `errors` carry the uncertainty.
  * Merge is counter-sum + prune with absent-side charging (an item
  * missing from one sketch is charged that sketch's eviction bound into
  * both count and error), so the invariant true ≤ count ≤ true + error
  * survives arbitrary merge trees — fuzz-pinned in TopKFreqPropSpec
  * across random streams, splits, and merge orders. The buffer is a plain
  * mutable object serialized with Kryo — mutation happens in place per
  * row, serialization only at partial-aggregation boundaries (the same
  * lifecycle TypedImperativeAggregate uses), so reduce() is O(1) map ops,
  * not a per-row copy.
  */
object TopKFreq {

  /** Tie order identical to a SQL engine's binary collation: unsigned
    * bytewise comparison of the UTF-8 encodings. Java's String
    * compareTo orders by UTF-16 code units, which DISAGREES with
    * UTF-8/code-point order when a supplementary-plane string (high
    * surrogate 0xD800-0xDBFF) ties against a BMP char ≥ U+E000 — on an
    * all-ASCII corpus the two orders coincide, so the divergence is
    * invisible until non-ASCII tokens tie at a top-k boundary. */
  private[functions] val utf8Order: Ordering[String] =
    (a: String, b: String) => java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** count desc, then UTF-8-binary item asc — the ranking used by the
    * eviction, the merge prune, and top(), kept identical so the
    * sketch's determinism claims hold under one collation. */
  private val byCountDescItemAsc: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](-_._2)
      .orElse(Ordering.by[(String, Long), String](_._1)(utf8Order))

  /** Mutable sketch state: item → (count, possible over-estimate).
    *
    * `floor` makes merge-pruning safe: when a capacity-overflow merge
    * drops low counters, the largest dropped count is folded into the
    * floor, and any later (re-)insertion starts at floor+1 with floor as
    * its error. A dropped-then-reinserted item therefore can never
    * UNDER-estimate its true count — the sketch keeps the Space-Saving
    * invariant (true ≤ count ≤ true + error) across merges; items with
    * error 0 are exact. */
  final class SpaceSaving(val capacity: Int) extends Serializable {
    val counts = new mutable.HashMap[String, Long]
    val errors = new mutable.HashMap[String, Long]
    var floor: Long = 0L

    def add(item: String): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1)
        case None if counts.size < capacity =>
          counts.update(item, floor + 1L); errors.update(item, floor)
        case None =>
          // evict the current minimum (deterministic tie-break by item);
          // the newcomer inherits count+1 with that count as its error.
          // The floor guard covers post-merge states where an item from
          // a lower-floor sketch is the current minimum.
          val (minItem, minCount0) = counts.minBy(p => p)(
            Ordering.by[(String, Long), Long](_._2)
              .orElse(Ordering.by[(String, Long), String](_._1)(utf8Order)))
          val minCount = math.max(minCount0, floor)
          counts.remove(minItem); errors.remove(minItem)
          counts.update(item, minCount + 1)
          errors.update(item, minCount)
      }
    }

    /** Upper bound on the true count of an item ABSENT from this
      * sketch: add()-evicted mass is bounded by the current minimum
      * counter (counters only grow, and an item is evicted while at the
      * minimum); merge-pruned mass is bounded by the floor. Below
      * capacity, add() never evicts, so only the floor applies. */
    private def absentCharge: Long =
      if (counts.size >= capacity && counts.nonEmpty)
        math.max(floor, counts.values.min)
      else floor

    def mergeWith(other: SpaceSaving): SpaceSaving = {
      // An item absent from one side may still have been seen there —
      // evicted by add() or dropped by a merge-prune. Charging the
      // absent side's bound to both count and error keeps the invariant
      // true <= count <= true + error across merges (the overestimate
      // is the price of mergeability; items with error 0 stay exact).
      val thisCharge = absentCharge
      val otherCharge = other.absentCharge
      val seenInOther = other.counts.keySet
      other.counts.foreach { case (item, c) =>
        counts.update(item, counts.getOrElse(item, thisCharge) + c)
        errors.update(item,
          errors.getOrElse(item, thisCharge) + other.errors.getOrElse(item, 0L))
      }
      counts.keysIterator.filterNot(seenInOther).toSeq.foreach { item =>
        counts.update(item, counts(item) + otherCharge)
        errors.update(item, errors(item) + otherCharge)
      }
      // an item absent from BOTH sides is bounded by the charge sum
      floor = thisCharge + otherCharge
      if (counts.size > capacity) {
        val sorted = counts.toSeq.sorted(byCountDescItemAsc)
        val keep = sorted.take(capacity).map(_._1).toSet
        // dropped mass is accounted in the floor, not silently lost
        floor = math.max(floor, sorted.drop(capacity).head._2)
        counts.filterInPlace { case (i, _) => keep(i) }
        errors.filterInPlace { case (i, _) => keep(i) }
      }
      this
    }

    def top(k: Int): Seq[(String, Long)] =
      counts.toSeq.sorted(byCountDescItemAsc).take(k)
  }

  /** An aggregator returning the top `k` items with their (over-)counts,
    * using `capacity` internal counters (capacity ≥ k; more capacity =
    * tighter error). */
  def aggregator(k: Int, capacity: Int): Aggregator[String, SpaceSaving, Seq[(String, Long)]] =
    new Aggregator[String, SpaceSaving, Seq[(String, Long)]] {
      override def zero: SpaceSaving = new SpaceSaving(capacity)
      override def reduce(b: SpaceSaving, item: String): SpaceSaving = {
        b.add(item); b
      }
      override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving =
        a.mergeWith(b)
      override def finish(r: SpaceSaving): Seq[(String, Long)] = r.top(k)
      override def bufferEncoder: Encoder[SpaceSaving] =
        Encoders.kryo[SpaceSaving]
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
