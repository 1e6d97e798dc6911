package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: mergeable Misra–Gries frequent-items summary of at most
  * `k` (key, weight) entries.
  *
  * The classic bounded-state heavy-hitter sketch: counting a key already
  * tracked increments it; a new key takes a free slot if one exists;
  * otherwise EVERY tracked count is decremented by one (zeros evicted) —
  * charging the new item and k tracked items one occurrence each. Any
  * key with true frequency > n/(k+1) must end with weight > 0, because
  * each decrement event consumes k+1 occurrences of the stream and can
  * happen at most n/(k+1) times: the summary is a GUARANTEED superset
  * of the keys above that threshold, with per-key undercount at most
  * n/(k+1).
  *
  * `merge` keeps the summary mergeable (the partial+final aggregate
  * contract): sum the two maps pointwise, and if more than k keys
  * remain, subtract the (k+1)-th largest weight from every entry and
  * evict non-positives — the batched equivalent of that many
  * decrement-all steps, preserving the same error bound over the
  * combined stream (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Why this beats `groupBy(key).count()` at 100 TB: a full grouped
  * count shuffles EVERY distinct key (for n-gram or URL keys, billions
  * of rows); this aggregate reduces each partition to at most k entries
  * before the exchange, so shuffle volume is k × partitions regardless
  * of key cardinality. The summary's weights are order-dependent
  * UNDERestimates, not exact counts — callers wanting exact,
  * deterministic output follow with a candidate-restricted exact pass
  * ([[graft.operators.Profiling.heavyHitters]]).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long],
                       Map[String, Long]] {
  require(k > 0)

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long],
                      a: String): mutable.HashMap[String, Long] = {
    b.get(a) match {
      case Some(c) => b(a) = c + 1
      case None if b.size < k => b(a) = 1L
      case None =>
        b.mapValuesInPlace((_, c) => c - 1)
        b.filterInPlace((_, c) => c > 0)
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1(key) = b1.getOrElse(key, 0L) + c }
    if (b1.size > k) {
      // (k+1)-th largest weight; subtracting it leaves at most k
      // strictly-positive entries
      val m = b1.values.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      b1.mapValuesInPlace((_, c) => c - m)
      b1.filterInPlace((_, c) => c > 0)
    }
    b1
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
    b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
