package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact top-k (by score, descending; ties broken by smaller
  * id) per group WITHOUT a per-group sort of all rows.
  *
  * The buffer is a bounded min-heap of k (score, id) pairs, merged
  * associatively — so Spark plans it as a partial+final aggregate with
  * map-side combine: each partition reduces its rows to at most k pairs
  * before the shuffle. Compare the window formulation
  * (`row_number().over(partitionBy(g).orderBy(desc(score)))` + filter):
  * that shuffles EVERY row and sorts every group. For top-k-per-key over
  * 100 TB, the heap aggregate moves k rows per key per partition instead.
  *
  * Output is sorted descending, ready for posexplode into ranks.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)],
                       Seq[(Double, Long)]] {
  require(k > 0)

  // min-heap on (score, -id): the head is the WORST retained entry —
  // smallest score, then largest id (ties prefer smaller id to survive)
  private def heapOrder: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrder)

  private def push(b: mutable.PriorityQueue[(Double, Long)],
                   e: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    if (b.size < k) b.enqueue(e)
    else if (heapOrder.lt(e, b.head)) { b.dequeue(); b.enqueue(e) }
    b
  }

  override def reduce(b: mutable.PriorityQueue[(Double, Long)],
                      a: (Double, Long)): mutable.PriorityQueue[(Double, Long)] =
    push(b, a)

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] =
    b2.foldLeft(b1)(push)

  override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
    b.toSeq.sortBy { case (s, id) => (-s, id) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
