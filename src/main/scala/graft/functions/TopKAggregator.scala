package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator`: keeps at most k (score, id)
  * pairs, ordered by score descending with id ascending as the
  * deterministic tie-break.
  *
  * Versus `row_number().over(Window…)` top-k, this is map-side
  * combinable: every partition reduces to ≤ k candidates *before* the
  * shuffle, so the exchange carries O(partitions·k) rows instead of the
  * whole group — the shape that survives a 100× scale-up of the corpus.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], List[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(
      buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    (x :: buf).sorted(ord).take(k)

  override def merge(
      a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: List[(Double, Long)]): List[(Double, Long)] =
    r.sorted(ord)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[List[(Double, Long)]] = bufferEncoder
}
