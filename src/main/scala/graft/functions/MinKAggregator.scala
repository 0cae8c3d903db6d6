package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded distinct min-k of longs as a typed `Aggregator` — the
  * K-minimum-values (KMV) distinct sketch's accumulator (Bar-Yossef et
  * al. 2002): keep the k smallest DISTINCT hash values seen; the k-th
  * smallest estimates the distinct count as `(k−1)·2³² div h_k` (hashes
  * uniform on a 2³²-space ⇒ the k-th order statistic sits ≈ k/n of the
  * way up the range).
  *
  * Mergeability is the point: union of two sketches = min-k of the
  * concatenation, exactly what `merge` computes — so every partition
  * reduces to ≤ k values BEFORE the shuffle (map-side combine), the
  * exchange carries O(partitions·k) longs however many rows flow, and
  * the same merge is what a streaming aggregation does batch over
  * batch. `finish` emits the ascending value list so callers read the
  * k-th smallest as the last element.
  */
class MinKAggregator(k: Int)
    extends Aggregator[Long, List[Long], List[Long]] {

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], x: Long): List[Long] =
    if (buf.contains(x)) buf
    else (x :: buf).sorted.take(k)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: List[Long]): List[Long] = r.sorted

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()

  override def outputEncoder: Encoder[List[Long]] = bufferEncoder
}
