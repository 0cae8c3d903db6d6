package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters as a typed `Aggregator`: a bounded-memory
  * frequency summary of at most `cap` counters, mergeable across
  * partitions (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantees after any sequence of reduces and merges over N items:
  * for every item x, `est(x) <= f(x)` (never over-counts) and
  * `f(x) - est(x) <= N / (cap + 1)` — so any item with frequency above
  * N/(cap+1) is guaranteed present in the summary. That bound is what
  * the spec asserts against exact counts.
  *
  * Versus the exact `groupBy(term).count()` top-k, the exchange carries
  * O(partitions · cap) counters instead of the whole distinct-term
  * domain — the 100 TB shape when the domain (n-grams, URLs, tokens)
  * is itself huge. The exact variant stays the oracle-checked face
  * (`corpus_ngrams`); this is its scale path, like `sim_ann_*` next to
  * `sim_topk_bruteforce`.
  */
class HeavyHittersAggregator(cap: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  /** Add one item; on overflow subtract the minimum counter from all
    * (the batched form of MG's decrement-all) and drop the zeros.
    */
  override def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
    val grown = b.updated(x, b.getOrElse(x, 0L) + 1L)
    if (grown.size <= cap) grown else shrink(grown)
  }

  /** Merge = pointwise sum, then one shrink back to `cap` counters —
    * the PODS'12 construction that keeps the error bound additive.
    */
  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (summed.size <= cap) summed else shrink(summed)
  }

  /** Subtract the (cap+1)-th largest counter value from every counter
    * and keep the strictly-positive survivors (at most `cap` of them).
    */
  private def shrink(m: Map[String, Long]): Map[String, Long] = {
    val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)
      .lift(cap).getOrElse(0L)
    m.collect { case (k, v) if v > cut => k -> (v - cut) }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}
