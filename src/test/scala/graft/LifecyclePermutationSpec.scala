package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, StreamingQueries}

/** The schedule-permutation property: the lifecycle capstones pin TWO
  * schedules (batch-composed and streaming-door) against the oracles;
  * this spec closes the CLASS. For each seed, a pseudo-random
  * resident/arrival split folds through the SAME phase-body/door
  * machinery with the takedown and the compaction at seeded boundary
  * positions (and the graph's vacuum at its own seeded position), and
  * the three rebuild-semantics stores must STILL land exactly on
  * rebuild-without over the survivors — commutativity wherever the
  * engine claims it. The graph, path-dependent by design, asserts its
  * structural invariants per schedule instead.
  */
class LifecyclePermutationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("seeded schedule permutations of arrivals/takedown/compaction " +
      "converge with rebuild-without on all three rebuild-semantics " +
      "stores; the graph's invariants hold under every schedule") {
    val M = StreamingQueries.TakedownMod
    val R = StreamingQueries.TakedownRem
    // rebuild-without references, computed once (schedule-independent)
    val (refTextDf, refDedupDf) =
      StreamingQueries.lifecycleRebuildRef(spark, sf)
    val refText = refTextDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    val refDedup = refDedupDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val survPairs = Dedup.queries("dedup_minhash_verified")(spark, sf)
      .filter(pmod(col("a_id"), lit(M)) =!= R &&
        pmod(col("b_id"), lit(M)) =!= R)
      .select(col("a_id"), col("b_id"))
    val refCc = Dedup.connectedComponentsWithRounds(survPairs)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gDeg = 16 // Similarity.GnavDegree (private[operators]); the
    // existing gnav specs pin the same literal
    for (seed <- Seq(7, 11, 13, 17, 23)) {
      val (textDf, dedupDf, ccDf, gnavDf) =
        StreamingQueries.lifecyclePermuted(spark, sf, seed)
      val text = textDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sorted
      assert(text.length == refText.length, s"seed $seed: text rows")
      assert(text.sameElements(refText), s"seed $seed: text scores")
      val dedup = dedupDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(dedup.length == refDedup.length, s"seed $seed: band rows")
      assert(dedup.sameElements(refDedup), s"seed $seed: band pairs")
      val cc = ccDf.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cc == refCc, s"seed $seed: labels")
      // the graph: hard-removal held, cap held, non-trivial
      val adj = gnavDf.collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(adj.nonEmpty, s"seed $seed: empty adjacency")
      assert(adj.forall { case (a, b) => a != b }, s"seed $seed: self")
      assert(adj.forall { case (a, b) => a % M != R && b % M != R },
        s"seed $seed: victim endpoint survived the schedule")
      assert(adj.groupBy(_._1).values.forall(_.length <= gDeg),
        s"seed $seed: degree cap")
    }
  }
}
