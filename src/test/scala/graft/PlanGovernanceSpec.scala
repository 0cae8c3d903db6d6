package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan governance over the WHOLE registry: no query may plan an
  * unbounded nested-loop join. The allowlist names the queries where a
  * nested-loop is intentional AND bounded — a broadcast build side that
  * stays small at any corpus scale (a fixed query set, a centroid
  * table, a 5-row dim) or an explicitly-capped audit — with the reason
  * pinned here. Anything else containing a BroadcastNestedLoopJoin or
  * CartesianProduct is a scale regression and fails this spec.
  */
class PlanGovernanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val allowedNestedLoop: Map[String, String] = Map(
    "cross_join_small" -> "deliberate cross join of two tiny dims (25 rows)",
    "dedup_ngram_jaccard" -> "audit query, capped at doc_id < 300 by construction",
    "sim_topk_bruteforce" -> "non-equi =!= join against a BROADCAST 10-row query set",
    "sim_topk_agg" -> "same broadcast 10-row query set",
    "sim_ann_lsh" -> "bucket probe against a broadcast query set",
    "sim_ann_ivf" -> "crossJoin against the broadcast centroid table (n/31 rows)",
  )

  test("no registry query plans an unbounded nested-loop join") {
    val offenders = scala.collection.mutable.Map[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect() // settle AQE on this QueryExecution
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      if (plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")) {
        if (!allowedNestedLoop.contains(name)) offenders(name) = plan
      }
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: ${offenders.keys.mkString(", ")}\n" +
        offenders.headOption.map(_._2).getOrElse(""))
  }
}
