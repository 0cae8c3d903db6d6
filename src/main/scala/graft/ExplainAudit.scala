package graft

/** Dev tool: dump formatted plans for the scale-critical queries so
  * pushdown/pruning/broadcast regressions are visible.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_topk_revenue", "f2_filter_predicate",
        "sort_topk", "dedup_minhash_lsh", "sim_topk_bruteforce")
    names.foreach { n =>
      println(s"######## $n")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
