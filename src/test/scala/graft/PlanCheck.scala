package graft

import org.apache.spark.sql.DataFrame

/** Shared post-AQE plan inspection: run the SAME QueryExecution first
  * (collect — count()/foreach() would execute a different tree), then
  * read the plan that actually ran (AQE prints the final plan before
  * "== Initial Plan ==").
  */
object PlanCheck {
  def finalPlanString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  def hasNestedLoop(plan: String): Boolean =
    plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
}
