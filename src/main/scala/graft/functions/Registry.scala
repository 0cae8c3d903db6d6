package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT vec_dot(a, b) …")` works alongside the Column API
  * (the full "switchover" story: reference users get both surfaces).
  */
object Registry {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_cosine",
      exprs => VectorExpressions.cosineExpr(exprs(0), exprs(1)),
      "scala_udf")
  }
}
