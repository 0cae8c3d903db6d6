package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT vec_dot(a, b) …")` works alongside the Column API
  * (the full "switchover" story: reference users get both surfaces).
  */
object Registry {

  /** Arity-validating builder shared by BOTH registration paths (the
    * per-session registry here and the SparkSessionExtensions path in
    * [[graft.GraftExtensions]]) — one definition so the validation can
    * never diverge between them.
    */
  def arity2(name: String)(
      build: (org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      if (exprs.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "2",
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
      build(exprs(0), exprs(1))
    }

  /** Arity-1 twin of [[arity2]]. */
  def arity1(name: String)(
      build: org.apache.spark.sql.catalyst.expressions.Expression =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      if (exprs.length != 1)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "1",
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
      build(exprs(0))
    }

  /** Integer-literal parameter extraction for the parameterized text
    * expressions (window width, boundary mask): these are STRUCTURAL
    * parameters baked into codegen, so they must be literals — a
    * column-valued window would mean a different expression per row.
    */
  private[graft] def litLong(name: String, param: String)(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
        v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"$name ($param must be an integer literal)",
          "expectedNum" -> "literal", "actualNum" -> other.toString,
          "docroot" -> ""))
    }

  /** Builder for `cdc_boundaries(text, window, mask)`. */
  def cdcBuilder(name: String)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      if (exprs.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "3",
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
      CdcBoundaries(exprs(0),
        litLong(name, "window")(exprs(1)).toInt,
        litLong(name, "mask")(exprs(2)))
    }

  /** Builder for `rolling_hashes(text, window)`. */
  def rollingBuilder(name: String)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      if (exprs.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "2",
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
      RollingWindowHashes(exprs(0),
        litLong(name, "window")(exprs(1)).toInt)
    }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", arity2("vec_dot")(DotProduct(_, _)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_cosine",
      arity2("vec_cosine")(VectorExpressions.cosineExpr), "scala_udf")
    reg.createOrReplaceTempFunction(
      "char_run_stats", arity1("char_run_stats")(CharRunStats(_)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "bigram_stats", arity1("bigram_stats")(BigramStats(_)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "char_bigrams", arity1("char_bigrams")(CharBigrams(_)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "cdc_boundaries", cdcBuilder("cdc_boundaries"), "scala_udf")
    reg.createOrReplaceTempFunction(
      "rolling_hashes", rollingBuilder("rolling_hashes"), "scala_udf")
  }
}
