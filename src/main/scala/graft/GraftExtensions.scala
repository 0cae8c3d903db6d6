package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Session-extension registration (SURVEY.md §7 preference (c) plumbing):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * injects the custom vector expressions into every session's function
  * registry at build time — the deployment-grade alternative to calling
  * [[graft.functions.Registry.register]] per session. No custom
  * optimizer Rule or SparkStrategy is injected: reference parity needs
  * none (SURVEY.md §4) — Catalyst's own rules handle every plan here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[DotProduct].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    import graft.functions.Registry.{arity1, arity2}
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      arity2("vec_dot")(DotProduct(_, _))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"), info("vec_cosine"),
      arity2("vec_cosine")(graft.functions.VectorExpressions.cosineExpr)))
    ext.injectFunction((FunctionIdentifier("char_run_stats"),
      info("char_run_stats"),
      arity1("char_run_stats")(graft.functions.CharRunStats(_))))
    ext.injectFunction((FunctionIdentifier("bigram_stats"),
      info("bigram_stats"),
      arity1("bigram_stats")(graft.functions.BigramStats(_))))
    ext.injectFunction((FunctionIdentifier("char_bigrams"),
      info("char_bigrams"),
      arity1("char_bigrams")(graft.functions.CharBigrams(_))))
    ext.injectFunction((FunctionIdentifier("cdc_boundaries"),
      info("cdc_boundaries"),
      graft.functions.Registry.cdcBuilder("cdc_boundaries")))
    ext.injectFunction((FunctionIdentifier("rolling_hashes"),
      info("rolling_hashes"),
      graft.functions.Registry.rollingBuilder("rolling_hashes")))
  }
}

/** Manual check for the extension path (needs a fresh session, so it is a
  * main rather than a spec sharing the test session): builds a session
  * with `spark.sql.extensions=graft.GraftExtensions` and calls the
  * injected functions from SQL.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      org.apache.spark.sql.SparkSession.builder().master("local[2]")
        .config("spark.sql.extensions", classOf[GraftExtensions].getName),
      "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      "SELECT vec_dot(array(1D,2D,3D), array(4D,5D,6D)) AS d, " +
        "vec_cosine(array(1D,0D), array(1D,0D)) AS c, " +
        "char_run_stats('aab').n_unique AS u, " +
        "bigram_stats('x y x y').top_n AS t, " +
        "size(char_bigrams('abc')) AS nb, " +
        "size(rolling_hashes('abcdefghijklmnopqr', 16)) AS nh, " +
        "size(cdc_boundaries('abcdefghij', 8, 1)) AS ncb").head()
    println(s"EXT vec_dot=${row.getDouble(0)} vec_cosine=${row.getDouble(1)}")
    assert(row.getDouble(0) == 32.0 && math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getLong(2) == 2L && row.getLong(3) == 2L)
    // 18-char text has 3 sliding 16-windows; mask 1 makes every
    // position past the window a boundary (10 - 8 = 2 interior + end)
    assert(row.getInt(4) == 2 && row.getInt(5) == 3)
    println("EXTENSIONS_OK")
    spark.stop()
  }
}
