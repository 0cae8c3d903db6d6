package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format breadth (JSON lines, CSV round-trips with declared
  * schemas) and the SQL registration of the custom vector expressions.
  */
class SourcesAndSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("events round-trip through JSON lines with declared schema") {
    val dir = Files.createTempDirectory("ev_json").toString
    val orig = Tables.load(spark, sf, "events")
      .withColumn("ts", col("ts").cast("string")) // NTZ not a JSON type
    orig.write.mode("overwrite").json(dir)
    val back = spark.read.schema(orig.schema).json(dir)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
  }

  test("customer round-trips through CSV with header and declared schema") {
    val dir = Files.createTempDirectory("cust_csv").toString
    val orig = Tables.load(spark, sf, "customer")
    orig.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(orig.schema)
      .option("header", "true").csv(dir)
    assert(back.exceptAll(orig).count() == 0 &&
      orig.exceptAll(back).count() == 0)
  }

  test("vec_dot / vec_cosine callable from spark.sql") {
    graft.functions.Registry.register(spark)
    Tables.load(spark, sf, "embeddings").limit(5)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .createOrReplaceTempView("emb_v")
    val rows = spark.sql("""
      SELECT a.vec_id, vec_dot(a.v, b.v) AS d, vec_cosine(a.v, a.v) AS self
      FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }

  test("char_run_stats / bigram_stats callable from spark.sql") {
    graft.functions.Registry.register(spark)
    val r = spark.sql(
      "SELECT char_run_stats('aab') AS c, bigram_stats('x y x y') AS b")
      .selectExpr("c.n_chars", "c.n_unique", "b.n_ngrams", "b.top_n")
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 3L, 2L)))
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bigram_stats('a', 'b')").collect()
    }
    assert(wrongArity.getMessage.toLowerCase.contains("bigram_stats"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_run_stats(42)").collect()
    }
  }

  test("cdc_boundaries / rolling_hashes callable from spark.sql") {
    graft.functions.Registry.register(spark)
    // both parameterized expressions must agree with their Column-API
    // twins on the same text and parameters
    val txt = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(
      s"SELECT cdc_boundaries('$txt', 8, 32) AS b, " +
        s"rolling_hashes('$txt', 16) AS h").head()
    val viaCol = spark.range(1).select(
      graft.functions.TextExpressions.cdc_boundaries(lit(txt), 8, 32L).as("b"),
      graft.functions.TextExpressions.rolling_window_hashes(lit(txt), 16).as("h"))
      .head()
    assert(viaSql.getSeq[Int](0) == viaCol.getSeq[Int](0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    // structural parameters must be literals: a column-valued window is
    // rejected at analysis time, not silently mis-planned
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("cdc_boundaries('abc', CAST(id AS INT), 32)")
        .collect()
    }
  }

  test("vec_dot rejects wrong arity and non-array inputs at analysis time") {
    graft.functions.Registry.register(spark)
    val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(1, 2)").collect()
    }
    assert(wrongType.getMessage.contains("array<double>"), wrongType.getMessage)
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1D), array(1D), array(1D))").collect()
    }
    assert(wrongArity.getMessage.toLowerCase.contains("vec_dot"))
    // float arrays must be cast, not silently misread
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)))").collect()
    }
  }
}
