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
