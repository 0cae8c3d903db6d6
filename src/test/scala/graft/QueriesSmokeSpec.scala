package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and yields a well-formed result.
  * (Value correctness is the DuckDB oracle gate's job; this catches
  * regressions early and asserts the queries/oracleSql contract.)
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and has stable column names") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.distinct.length == df.columns.length,
        "duplicate column names break the comparator")
    }
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
