package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin

/** The Bloom pre-filter's two contractual properties: it never loses a
  * true match (no false negatives) and it actually prunes (the whole
  * point). Value-level equality with the plain semi-join is the DuckDB
  * oracle's job.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  private def urgent = Tables.load(spark, sf, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("bloom prefilter keeps every true match and prunes most others") {
    val lineitem = Tables.load(spark, sf, "lineitem")
    val pruned = BloomJoin.bloomPrefilter(
      lineitem, "l_orderkey", BloomJoin.bloomBuild(spark, urgent))

    val trueKeys = lineitem
      .join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey").as[Long].collect().toSet
    val prunedKeys = pruned.select("l_orderkey").as[Long].collect().toSet
    assert(trueKeys.subsetOf(prunedKeys), "bloom dropped a true match")

    val total = lineitem.count()
    val kept = pruned.count()
    // urgent priority is ~1/5 of orders; at 2^20 bits / 5 hashes the FP
    // rate is ~5e-5, so the kept fraction should sit near the true rate
    assert(kept < total * 0.4,
      s"bloom pruned too little: kept $kept of $total")
    // false positives are rare: kept keys beyond the true ones are few
    assert((prunedKeys -- trueKeys).size <= math.max(5, trueKeys.size / 100),
      s"unexpectedly many false positives: ${(prunedKeys -- trueKeys).size}")
  }

  test("an empty build side yields an all-reject filter") {
    val lineitem = Tables.load(spark, sf, "lineitem")
    val none = urgent.filter(lit(false))
    val pruned = BloomJoin.bloomPrefilter(
      lineitem, "l_orderkey", BloomJoin.bloomBuild(spark, none))
    assert(pruned.count() == 0)
  }
}
