package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

/** The dq_checks registry run hashes the healthy all-zero result on the
  * clean synthetic tables; these specs prove the rules actually DETECT
  * violations, on deliberately dirty literal frames.
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("duplicateKeys flags exactly the repeated keys") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val dups = Profiling.duplicateKeys(df, "k")
      .as[(Long, Long)].collect().toMap
    assert(dups == Map(2L -> 2L, 3L -> 3L))
  }

  test("danglingFk returns child rows with no parent, keeps matched ones") {
    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L)).toDF("id", "fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val dangling = Profiling.danglingFk(child, "fk", parent, "pk")
      .select($"id").as[Long].collect().toSet
    assert(dangling == Set(12L))
  }

  test("dq_checks folds row-local rules: four jobs, bounded table scans") {
    // r7 ran one checked/violations aggregate PAIR per rule (~10 scans);
    // the folded shape reads orders 3x (PK-keyed agg, FK child, temporal
    // join side), customer 2x, lineitem 1x — 6 file scans for 5 rules,
    // and lineitem (the 100-TB fact table) exactly once
    val plan = SparkEntry.queries("dq_checks")(spark, SparkTestSession.sf)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 6, s"expected <=6 parquet scans, got $scans:\n$plan")
    assert("lineitem".r.findAllIn(plan.toLowerCase)
      .length >= 1, "sanity: lineitem present")
  }

  test("dangling-FK anti join broadcasts a small parent") {
    val child = Seq((10L, 1L), (12L, 99L)).toDF("id", "fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val plan = Profiling.danglingFk(child, "fk", parent, "pk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"expected broadcast anti join:\n$plan")
  }
}
