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

  test("dq_schema_drift shares are consistent and PSI derives from them") {
    val rows = SparkEntry.queries("dq_schema_drift")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    val byCol = rows.groupBy(_.getAs[String]("col_name"))
    assert(byCol.keySet == Set("event_type", "value"))
    byCol.foreach { case (c, rs) =>
      // counts split the table: every row is in exactly one version half
      assert(rs.map(r => r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum ==
        Tables.load(spark, SparkTestSession.sf, "events").count(), c)
      // integer-div shares sum to at most 10000 and within bucket-count slack
      val so = rs.map(_.getAs[Long]("share_old_bp")).sum
      assert(so <= 10000 && so > 10000 - rs.length, s"$c old shares $so")
      // the float PSI lives HERE, outside the hash gate: finite on the
      // stable buckets, tiny on this stationary synthetic (no real drift)
      val psi = rs.filter(_.getAs[String]("status") == "stable").map { r =>
        val po = math.max(r.getAs[Long]("share_old_bp"), 1L) / 10000.0
        val pn = math.max(r.getAs[Long]("share_new_bp"), 1L) / 10000.0
        (pn - po) * math.log(pn / po)
      }.sum
      assert(psi >= 0 && psi < 0.1, s"$c psi=$psi")
    }
    // drift detection trips on a planted shift: relabel half the NEW
    // half's clicks as a fresh category and the report must flag it
    val ev = Tables.load(spark, SparkTestSession.sf, "events")
    val tsl = expr("unix_micros(CAST(ts AS TIMESTAMP))")
    val b = ev.agg(min(tsl), max(tsl)).first()
    val (t0, t1) = (b.getLong(0), b.getLong(1))
    val planted = ev.withColumn("event_type",
      when(tsl * 2 >= t0 + t1 && $"event_type" === "click"
        && pmod($"event_id", lit(2)) === 0, lit("click_v2"))
        .otherwise($"event_type"))
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_")
    planted.write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val drifted = SparkEntry.queries("dq_schema_drift")(spark, dir.toString)
      .collect()
    val v2 = drifted.filter(r => r.getAs[String]("bucket") == "click_v2")
    assert(v2.length == 1 && v2.head.getAs[String]("status") == "new")
    val click = drifted.filter(r => r.getAs[String]("bucket") == "click").head
    assert(click.getAs[Long]("drift_bp") > 200,
      s"expected visible click drift, got ${click.getAs[Long]("drift_bp")}")
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
