package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed total-order formulations (two-pass ntile, reduced-
  * domain running sum) must agree row-for-row with Spark's built-in
  * single-partition-window semantics — the oracle checks them against
  * DuckDB; this pins them against Spark's own `Window.orderBy` too.
  */
class DistributedOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("two-pass ntile equals the built-in global-window ntile") {
    val got = graft.operators.Breadth.queries("window_ntile")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val builtin = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        ntile(4).over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == builtin)
    // and the buckets are balanced the ntile way: sizes differ by <= 1
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).values
    assert(sizes.max - sizes.min <= 1)
  }

  test("two-pass ntile scans orders once: the query reads the checkpointed keys") {
    val df = graft.operators.Breadth.queries("window_ntile")(spark, sf)
    // the quantile sketch already consumed the one parquet scan while
    // materializing the keys projection; the query plan itself must read
    // ONLY the checkpointed blocks — no second scan of the table
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.toLowerCase.contains("parquet"),
      s"ntile must not rescan the orders parquet:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD"),
      s"expected the checkpointed keys scan in:\n$plan")
  }

  test("reduced-domain running sum equals the built-in RANGE-frame window") {
    val got = graft.operators.Breadth
      .queries("window_range_frame")(spark, sf)
      .select("o_orderkey", "run_cents").as[(Long, Long)].collect().toMap
    val builtin = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .over(Window.orderBy(col("o_orderdate"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, Long)].collect().toMap
    assert(got == builtin)
  }
}
