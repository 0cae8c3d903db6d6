package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: with skew thresholds lowered to toy scale, a join
  * against a heavily skewed key set is re-planned with skew-split reads
  * (`isSkew=true` partitions) — the runtime answer to hot keys that the
  * salted-aggregate pattern answers statically.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows all landing on key 0 vs a uniform right side
      val left = spark.range(200000)
        .select(lit(0L).as("k"), concat(lit("x"), col("id")).as("payload"))
        .unionAll(spark.range(1000).select(col("id").as("k"),
          lit("y").as("payload")))
      val right = spark.range(1000).select(col("id").as("k"),
        lit("dim").as("attr"))
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's QueryExecution, so the adaptive
      // plan below is the one that actually ran (count() would plan anew)
      assert(joined.collect().length == 200000 + 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected skew-split partitions in final plan:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
