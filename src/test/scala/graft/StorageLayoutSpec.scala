package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout levers for 100 TB: bucketing (co-located joins with no
  * shuffle) and partition pruning (scan only the partitions the filter
  * names). These are assertions on the *physical plan*, not just results —
  * the layout contract the engine relies on at scale.
  */
class StorageLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** Count hash-partitioning exchanges in the final (post-AQE) plan: run
    * the query first so AdaptiveSparkPlanExec has settled, then inspect
    * the rendered plan (AQE hides unexecuted children from collect()).
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // drives THIS QueryExecution so AQE settles on it
    // AdaptiveSparkPlan prints final plan then "== Initial Plan ==";
    // count exchanges only in the plan that ran
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(plan).length
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.load(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.load(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))
    // with both sides bucketed on the join key, the join itself needs no
    // exchange; only the final tiny aggregation shuffles
    val exchanges = shuffles(joined)
    assert(exchanges <= 1, s"expected only the agg exchange, got $exchanges")
    assert(joined.count() > 0)

    // sanity: same join unbucketed shuffles both sides (or broadcasts);
    // force shuffle-join comparison by disabling broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(shuffles(plain) >= 2, "unbucketed join should shuffle both sides")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("join_bucketed registry face: the fact-fact join itself never shuffles") {
    // first invocation builds-or-adopts the shared bucketed layout;
    // run twice so the measured plan is the steady-state adopted one
    SparkEntry.queries("join_bucketed")(spark, sf).collect()
    val df = SparkEntry.queries("join_bucketed")(spark, sf)
    val exchanges = shuffles(df)
    // the one allowed exchange is the final tiny group-by rollup
    assert(exchanges <= 1,
      s"bucketed fact-fact join must not shuffle its inputs: $exchanges")
    assert(df.count() > 0)
  }

  test("partition pruning: date-partitioned write scans only matching partitions") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.load(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-03")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty)
    // selectedPartitions reflects pruning: exactly one day directory read
    assert(scan.head.selectedPartitions.partitionCount == 1,
      s"expected 1 partition, scanned ${scan.head.selectedPartitions.partitionCount}")
    assert(pruned.count() ==
      Tables.load(spark, sf, "events")
        .filter(to_date(col("ts")) === "2024-01-03").count())
  }

  test("compaction plan partitions the file inventory into ordered bins") {
    val plan = SparkEntry.queries("layout_compaction")(spark, sf)
      .orderBy(col("part_month"), col("grp")).collect()
    assert(plan.nonEmpty)
    // every input file lands in exactly one group: group file counts sum
    // to the inventory size (one file per distinct ship date)
    val nFiles = plan.map(_.getAs[Long]("n_files")).sum
    val inventory = Tables.load(spark, sf, "lineitem")
      .select(col("l_shipdate")).distinct().count()
    assert(nFiles == inventory)
    // within a partition, group ids are dense from 0 and the file-range
    // endpoints never overlap (greedy scan in date order)
    plan.groupBy(_.getAs[String]("part_month")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("grp"))
      assert(sorted.map(_.getAs[Long]("grp")).toSeq ==
        sorted.indices.map(_.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("last_file") < b.getAs[String]("first_file"))
        case _ =>
      }
    }
    // compaction is non-trivial at this sf: some group merges many files
    assert(plan.exists(_.getAs[Long]("n_files") > 1))
  }
}
