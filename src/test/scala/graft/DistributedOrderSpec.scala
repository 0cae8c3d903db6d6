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

  test("two-pass ntile scans are pruned to the single key column") {
    val df = graft.operators.Breadth.queries("window_ntile")(spark, sf)
    // every parquet scan in the plan must read ONLY o_orderkey — a scan
    // that drags the other 8 order columns through the two passes would
    // be reading ~10x the bytes at any scale
    val plan = df.queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty, s"expected parquet scans in:\n$plan")
    assert(reads.forall(r => r.contains("o_orderkey") && !r.contains(",")),
      s"ntile scans must be pruned to o_orderkey, got $reads")
  }

  test("two-phase token budget equals the built-in per-source window prefix sum") {
    val got = graft.operators.CorpusBuild
      .queries("corpus_token_budget")(spark, sf)
      .select("source", "doc_id", "n_tokens", "cum_before")
      .as[(String, Long, Long, Long)].collect()
    val budget = 20000L
    val builtin = Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        md5(concat(lit("tb:"), col("doc_id"))).as("rk"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_before"))
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSet == builtin.toSet)
    // budget sanity: every kept row started under budget, and each
    // source's draw is a contiguous hash prefix (cum_before values are
    // exactly the running sums of the kept docs in order)
    assert(got.forall(_._4 < budget))
    got.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._4)
      val expect = ordered.scanLeft(0L)(_ + _._3).init
      assert(ordered.map(_._4).toSeq == expect.toSeq,
        s"$src: kept set is not a contiguous prefix")
    }
  }

  test("corpus shuffle positions are a contiguous 1..n per shard") {
    val got = graft.operators.CorpusBuild
      .queries("corpus_shuffle")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(got.length == total.toInt, "every doc gets exactly one slot")
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 1L && ps.last == rows.length.toLong &&
        ps.distinct.length == rows.length,
        s"shard $shard positions not contiguous 1..n")
    }
    // determinism: a second evaluation is bit-identical
    val again = graft.operators.CorpusBuild
      .queries("corpus_shuffle")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("two-pass sequence packing equals the built-in global-window prefix sum") {
    val got = graft.operators.CorpusBuild
      .queries("corpus_pack_sequences")(spark, sf)
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val budget = 1024L
    val builtin = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .withColumn("before", coalesce(sum(col("n")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), (col("before") / budget).cast("long"),
        col("before") % budget)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == builtin)
    // packing sanity: offsets stay inside the budget, sequences start at 0
    assert(got.values.forall(_._2 >= 0L))
    assert(got.values.forall(_._2 < budget))
    assert(got.values.map(_._1).min == 0L)
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
