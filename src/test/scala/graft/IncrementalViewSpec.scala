package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AlertStateTable, AlertUpdate, LiveCountsView}

/** The change-data feed and the incrementally maintained count view:
  * CDC rows must be exactly the net live-set transitions between two
  * retained versions, and folding the feed into the stored counts must
  * equal a from-scratch recount after every refresh — including across
  * a compaction (where the feed falls back to the full diff) and when
  * a bucket drains to zero (the row must vanish, as a recompute would
  * never emit it).
  */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def up(id: String, status: String, eventId: Int, world: Int,
      ts: Double): AlertUpdate = AlertUpdate(id, status, eventId, world, ts)

  test("changesBetween: insert, update (pre+post), delete — and nothing else") {
    val dir = Files.createTempDirectory("cdc_table").toString
    val table = new AlertStateTable(dir)
    table.merge(spark, Seq(
      up("a", "live", 1, 10, 1000), up("b", "live", 2, 11, 1000),
      up("c", "live", 3, 12, 1000)).toDF())
    val v1 = table.versions.last
    table.merge(spark, Seq(
      up("b", "live", 5, 11, 2000), // update: newer coordinates
      up("c", "removed", 6, 12, 2000), // delete: tombstone
      up("d", "live", 7, 13, 2000), // insert
      up("a", "live", 1, 10, 1000)).toDF()) // redelivered no-op
    val v2 = table.versions.last
    val got = table.changesBetween(spark, v1, v2)
      .select("id", "change", "eventId")
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("b", "update_preimage", 2),
      ("b", "update_postimage", 5), ("c", "delete", 3),
      ("d", "insert", 7)), s"feed: $got")
    // same-version feed is empty
    assert(table.changesBetween(spark, v2, v2).isEmpty)
  }

  test("view: fold-of-changes equals recompute at every step, buckets drain") {
    val dir = Files.createTempDirectory("cdc_table2").toString
    // compactEvery=3 puts a compaction inside the refresh window of
    // merge #3 — the fallback full-diff path must also reconcile
    val table = new AlertStateTable(dir, compactEvery = 3)
    val view = new LiveCountsView(
      Files.createTempDirectory("cdc_view").toString)
    def check(step: String): Unit = {
      val got = view.read(spark).as[(Long, Long)].collect().toMap
      val want = table.snapshot(spark)
        .selectExpr("CAST(worldId % 10 AS LONG) AS b")
        .groupBy("b").count().as[(Long, Long)].collect().toMap
      assert(got == want, s"$step: view $got vs recompute $want")
    }
    table.merge(spark, Seq(up("a", "live", 1, 10, 1000),
      up("b", "live", 2, 20, 1000), up("c", "live", 3, 21, 1000)).toDF())
    view.refresh(spark, table); check("first build")
    table.merge(spark, Seq(up("d", "live", 4, 30, 2000),
      up("b", "removed", 5, 20, 2000)).toDF())
    view.refresh(spark, table); check("incremental +d -b")
    // merge #3 triggers compaction: the prior version's segments are
    // rewritten, so this refresh takes the full-diff path
    table.merge(spark, Seq(up("c", "removed", 6, 21, 3000),
      up("a", "live", 7, 10, 3000)).toDF())
    view.refresh(spark, table); check("across compaction")
    // drain bucket 0 entirely: rows for it must vanish from the view
    table.merge(spark, Seq(up("a", "removed", 8, 10, 4000),
      up("d", "removed", 9, 30, 4000)).toDF())
    view.refresh(spark, table); check("drained buckets vanish")
    assert(view.read(spark).as[(Long, Long)].collect()
      .forall(_._2 > 0), "zero-count buckets must not be stored")
    // refresh with no new table version is a no-op
    view.refresh(spark, table); check("idempotent refresh")
  }

  test("event-keyed view: key-moving updates fold as preimage −1 / postimage +1") {
    val dir = Files.createTempDirectory("cdc_table3").toString
    val table = new AlertStateTable(dir)
    val view = new LiveCountsView(
      Files.createTempDirectory("cdc_view_ev").toString,
      bucketExpr = "eventId", keyName = "event_id")
    def check(step: String): Unit = {
      val got = view.read(spark).as[(Long, Long)].collect().toMap
      val want = table.snapshot(spark)
        .selectExpr("CAST(eventId AS LONG) AS e")
        .groupBy("e").count().as[(Long, Long)].collect().toMap
      assert(got == want, s"$step: view $got vs recompute $want")
    }
    table.merge(spark, Seq(up("a", "live", 100, 10, 1000),
      up("b", "live", 100, 11, 1000), up("c", "live", 200, 12, 1000)).toDF())
    view.refresh(spark, table); check("first build")
    // a and c both MOVE events: the view key changes, so these reach the
    // fold ONLY as the update_preimage/update_postimage pair — an
    // insert/delete-only fold would leave event 100 overcounted and
    // event 300 missing
    table.merge(spark, Seq(up("a", "live", 300, 10, 2000),
      up("c", "live", 100, 12, 2000)).toDF())
    view.refresh(spark, table); check("key-moving updates")
    assert(view.read(spark).as[(Long, Long)].collect().toMap ==
      Map(100L -> 2L, 300L -> 1L), "post-move census")
    // same-key update (new timestamp, same eventId): pre/post land in
    // one bucket and must net to zero, not double-count
    table.merge(spark, Seq(up("b", "live", 100, 11, 3000)).toDF())
    view.refresh(spark, table); check("same-key update nets zero")
  }
}
