package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.MetagameEvent
import graft.streaming.{AlertStateTable, AlertUpdate}

/** The durable foreachBatch-merge state table: create → count → remove →
  * count across micro-batches (the reference's simulate_alert harness
  * against the lake-table backend), plus idempotent re-merge.
  */
class StateTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: String, state: String, ts: Double): MetagameEvent =
    MetagameEvent(id, 1, state, 17, 1, 40, 30, 20, 25, ts)

  test("create -> count -> remove -> count across micro-batches") {
    val dir = Files.createTempDirectory("alert_table").toString
    val table = new AlertStateTable(dir)
    val mem = MemoryStream[MetagameEvent](spark)

    mem.addData(Seq(ev("17-1", "started", 1000), ev("19-2", "started", 1100)))
    val q1 = AlertStateTable.sink(mem.toDS(), table, ttlSeconds = None).start()
    try q1.awaitTermination() finally q1.stop()
    assert(table.snapshot(spark).count() == 2)

    mem.addData(Seq(ev("17-1", "ended", 2000)))
    val q2 = AlertStateTable.sink(mem.toDS(), table, ttlSeconds = None).start()
    try q2.awaitTermination() finally q2.stop()
    val live = table.snapshot(spark).select("id").as[String].collect().toSet
    assert(live == Set("19-2"))
  }

  test("late older started does not resurrect a removed key in the table") {
    val dir = Files.createTempDirectory("alert_table3").toString
    val table = new AlertStateTable(dir)
    table.merge(spark, Seq(AlertUpdate("17-1", "removed", 2, 17, 2000.0)).toDF())
    // a retried/late batch delivers the original (older) live update
    table.merge(spark, Seq(AlertUpdate("17-1", "live", 1, 17, 1000.0)).toDF())
    assert(table.snapshot(spark).count() == 0,
      "tombstone must outrank the older live update")
  }

  test("merge cost scales with the batch, not the table") {
    val dir = Files.createTempDirectory("alert_table4").toString
    val table = new AlertStateTable(dir)
    val seed = (1 to 2000)
      .map(i => AlertUpdate(s"k-$i", "live", i, 17, 1000.0 + i))
    table.merge(spark, seed.toDF())
    table.merge(spark, (1 to 5)
      .map(i => AlertUpdate(s"k-$i", "removed", 90000 + i, 17, 90000.0 + i))
      .toDF())
    val segs = table.segmentDirs
    assert(segs.length == 2, s"expected base + one delta, got $segs")
    // the delta segment holds ONLY the batch's keys — per-batch I/O is
    // O(|batch|), unlike the round-1 full-table rewrite
    assert(spark.read.parquet(s"$dir/${segs.last}").count() == 5)
    assert(table.snapshot(spark).count() == 1995)
  }

  test("compaction bounds the segment count and preserves state") {
    val dir = Files.createTempDirectory("alert_table5").toString
    val table = new AlertStateTable(dir, compactEvery = 3)
    (1 to 7).foreach { i =>
      table.merge(spark,
        Seq(AlertUpdate(s"k-$i", "live", i, 17, 1000.0 + i)).toDF())
      assert(table.segmentDirs.length < 3,
        s"merge $i left ${table.segmentDirs.length} segments")
    }
    assert(table.snapshot(spark).count() == 7)
    // only files reachable from the retained manifests remain on disk
    val onDisk = new java.io.File(dir).list().count(_.startsWith("s"))
    assert(onDisk <= table.segmentDirs.length + 3,
      s"stale segments not GC'd: $onDisk on disk")
  }

  test("compaction writes key-ranged parallel files, reads unchanged") {
    val dir = Files.createTempDirectory("alert_table_kr").toString
    val table = new AlertStateTable(dir, compactEvery = 2, compactPartitions = 4)
    // enough distinct keys that every one of the 4 ranges is non-empty;
    // several merges so compaction has definitely run
    (1 to 3).foreach { gen =>
      table.merge(spark, (1 to 40).map(i =>
        AlertUpdate(f"k-$i%03d", if (i % 5 == 0) "dead" else "live",
          gen * 100 + i, 17, 1000.0 * gen + i)).toDF())
    }
    // the current generation is one compacted base segment...
    val segs = table.segmentDirs
    assert(segs.length == 1 && segs.head.endsWith("b"),
      s"expected a single compacted base, got $segs")
    // ...made of MULTIPLE key-ranged part files (a 100x key space
    // compacts in parallel, not through one writer task)
    val parts = new java.io.File(s"$dir/${segs.head}")
      .listFiles().filter(f => f.getName.startsWith("part-"))
    assert(parts.length == 4,
      s"expected 4 key-ranged files, got ${parts.map(_.getName).toSeq}")
    // files cover DISJOINT key intervals: per-file id ranges must not
    // overlap (this is what lets a range-predicate reader skip files)
    val ranges = parts.sortBy(_.getName).map { f =>
      val ids = spark.read.parquet(f.getPath)
        .select("id").as[String].collect().sorted
      (ids.head, ids.last)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping key ranges: $ranges")
      case _ => ()
    }
    // and the resolved state is exactly what the merges said
    assert(table.snapshot(spark).count() == 32) // 40 keys - 8 dead
    assert(table.raw(spark).count() == 40)
    val k7 = table.snapshot(spark)
      .filter(org.apache.spark.sql.functions.col("id") === "k-007")
      .select("eventId").as[Int].collect()
    assert(k7.toSeq == Seq(307), "newest generation must win per key")
  }

  test("a reader planned before a merge survives the swap (one-generation retention)") {
    val dir = Files.createTempDirectory("alert_table6").toString
    val table = new AlertStateTable(dir)
    table.merge(spark, Seq(AlertUpdate("17-1", "live", 1, 17, 1000.0)).toDF())
    val reader = table.raw(spark) // plans (lists files of) version N
    table.merge(spark, Seq(AlertUpdate("19-2", "live", 2, 19, 2000.0)).toDF())
    // version N's segments must still exist: collect() reads the old files
    assert(reader.count() == 1)
  }

  test("time travel: rawAt reads a retained earlier version") {
    val dir = Files.createTempDirectory("alert_table7").toString
    val table = new AlertStateTable(dir, retainGenerations = 3)
    table.merge(spark, Seq(AlertUpdate("17-1", "live", 1, 17, 1000.0)).toDF())
    table.merge(spark, Seq(AlertUpdate("19-2", "live", 2, 19, 2000.0)).toDF())
    table.merge(spark, Seq(AlertUpdate("17-1", "removed", 3, 17, 3000.0)).toDF())
    val vs = table.versions
    assert(vs.length == 3, s"3 merges with retainGenerations=3: $vs")
    def liveAt(v: String) = table.rawAt(spark, v)
      .filter("status = 'live'").select("id").as[String].collect().toSet
    assert(liveAt(vs(0)) == Set("17-1"))
    assert(liveAt(vs(1)) == Set("17-1", "19-2"))
    assert(liveAt(vs(2)) == Set("19-2"))
    // a fourth merge rolls the oldest version out of the window
    table.merge(spark, Seq(AlertUpdate("13-9", "live", 4, 13, 4000.0)).toDF())
    assert(table.versions.length == 3 && !table.versions.contains(vs(0)))
  }

  test("version ids stay monotonic across table instances (restart safety)") {
    val dir = Files.createTempDirectory("alert_table8").toString
    val t1 = new AlertStateTable(dir, retainGenerations = 4)
    t1.merge(spark, Seq(AlertUpdate("17-1", "live", 1, 17, 1000.0)).toDF())
    t1.merge(spark, Seq(AlertUpdate("19-2", "live", 2, 19, 2000.0)).toDF())
    val before = t1.versions
    // a NEW instance on the same path (process restart): its version ids
    // must continue after the existing ones, not restart from a clock
    val t2 = new AlertStateTable(dir, retainGenerations = 4)
    t2.merge(spark, Seq(AlertUpdate("13-9", "live", 3, 13, 3000.0)).toDF())
    val after = t2.versions
    assert(after.take(before.length) == before,
      "pre-restart versions must still sort first")
    assert(after.last > before.last, "new version must sort newest")
    assert(t2.snapshot(spark).count() == 3)
  }

  test("registry stream_inprogress routes through the durable table and equals the batch query") {
    val sf = SparkTestSession.sf
    val streamed = SparkEntry.queries("stream_inprogress")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    // confluence: the stateful streaming path must agree with the
    // declarative batch window query (they share a DuckDB oracle)
    val batch = SparkEntry.queries("k23_inprogress_set")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    // and the registry query must leave NO driver-side memory-sink
    // table behind — the durable AlertStateTable is the sink now, and
    // its published live snapshot is what the query returns
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_stream_")),
      "stream_inprogress must not register a memory-sink table")
    val tables = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_inprog_${ProcessHandle.current().pid()}")
    assert(java.nio.file.Files.exists(tables),
      "expected the durable table dir for this process")
    val raw = new AlertStateTable(
      java.nio.file.Files.list(tables).iterator().next()
        .resolve("table").toString)
      .snapshot(spark)
      .select(org.apache.spark.sql.functions.col("id").cast("long"),
        org.apache.spark.sql.functions.col("eventId").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(raw == streamed,
      "the registry result must BE the durable table's live snapshot")
  }

  test("re-merging the same updates is a no-op (at-least-once safety)") {
    val dir = Files.createTempDirectory("alert_table2").toString
    val table = new AlertStateTable(dir)
    val updates = Seq(
      AlertUpdate("17-1", "live", 1, 17, 1000.0),
      AlertUpdate("19-2", "removed", 2, 19, 1100.0)).toDF()
    table.merge(spark, updates)
    val first = table.snapshot(spark).collect().map(_.toString).sorted
    table.merge(spark, updates) // redelivery
    val second = table.snapshot(spark).collect().map(_.toString).sorted
    assert(first.sameElements(second))
    assert(first.length == 1)
  }
}
