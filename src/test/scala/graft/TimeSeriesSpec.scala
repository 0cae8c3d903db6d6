package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Semantics pins for the event-stream analytics the oracle can't probe
  * with interesting shapes on the clean synthetic data.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "s")
      .selectExpr("user_id", "event_type", "timestamp_seconds(s) AS ts")

  test("events_session_sweep: monotone curve, 1800s row matches sessionize") {
    val sf = SparkTestSession.sf
    val rows = SparkEntry.queries("events_session_sweep")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("gap_seconds")).collect()
    assert(rows.map(_.getAs[Long]("gap_seconds")).toSeq ==
      Seq(900L, 1800L, 3600L, 7200L))
    // a larger threshold can only merge sessions
    val counts = rows.map(_.getAs[Long]("n_sessions"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      counts.toSeq.toString)
    // the 1800 s row is the production sessionize's session count
    assert(rows.find(_.getAs[Long]("gap_seconds") == 1800L).get
      .getAs[Long]("n_sessions") ==
      SparkEntry.queries("sessionize")(spark, sf).count())
  }

  test("ts_sax_match: 6-symbol a-d words partition users, pair math holds") {
    val sf = SparkTestSession.sf
    val rows = SparkEntry.queries("ts_sax_match")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      val n = r.getAs[Long]("n_users")
      assert(w.length == 6 && w.forall(c => c >= 'a' && c <= 'd'), w)
      assert(r.getAs[Long]("candidate_pairs") == n * (n - 1) / 2)
    }
    // every user gets exactly one word (dense segments: inactive
    // segments read as 0, they never drop the user)
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      Tables.load(spark, sf, "events").select("user_id").distinct().count())
  }

  test("events_ab_assign: sticky split partitions users, SRM stays small") {
    val sf = SparkTestSession.sf
    val rows = SparkEntry.queries("events_ab_assign")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("arm")).toSet ==
      Set("control", "treatment"))
    // assignment is a partition of the user set: arm user counts sum to
    // the global distinct-user count (a user can never be in both arms
    // because the arm is a pure function of user_id)
    val total = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == total)
    // a uniform hash splits ~50/50 up to binomial noise: |2n_a − n| has
    // sd √n, so dev_bp has sd 10⁴/√n — assert a 4σ band (vacuous at
    // sf0.001's 15 users, sharp from sf0.01's ~1000 on)
    val bound = math.min(10000.0, 40000.0 / math.sqrt(total.toDouble))
    assert(rows.forall(_.getAs[Long]("srm_dev_bp") < bound),
      s"bound=$bound: " + rows.mkString(", "))
  }

  test("events_state_history: run collapsing, versioning, interval closure") {
    // user 1 alternates view,view,click,view,view → three runs; each
    // interval closes at the NEXT run's start, the last stays open.
    // user 3 has two different types at the SAME ts — event_id order
    // decides which run comes first, and the first's interval closes
    // at the shared ts (zero-length intervals are real in CDC).
    val events = Seq(
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "view"),
      (1L, 3L, 300L, "click"), (1L, 4L, 400L, "view"),
      (1L, 5L, 500L, "view"),
      (3L, 10L, 100L, "a"), (3L, 11L, 100L, "b"))
      .toDF("user_id", "event_id", "s", "event_type")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")
    val got = TimeSeries.stateHistoryOn(events)
      .selectExpr("user_id", "version", "state",
        "unix_seconds(valid_from) AS f", "unix_seconds(valid_to) AS t",
        "n_events")
      .as[(Long, Long, String, Long, Option[Long], Long)]
      .collect().sortBy(r => (r._1, r._2)).toList
    assert(got == List(
      (1L, 1L, "view", 100L, Some(300L), 2L),
      (1L, 2L, "click", 300L, Some(400L), 1L),
      (1L, 3L, "view", 400L, None, 2L),
      (3L, 1L, "a", 100L, Some(100L), 1L),
      (3L, 2L, "b", 100L, None, 1L)), s"history: $got")
  }

  test("events_sliding_uniques: cover-explode dedups multi-hour users") {
    // u1 twice in hour 0 and again in hour 2, u2 in hour 0, u3 in hour
    // 5. Window ending at hour 2 spans hours 0..2: 4 events but only 2
    // unique users (u1 must not double-count); the gap before hour 5
    // resets reach to u3 alone, and phantom hours 1, 3, 4, 6, 7 (which
    // the explode covers but have no events) must not emit.
    val events = ev((1L, "view", 100L), (1L, "view", 150L),
      (2L, "view", 200L), (1L, "view", 7300L), (3L, "view", 18100L))
    val got = TimeSeries.slidingUniquesOn(events)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val epoch0 = 0L // timestamp_seconds(100) sits in epoch-hour 0
    assert(got.keySet == Set(epoch0, epoch0 + 2, epoch0 + 5),
      s"active hours only: ${got.keySet}")
    assert(got(epoch0) == ((3L, 2L, 3L, 2L)), s"hour 0: $got")
    assert(got(epoch0 + 2) == ((1L, 1L, 4L, 2L)), s"hour 2: $got")
    assert(got(epoch0 + 5) == ((1L, 1L, 1L, 1L)), s"hour 5: $got")
  }

  test("events_churn: gap weeks are neither new nor retained") {
    // weeks are Monday-truncated; 1970-01-05 is a Monday (epoch day 4).
    // u1 active weeks A,B,C; u2 A only; u3 A and C (gap week B);
    // u4 B only. Week C: u3 returns but is NOT retained (resurrected),
    // u4's silence churns into C.
    def at(day: Long) = day * 86400L + 60
    val events = Seq(
      (1L, "view", at(4)), (1L, "view", at(11)), (1L, "view", at(18)),
      (2L, "view", at(5)),
      (3L, "view", at(6)), (3L, "view", at(20)),
      (4L, "view", at(12))).toDF("user_id", "event_type", "s")
      .selectExpr("user_id", "timestamp_seconds(s) AS ts")
    val got = TimeSeries.churnOn(events)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      4L -> ((3L, 3L, 0L, 0L)),
      11L -> ((2L, 1L, 1L, 2L)),
      18L -> ((2L, 0L, 1L, 1L))), s"churn rows: $got")
  }

  test("events_paths: walk order, ties by event id, user boundary") {
    // u1: view,click,purchase,view in ts order (tie at s=30 broken by
    // event_id: 2 before 3) -> trigrams v>c>p and c>p>v; u2 has only
    // two events -> no trigram crosses the user boundary
    val events = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 30L, "click"),
      (1L, 3L, 30L, "purchase"), (1L, 4L, 40L, "view"),
      (2L, 5L, 20L, "view"), (2L, 6L, 25L, "click"))
      .toDF("user_id", "event_id", "s", "event_type")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")
    val got = TimeSeries.pathsOn(events)
      .as[(String, Long)].collect().toMap
    assert(got == Map("view>click>purchase" -> 1L,
      "click>purchase>view" -> 1L), s"paths: $got")
  }

  test("FunnelFold: same-hour and cross-batch orderings") {
    import graft.streaming.{FunnelFold, UserHourEvents}
    val U = FunnelFold.Unset
    // same hour, click 5200 precedes view 5500 but click 5800 follows:
    // only the min would wrongly reject the stage (the reason ts_list
    // carries every timestamp)
    val a = FunnelFold.step((U, U, U), Seq(
      UserHourEvents(1, 5, "view", Seq(5500L)),
      UserHourEvents(1, 5, "click", Seq(5200L, 5800L))))
    assert(a == ((5500L, 5800L, U)), s"same-hour interleave: $a")
    // click arrives an hour BEFORE the first view: when its batch
    // applies there is no view yet, and the later view (larger ts)
    // can't retroactively qualify it — matching the batch strict chain
    val b1 = FunnelFold.step((U, U, U),
      Seq(UserHourEvents(2, 5, "click", Seq(5200L))))
    val b2 = FunnelFold.step(b1,
      Seq(UserHourEvents(2, 7, "view", Seq(7000L))))
    assert(b2 == ((7000L, U, U)), s"early click never qualifies: $b2")
    // full chain across three single-hour batches
    val c = Seq(
      Seq(UserHourEvents(3, 0, "view", Seq(100L))),
      Seq(UserHourEvents(3, 1, "click", Seq(5000L))),
      Seq(UserHourEvents(3, 2, "purchase", Seq(9000L))))
      .foldLeft((U, U, U))(FunnelFold.step)
    assert(c == ((100L, 5000L, 9000L)), s"full chain: $c")
  }

  test("FunnelFold equals the batch three-window funnel on a random replay") {
    import graft.streaming.{FunnelFold, UserHourEvents}
    val rnd = new scala.util.Random(7)
    val types = Vector("view", "click", "purchase", "error")
    val evs = (1 to 400).map { _ =>
      (rnd.nextInt(50).toLong, types(rnd.nextInt(4)),
        rnd.nextInt(3 * 3600).toLong)
    }
    val batch = TimeSeries.funnelOn(ev(evs: _*))
      .as[(String, Long)].collect().toMap
    // replay: one micro-batch per hour in watermark (ascending) order,
    // each carrying that hour's finalized per-type timestamp lists
    val U = FunnelFold.Unset
    val finals = evs
      .filter(e => Set("view", "click", "purchase")(e._2))
      .groupBy(_._1).map { case (u, es) =>
        val hours = es.groupBy(e => (e._3 / 3600, e._2)).toSeq
          .map { case ((h, t), g) => UserHourEvents(u, h, t, g.map(_._3)) }
        hours.groupBy(_.hour_epoch).toSeq.sortBy(_._1)
          .foldLeft((U, U, U)) { case (st, (_, hb)) =>
            FunnelFold.step(st, hb)
          }
      }.toSeq
    val want = Map(
      "view" -> finals.count(_._1 != U).toLong,
      "click" -> finals.count(_._2 != U).toLong,
      "purchase" -> finals.count(_._3 != U).toLong)
    assert(batch == want, s"batch=$batch fold=$want")
  }

  test("StateHistoryFold: cross-batch run growth, in-batch boundaries, snapshots") {
    import graft.streaming.{EventAt, StateHistoryFold, UserHourTyped}
    // batch 1: two 'a' events → one open run, snapshot (v1, n=2).
    // batch 2: another 'a' (run grows) then 'b' → batch emits v1's
    // FINAL count (3) and the new open v2 — so max(n) per version at
    // read-back is exact even though v1 closed in a later batch.
    val (s1, o1) = StateHistoryFold.step(7L, StateHistoryFold.Empty, Seq(
      UserHourTyped(7L, 0L, Seq(EventAt(100L, 1L, "a"), EventAt(200L, 2L, "a")))))
    assert(o1.map(r => (r.version, r.state, r.valid_from_us, r.n_events)) ==
      Seq((1L, "a", 100L, 2L)), s"batch1: $o1")
    val (s2, o2) = StateHistoryFold.step(7L, s1, Seq(
      UserHourTyped(7L, 1L, Seq(EventAt(3700L, 3L, "a"), EventAt(3800L, 4L, "b")))))
    assert(o2.map(r => (r.version, r.state, r.valid_from_us, r.n_events)) ==
      Seq((1L, "a", 100L, 3L), (2L, "b", 3800L, 1L)), s"batch2: $o2")
    assert(s2 == ((2L, "b", 3800L, 1L)), s"open run: $s2")
    // same-ts different-type: event_id order decides the boundary, and
    // the out-of-order list inside one hour row is sorted by the fold
    val (_, o3) = StateHistoryFold.step(8L, StateHistoryFold.Empty, Seq(
      UserHourTyped(8L, 0L, Seq(EventAt(100L, 11L, "b"), EventAt(100L, 10L, "a")))))
    assert(o3.map(r => (r.version, r.state, r.n_events)) ==
      Seq((1L, "a", 1L), (2L, "b", 1L)), s"tie order: $o3")
  }

  test("StateHistoryFold equals the batch gaps-and-islands on a random replay") {
    import graft.streaming.{EventAt, StateHistoryFold, UserHourTyped}
    val rnd = new scala.util.Random(11)
    val types = Vector("a", "b", "c")
    val evs = (1 to 400).map { i =>
      (rnd.nextInt(30).toLong, i.toLong, types(rnd.nextInt(3)),
        rnd.nextInt(3 * 3600).toLong)
    }
    val df = evs.toDF("user_id", "event_id", "event_type", "s")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")
    val batch = TimeSeries.stateHistoryOn(df)
      .selectExpr("user_id", "version", "state",
        "unix_seconds(valid_from) AS f", "unix_seconds(valid_to) AS t",
        "n_events")
      .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSet
    // replay: one micro-batch per hour in watermark order; read-back
    // contract: min(state, vf), max(n_events) per version, then
    // valid_to from the next version's start
    val agg = scala.collection.mutable.Map[(Long, Long), (String, Long, Long)]()
    evs.groupBy(_._1).foreach { case (u, es) =>
      var st = StateHistoryFold.Empty
      es.groupBy(_._4 / 3600).toSeq.sortBy(_._1).foreach { case (h, g) =>
        val hr = UserHourTyped(u, h,
          g.map(e => EventAt(e._4 * 1000000L, e._2, e._3)))
        val (st2, out) = StateHistoryFold.step(u, st, Seq(hr))
        st = st2
        out.foreach { sn =>
          val k = (sn.user_id, sn.version)
          val prev = agg.get(k).map(_._3).getOrElse(0L)
          agg(k) = (sn.state, sn.valid_from_us, math.max(prev, sn.n_events))
        }
      }
    }
    val want = agg.toSeq.groupBy(_._1._1).flatMap { case (u, runs) =>
      val sorted = runs.sortBy(_._1._2)
      sorted.zipWithIndex.map { case (((_, ver), (state, vf, n)), i) =>
        val to = if (i + 1 < sorted.size) Some(sorted(i + 1)._2._2 / 1000000L)
          else None
        (u, ver, state, vf / 1000000L, to, n)
      }
    }.toSet
    assert(batch == want,
      s"divergence: ${(batch diff want).take(3)} ${(want diff batch).take(3)}")
  }

  test("AttributionFold: carry spans batches, direct bucket, in-order walk") {
    import graft.streaming.{AttributionFold, TouchCredit, UserHourValued, ValuedEv}
    def hr(h: Long, evs: (Long, Long, String, Long)*) =
      UserHourValued(1L, h, evs.map(e => ValuedEv(e._1, e._2, e._3, e._4)))
    // view → purchase (credited to view) → click, all in one batch
    val (s1, o1) = AttributionFold.step(1L, "", Seq(
      hr(0L, (1L, 1L, "view", 0L), (2L, 2L, "purchase", 100L),
        (3L, 3L, "click", 0L))))
    assert(o1 == Seq(TouchCredit(1L, "view", 100L)), s"credits: $o1")
    assert(s1 == "click")
    // next batch's purchase credits the CARRIED click across the boundary
    val (s2, o2) = AttributionFold.step(1L, s1, Seq(
      hr(3600L, (4000L, 4L, "purchase", 250L))))
    assert(o2 == Seq(TouchCredit(1L, "click", 250L)), s"carry: $o2")
    assert(s2 == "click")
    // a purchase with no prior touch lands in the direct bucket
    val (_, o3) = AttributionFold.step(2L, "", Seq(
      hr(0L, (1L, 1L, "purchase", 42L))))
    assert(o3 == Seq(TouchCredit(2L, "direct", 42L)), s"direct: $o3")
    // hours arriving out of order within the batch sort before walking
    val (_, o4) = AttributionFold.step(3L, "", Seq(
      hr(3600L, (4000L, 9L, "purchase", 5L)),
      hr(0L, (1L, 1L, "click", 0L))))
    assert(o4 == Seq(TouchCredit(3L, "click", 5L)), s"hour order: $o4")
  }

  test("PathsFold: warmup carries across batches, ties walk by event_id") {
    import graft.streaming.{EventAt, PathsFold, UserHourTyped}
    // batch 1 holds two events (warmup only — no trigram yet); batch 2
    // delivers the third and fourth: consecutiveness must span the
    // boundary, emitting a>b>c then b>c>a
    val (s1, o1) = PathsFold.step(5L, PathsFold.Empty, Seq(
      UserHourTyped(5L, 0L, Seq(EventAt(100L, 1L, "a"), EventAt(200L, 2L, "b")))))
    assert(o1.isEmpty, s"warmup emits nothing: $o1")
    val (_, o2) = PathsFold.step(5L, s1, Seq(
      UserHourTyped(5L, 1L, Seq(EventAt(3700L, 3L, "c"), EventAt(3800L, 4L, "a")))))
    assert(o2.map(_.path) == Seq("a>b>c", "b>c>a"), s"trigrams: $o2")
    // same-ts events order by event_id inside the fold
    val (_, o3) = PathsFold.step(6L, PathsFold.Empty, Seq(
      UserHourTyped(6L, 0L, Seq(EventAt(100L, 12L, "z"), EventAt(100L, 10L, "x"),
        EventAt(100L, 11L, "y")))))
    assert(o3.map(_.path) == Seq("x>y>z"), s"tie walk: $o3")
  }

  test("PathsFold equals the batch double-lead walk on a random replay") {
    import graft.streaming.{EventAt, PathsFold, UserHourTyped}
    val rnd = new scala.util.Random(13)
    val types = Vector("view", "click", "purchase", "error")
    val evs = (1 to 400).map { i =>
      (rnd.nextInt(30).toLong, i.toLong, types(rnd.nextInt(4)),
        rnd.nextInt(3 * 3600).toLong)
    }
    val df = evs.toDF("user_id", "event_id", "event_type", "s")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")
    val batch = TimeSeries.pathsOn(df)
      .as[(String, Long)].collect().toMap
    val counts = scala.collection.mutable.Map[String, Long]()
    evs.groupBy(_._1).foreach { case (u, es) =>
      var st = PathsFold.Empty
      es.groupBy(_._4 / 3600).toSeq.sortBy(_._1).foreach { case (h, g) =>
        val hr = UserHourTyped(u, h,
          g.map(e => EventAt(e._4 * 1000000L, e._2, e._3)))
        val (st2, out) = PathsFold.step(u, st, Seq(hr))
        st = st2
        out.foreach(p => counts(p.path) = counts.getOrElse(p.path, 0L) + 1L)
      }
    }
    val want = counts.toSeq.sortBy(p => (-p._2, p._1)).take(10).toMap
    assert(batch == want, s"batch=$batch fold=$want")
  }

  test("events_anomaly trailing window agrees with a Scala recomputation") {
    val sf = SparkTestSession.sf
    val got = TimeSeries.queries("events_anomaly")(spark, sf)
      .selectExpr("event_type", "hour_epoch", "n", "w_cnt", "w_sum",
        "CAST(is_spike AS BOOLEAN)")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    // independent derivation: hourly counts straight off the table,
    // trailing 24-row frame folded by hand
    val hourly = Tables.load(spark, sf, "events")
      .groupBy($"event_type",
        org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("h"))
      .count()
      .selectExpr("event_type", "CAST(unix_seconds(h) AS LONG)", "count")
      .as[(String, Long, Long)].collect()
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.zipWithIndex.map { case ((_, h, n), ix) =>
        val win = ordered.slice(math.max(0, ix - 24), ix)
        val (wc, wsum) = (win.length.toLong, win.map(_._3).sum)
        (t, h, n, wc, wsum, wc > 0 && n * wc > 2 * wsum)
      }
    }.toSet
    assert(got.toSet == want,
      s"divergence: ${(got.toSet diff want).take(3)} ${(want diff got.toSet).take(3)}")
    assert(got.exists(_._4 == 24L), "sanity: full trailing windows exist")
  }

  test("events_cep_match: negative condition, window boundary, same-ts ordering") {
    // u1: view@100 → purchase@200 (match). u2: view@100, ERROR@150,
    // purchase@200 (error between — NO match). u3: view@100,
    // purchase@100+3601 (outside the 1 h window — NO match). u4:
    // error@50, view@100, purchase@200 (error BEFORE the view — match).
    // u5: view and error at the SAME ts, error's event_id larger (so
    // after in the total order), purchase later — NO match.
    val events = Seq(
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "purchase"),
      (2L, 3L, 100L, "view"), (2L, 4L, 150L, "error"),
      (2L, 5L, 200L, "purchase"),
      (3L, 6L, 100L, "view"), (3L, 7L, 3701L, "purchase"),
      (4L, 8L, 50L, "error"), (4L, 9L, 100L, "view"),
      (4L, 10L, 200L, "purchase"),
      (5L, 11L, 100L, "view"), (5L, 12L, 100L, "error"),
      (5L, 13L, 200L, "purchase"))
      .toDF("user_id", "event_id", "s", "event_type")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")
    val got = TimeSeries.cepMatchOn(events)
      .as[(Long, Long, Long)].collect().toList
    // all purchases land in day-epoch 0: 5 purchases, 2 matches (u1, u4)
    assert(got == List((0L, 5L, 2L)), s"cep: $got")
  }

  test("events_holtwinters agrees with a hand fold carrying the seasonal vector") {
    val sf = SparkTestSession.sf
    val got = TimeSeries.queries("events_holtwinters")(spark, sf)
      .selectExpr("event_type", "hour_epoch", "n", "level_scaled",
        "trend_scaled", "seasonal_scaled", "forecast_scaled")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val hourly = Tables.load(spark, sf, "events")
      .groupBy($"event_type",
        org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("h"))
      .count()
      .selectExpr("event_type", "CAST(unix_seconds(h) AS LONG)", "count")
      .as[(String, Long, Long)].collect()
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      val seas = Array.fill(24)(0L)
      var l = 0L; var b = 0L
      ordered.zipWithIndex.map { case ((_, h, n), i) =>
        val idx = ((h / 3600) % 24).toInt
        if (i == 0) {
          l = n * 1000; b = 0
          (t, h, n, l, b, 0L, l + b + seas((idx + 1) % 24))
        } else {
          val sOld = seas(idx)
          val lp = (n * 1000 - sOld + l + b) / 2
          val bp = (b + (lp - l)) / 2
          val sn = (sOld + n * 1000 - lp) / 2
          val fc = lp + bp + seas((idx + 1) % 24)
          seas(idx) = sn; l = lp; b = bp
          (t, h, n, lp, bp, sn, fc)
        }
      }
    }.toSet
    assert(got.toSet == want,
      s"divergence: ${(got.toSet diff want).take(3)} ${(want diff got.toSet).take(3)}")
    // the seasonal vector must actually carry signal
    assert(got.exists(_._6 != 0L), "seasonal slots never updated")
  }

  test("events_rate_limit: burst exhausts the bucket, elapsed time refills it") {
    // u1: t=0 allowed (full bucket), t=10 dropped (refill 10s*1000/7200
    // = 1 millitoken), t=7300 allowed again (refill 7290s -> >1000,
    // capped), t=7310 dropped. Final tokens 1 (10s*1000 div 7200).
    val events = Seq(
      (1L, 1L, 0L, "view"), (1L, 2L, 10L, "view"),
      (1L, 3L, 7300L, "view"), (1L, 4L, 7310L, "view"))
      .toDF("user_id", "event_id", "s", "event_type")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")
    val got = TimeSeries.rateLimitOn(events)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 4L, 2L, 2L, 1L)), s"limiter: $got")
  }

  test("RateLimitFold: bucket level crosses batch boundaries exactly") {
    import graft.streaming.{EventAt, RateLimitFold, RlCarry, UserHourTyped}
    def hr(h: Long, evs: (Long, Long)*) =
      UserHourTyped(1L, h, evs.map(e => EventAt(e._1 * 1000000L, e._2, "view")))
    // one-shot: t=0 allowed, t=10 dropped (refill 1 millitoken)
    val (st1, o1) = RateLimitFold.step(1L, RlCarry(-1L, 1000L),
      Seq(hr(0L, (0L, 1L), (10L, 2L))))
    assert(o1.map(_.allowed) == Seq(1L, 0L) && st1 == RlCarry(10L, 1L))
    // the same burst SPLIT across batches charges identically
    val (sa, oa) = RateLimitFold.step(1L, RlCarry(-1L, 1000L),
      Seq(hr(0L, (0L, 1L))))
    val (sb, ob) = RateLimitFold.step(1L, sa, Seq(hr(0L, (10L, 2L))))
    assert(oa.map(_.allowed) ++ ob.map(_.allowed) == Seq(1L, 0L))
    assert(sb == st1)
    // a long gap refills across the boundary too
    val (_, oc) = RateLimitFold.step(1L, sb, Seq(hr(2L, (7300L, 3L))))
    assert(oc.map(_.allowed) == Seq(1L), s"refill across batches: $oc")
  }

  test("CepFold: batch fold matches, state carries across batch boundaries") {
    import graft.streaming.{CepCarry, CepFold, EventAt, UserHourTyped}
    def hr(h: Long, evs: (Long, Long, String)*) =
      UserHourTyped(1L, h, evs.map(e => EventAt(e._1 * 1000000L, e._2, e._3)))
    // one-shot: view@100, error@150, purchase@200 → no match
    val (_, out1) = CepFold.step(1L, CepCarry(0L, 0L),
      Seq(hr(0L, (100L, 1L, "view"), (150L, 2L, "error"),
        (200L, 3L, "purchase"))))
    assert(out1.map(_.matched) == Seq(0L))
    // split across batches: view arrives in batch 1, purchase in batch
    // 2 — the carried ordinal must produce the SAME match a single
    // batch would
    val (st1, o1) = CepFold.step(1L, CepCarry(0L, 0L),
      Seq(hr(0L, (100L, 1L, "view"))))
    val (_, o2) = CepFold.step(1L, st1,
      Seq(hr(0L, (200L, 2L, "purchase"))))
    assert(o1.isEmpty && o2.map(_.matched) == Seq(1L), s"carry: $o2")
    // window boundary rides the carried ordinal too: purchase 3601 s
    // after the carried view must NOT match
    val (_, o3) = CepFold.step(1L, st1,
      Seq(hr(1L, (3701L, 2L, "purchase"))))
    assert(o3.map(_.matched) == Seq(0L), s"boundary: $o3")
  }

  test("events_cusum agrees with a hand fold of the clamped recurrence") {
    val sf = SparkTestSession.sf
    val got = TimeSeries.queries("events_cusum")(spark, sf)
      .selectExpr("event_type", "hour_epoch", "n", "mu", "cusum_pos",
        "cusum_neg", "alarm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val hourly = Tables.load(spark, sf, "events")
      .groupBy($"event_type",
        org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("h"))
      .count()
      .selectExpr("event_type", "CAST(unix_seconds(h) AS LONG)", "count")
      .as[(String, Long, Long)].collect()
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      val mu = ordered.map(_._3).sum / ordered.length
      ordered.scanLeft((t, 0L, 0L, mu, 0L, 0L, 0L)) {
        case ((_, _, _, _, sp, sn, _), (_, h, n)) =>
          val sp2 = math.max(0L, sp + (n - mu - 1))
          val sn2 = math.max(0L, sn + (mu - n - 1))
          (t, h, n, mu, sp2, sn2, if (sp2 > mu || sn2 > mu) 1L else 0L)
      }.drop(1)
    }.toSet
    assert(got.toSet == want,
      s"divergence: ${(got.toSet diff want).take(3)} ${(want diff got.toSet).take(3)}")
    // the statistic must actually clamp and actually alarm somewhere
    assert(got.exists(_._5 == 0L) && got.exists(r => r._5 > 0L || r._6 > 0L))
  }

  test("trailing-baseline processor: batching-invariant, intra-batch order-free") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{HourCount, TrailingBaselineProcessor}
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 30 hours for one type (crosses the 24-hour ring) with a spike at
    // hour 27, plus a second type that never spikes; batch 2 delivers
    // its rows INTENTIONALLY out of hour order
    val hours = (0 until 30).map(h =>
      HourCount("a", 3600L * h, if (h == 27) 100L else 10L)) ++
      (0 until 5).map(h => HourCount("b", 3600L * h, 7L))
    val (b1, b2) = hours.partition(_.hour_epoch < 3600L * 15)
    val mem = MemoryStream[HourCount](spark)
    val name = s"base_${System.nanoTime()}"
    val q = mem.toDS().groupByKey(_.event_type)
      .transformWithState(new TrailingBaselineProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2))
      q.processAllAvailable()
    } finally {
      q.stop()
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
    val got = spark.table(name)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    val want = hours.groupBy(_.event_type).toSeq.flatMap { case (t, rows) =>
      val ordered = rows.sortBy(_.hour_epoch)
      ordered.zipWithIndex.map { case (r, ix) =>
        val win = ordered.slice(math.max(0, ix - 24), ix)
        val (wc, ws) = (win.length.toLong, win.map(_.n).sum)
        (t, r.hour_epoch, r.n, wc, ws, wc > 0 && r.n * wc > 2 * ws)
      }
    }.toSet
    assert(got == want,
      s"divergence: ${(got diff want).take(3)} ${(want diff got).take(3)}")
    assert(want.exists(_._6), "premise: the spike hour must flag")
  }

  test("retention cohort processor: first finalized week is the cohort, batching-invariant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{WeekActive, RetentionCohortProcessor}
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // u1 active weeks 4, 11, 25 (gap); u2 weeks 11, 18; u3 week 18 only.
    // Batch split mid-stream; the second batch arrives SHUFFLED within
    // itself (watermark ordering is across batches, not within)
    val weeks = Seq(WeekActive(1, 4), WeekActive(2, 11), WeekActive(1, 11),
      WeekActive(2, 18), WeekActive(3, 18), WeekActive(1, 25))
    val (b1, b2) = weeks.partition(_.week_day <= 11)
    val mem = MemoryStream[WeekActive](spark)
    val name = s"ret_${System.nanoTime()}"
    val q = mem.toDS().groupByKey(_.user_id)
      .transformWithState(new RetentionCohortProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2))
      q.processAllAvailable()
    } finally {
      q.stop()
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
    val got = spark.table(name).as[(Long, Long, Long)].collect().toSet
    val want = weeks.groupBy(_.user_id).toSeq.flatMap { case (u, ws) =>
      val cohort = ws.map(_.week_day).min
      ws.map(w => (u, cohort, w.week_day))
    }.toSet
    assert(got == want,
      s"divergence: ${(got diff want).take(3)} ${(want diff got).take(3)}")
  }

  test("funnel stages require strict event-time order, not mere presence") {
    // A: all three types but in REVERSE order — only the view counts
    // B: the happy path — all three stages
    // C: view then purchase with no click — purchase must not count
    //    (it needs a click BEFORE it)
    // D: view and click simultaneous — strict > excludes the click
    val funnel = TimeSeries.funnelOn(ev(
      (1L, "purchase", 100L), (1L, "click", 200L), (1L, "view", 300L),
      (2L, "view", 100L), (2L, "click", 200L), (2L, "purchase", 300L),
      (3L, "view", 100L), (3L, "purchase", 200L),
      (4L, "view", 100L), (4L, "click", 100L)))
      .as[(String, Long)].collect().toMap
    assert(funnel == Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnel later stages pick the EARLIEST qualifying event") {
    // two clicks after the view: the purchase between them qualifies
    // only if the funnel anchors on the first click
    val funnel = TimeSeries.funnelOn(ev(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 250L),
      (1L, "click", 300L)))
      .as[(String, Long)].collect().toMap
    assert(funnel == Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }

  private def walk(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "s", "event_type")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "event_type")

  test("markov transitions: user boundaries, tie order, row-normalized p") {
    // user 1 walks a>b>a>c (transitions ab, ba, ac); user 2 walks a>b.
    // No transition crosses users. At user 1's tie (300), event_id
    // orders a before c. From-row 'a' has ab, ab, ac → p(a>b)=2/3.
    val got = TimeSeries.markovOn(walk(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "b"), (1L, 3L, 300L, "a"),
      (1L, 4L, 300L, "c"), (2L, 5L, 100L, "a"), (2L, 6L, 200L, "b")))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 0.666667)), ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))), s"matrix: $got")
  }

  test("timeweighted: duration weighting, last-tick and zero-span drops") {
    // user 1: value 100 held 10 s then 200 held 30 s → span 40,
    //   twap = (10000*10 + 20000*30)/40 = 17500 cents. The final tick's
    //   value never enters (no observed duration after it).
    // user 2: one event → no span → dropped.
    // user 3: two events at the SAME second → span 0 → dropped.
    val rows = Seq(
      (1L, 1L, 100L, 100.0), (1L, 2L, 110L, 200.0), (1L, 3L, 140L, 999.0),
      (2L, 4L, 100L, 50.0),
      (3L, 5L, 100L, 1.0), (3L, 6L, 100L, 2.0))
      .toDF("user_id", "event_id", "s", "value")
      .selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts",
        "value")
    val got = TimeSeries.timeWeightedOn(rows)
      .as[(Long, Long, Double)].collect().toList
    assert(got == List((1L, 40L, 17500.0)), s"twap: $got")
  }
}
