package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{load => T}

/** Time-series operators over the event stream: as-of join and gap-based
  * sessionization. Both are composed from window functions (SURVEY.md §7
  * preference (a): compose built-ins — no custom SparkPlan needed), so
  * they shuffle once on the partition key and scale linearly.
  */
object TimeSeries {

  type Q = (SparkSession, String) => DataFrame

  /** As-of join, union-style: for every `purchase`, the most recent
    * `signup` at or before it for the same user. Instead of a range join
    * (quadratic blowup risk), both sides are unioned and a per-user
    * ordered window carries the last signup time forward — one shuffle on
    * user_id, linear scan within partition. Ties at identical ts resolve
    * by event_id order.
    */
  private val asofJoin: Q = (s, d) => {
    val ev = T(s, d, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type").isin("signup", "purchase"))
      .withColumn("signup_id",
        last(when(col("event_type") === "signup", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("signup_id"))
  }

  private val GapSeconds = 1800 // 30-minute inactivity gap

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than the gap. lag + conditional flag + running sum assigns
    * session ids; then one aggregate per session. Two window passes and
    * one group-by, all partitioned by user — the standard linear shape.
    */
  private val sessionize: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    T(s, d, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_seconds(col("ts").cast("timestamp")) -
            unix_seconds(col("prev_ts").cast("timestamp")) > GapSeconds,
          1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
  }

  /** Hourly gap filling: the dense hour spine (sequence between the
    * stream's min and max hour) left-joined against the sparse hourly
    * counts, missing hours zero-filled — the densification every
    * time-series rollup needs before charting/forecasting. The spine is
    * generated, not scanned, and joins broadcast (hours are few however
    * big the fact table is); counting shuffles once.
    */
  private val gapfill: Q = (s, d) => {
    val hourly = T(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    spine.join(hourly, Seq("h"), "left")
      .select(unix_seconds(col("h")).as("hour_epoch"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** The NATIVE session-window operator (batch face; its streaming twin
    * is spec-checked in WindowedAggsSpec). Differs from `sessionize` in
    * boundary semantics — a gap of exactly 30 min starts a NEW session
    * here (`>=`, interval-overlap rule) vs `>` in the lag formulation —
    * and in output shape (window bounds, where end = last event + gap).
    */
  private val sessionizeNative: Q = (s, d) =>
    graft.streaming.WindowedAggs.sessionWindows(
      T(s, d, "events").select(col("user_id"), col("ts")))

  private val IjMaxUser = 40    // bound the audit's pair universe
  private val IjBinSecs = 3600L // 1-hour overlap bins

  /** Interval-overlap join: which users' sessions were live at the same
    * time — session pairs (a, b), a.user < b.user, whose [start, end]
    * ranges intersect, with the overlap length in seconds.
    *
    * Scale shape: a naive range join (`a.s <= b.e AND b.s <= a.e`) plans
    * as a nested-loop over all session pairs — quadratic. Instead each
    * interval explodes into the [[IjBinSecs]]-wide time bins it spans,
    * candidates meet in an EQUI-join on the bin id, the exact overlap
    * predicate filters, and `distinct` collapses pairs that share
    * several bins. Cost is O(pairs that actually share an hour), not
    * O(all pairs) — the standard binned range-join that survives 100×.
    * Sessions reuse [[sessionize]]'s lag/cumsum assignment (integer
    * epoch seconds throughout, so both engines agree exactly).
    */
  private val intervalJoin: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = T(s, d, "events")
      .filter(col("user_id") < IjMaxUser)
      .withColumn("sec", unix_seconds(col("ts").cast("timestamp")))
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("ns",
        when(col("prev").isNull || col("sec") - col("prev") > GapSeconds, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("sec")).as("s"), max(col("sec")).as("e"))
    val binned = sess.withColumn("bin",
      explode(expr(s"sequence(s div $IjBinSecs, e div $IjBinSecs)")))
    val a = binned.select(col("user_id").as("user_a"), col("sid").as("sess_a"),
      col("s").as("a_s"), col("e").as("a_e"), col("bin"))
    val b = binned.select(col("user_id").as("user_b"), col("sid").as("sess_b"),
      col("s").as("b_s"), col("e").as("b_e"), col("bin"))
    a.join(b, Seq("bin"))
      .filter(col("user_a") < col("user_b") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("user_a"), col("sess_a"), col("user_b"), col("sess_b"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_secs"))
      .distinct()
  }

  /** Ordered conversion funnel — how many users progress
    * view → click → purchase, where each stage must happen STRICTLY
    * AFTER the user's earliest completion of the previous one (the
    * product-analytics staple; an unordered `GROUP BY` of type counts
    * overstates conversion whenever a purchase precedes the first
    * view).
    *
    * Shape: the stage timestamps chain through three window passes over
    * the SAME `partitionBy(user_id)` — Catalyst plans ONE exchange and
    * pipelines the Window operators, so per-stage cost is a partition
    * scan, not a join; the final stage-count fold is a single tiny
    * aggregate. No self-joins, no per-stage shuffles — the 100 TB shape
    * is one shuffle of the filtered event stream.
    */
  private val funnel: Q = (s, d) => funnelOn(T(s, d, "events"))

  /** The funnel body on an arbitrary `(user_id, event_type, ts)`-shaped
    * frame — split out so the strict-ordering semantics are testable on
    * literal event sequences.
    */
  private[graft] def funnelOn(events: DataFrame): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val perUser = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts"))).over(wu))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" &&
          col("ts") > col("v_ts"), col("ts"))).over(wu))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("c_ts"), col("ts"))).over(wu))
      .groupBy(col("user_id"))
      .agg(min(col("v_ts")).as("vt"), min(col("c_ts")).as("ct"),
        min(col("p_ts")).as("pt"))
    val counts = perUser.agg(
      count(col("vt")).as("n_view"), count(col("ct")).as("n_click"),
      count(col("pt")).as("n_purchase"))
    counts.select(explode(array(
      struct(lit("view").as("stage"), col("n_view").as("n_users")),
      struct(lit("click").as("stage"), col("n_click").as("n_users")),
      struct(lit("purchase").as("stage"), col("n_purchase").as("n_users"))))
      .as("s")).select(col("s.*"))
  }

  /** Weekly retention cohorts — users grouped by first-activity week,
    * each later week reporting how many came back: the canonical
    * engagement matrix. Weeks are Monday-truncated and keyed by epoch
    * day (integers hash identically across engines; raw DATE columns
    * render differently).
    *
    * Shape: one groupBy(user) for cohort assignment, one distinct over
    * `(user, week)` (map-side combine collapses each user's in-week
    * events before the exchange), a co-keyed join on user, and a final
    * count — since `(user, week)` is already distinct, the cohort cell
    * count is a plain `count(*)`, not a second distinct aggregate.
    */
  /** Monday-truncated week of a timestamp as an epoch-DAY integer —
    * the cross-engine-stable week key shared by [[retention]] and
    * [[churn]] (raw DATE columns render differently between engines).
    */
  private def weekDay(ts: Column): Column =
    datediff(to_date(date_trunc("week", ts)), to_date(lit("1970-01-01")))
      .cast("long")

  /** Weekly ACTIVITY-ACCOUNTING report — the churn dashboard next to
    * the retention matrix: per observed week, how many users were
    * active, how many of those were new (first-ever activity), how
    * many were retained from the immediately preceding week, and how
    * many of the preceding week's actives went silent (churned). All
    * four are exact integer counts off the distinct `(user, week)`
    * domain; `n_active = n_new + n_retained + resurrected` is NOT an
    * identity (returning users who skipped ≥1 week are neither new nor
    * retained), which is the point of reporting the components.
    *
    * Scale shape: the event stream collapses to distinct `(user,
    * week)` first (map-side partial); everything else — the first-week
    * table, the self-join against the week-shifted copy — runs on that
    * reduced domain, co-keyed on user. Only OBSERVED weeks emit rows
    * (a fully-silent calendar week has no anchor row); churn for week
    * w counts prev-week actives absent in w, so the week after the
    * stream's end is out of scope by construction, as declared.
    */
  private val churn: Q = (s, d) => churnOn(T(s, d, "events"))

  /** The churn body on an arbitrary `(user_id, ts)`-shaped frame —
    * split out so the week-accounting identities are testable on
    * literal activity patterns (gap weeks, one-week users).
    */
  private[graft] def churnOn(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), weekDay(col("ts")).as("w")).distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("w")).as("fw"))
    val prev = uw.select(col("user_id"), (col("w") + 7).as("w"))
    val active = uw.join(first, Seq("user_id"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_active"),
        sum(when(col("fw") === col("w"), 1L).otherwise(0L)).as("n_new"))
    val retained = uw.join(prev, Seq("user_id", "w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("n_retained"))
    val churned = prev.join(uw, Seq("user_id", "w"), "left_anti")
      .groupBy(col("w")).agg(count(lit(1)).as("n_churned"))
    active.join(retained, Seq("w"), "left").join(churned, Seq("w"), "left")
      .select(col("w").as("week_day"), col("n_active"), col("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** SCD2-style STATE HISTORY from the event log — each user's
    * consecutive run of equal event_type collapsed into one validity
    * interval `[valid_from, valid_to)`, versioned per user, with the
    * current state's `valid_to` NULL: the slowly-changing-dimension
    * table a CDC consumer materializes from a change stream (the
    * interval-building sibling of `snapshot_diff`, which compares two
    * snapshots instead). Gaps-and-islands: a lag() change flag and a
    * running sum assign run ids, one aggregate per run, and a lead()
    * over the (tiny) run domain closes each interval with the next
    * run's start.
    *
    * Scale shape: one exchange on user_id serves the change-flag and
    * running-sum windows AND the run group-by AND the closing lead()
    * (all co-partitioned on user) — one shuffle of the raw stream
    * total, then everything runs on the collapsed run domain.
    */
  private val stateHistory: Q = (s, d) => stateHistoryOn(T(s, d, "events"))

  /** The state-history body on an arbitrary `(user_id, event_id, ts,
    * event_type)`-shaped frame — split out so run collapsing,
    * versioning, and interval closure are testable on literal
    * sequences.
    */
  private[graft] def stateHistoryOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"), // constant within a run
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    runs.withColumn("valid_to",
      lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("version"))))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** AUDIENCE OVERLAP matrix — for every pair of event types, how many
    * users did both, each type's audience size, and the Jaccard of the
    * two audiences: the segment-overlap report behind "users who X
    * also Y" (and the exact-count twin of sketch-based overlap
    * estimators). Jaccard is the ONE float: a single IEEE division of
    * exact integers, rounded once — bit-identical across engines.
    *
    * Scale shape: the raw stream collapses to distinct `(user, type)`
    * FIRST (map-side partial; rows ≤ users × |types|); the self-join
    * is per-user with fan-out C(|types|, 2) — |types| is the SCHEMA's
    * enum cardinality, not a data-scaled quantity — and the pair count
    * collapses map-side onto the |types|² domain. The audience-size
    * join attaches a |types|-row table: broadcast by size forever.
    */
  private val audienceOverlap: Q = (s, d) => {
    val ut = T(s, d, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
        col("n_b"),
        round(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
  }

  /** Distributed exact ntile(k) by `(key, user_id)` — the two-phase
    * global-rank recipe of `window_ntile`/`corpus_pack_sequences`
    * (literal sketch boundaries → bucket-local row_number → broadcast
    * offsets → ntile's first-heavy closed form), factored for reuse:
    * no row ever passes through a single-task total-order window, so
    * the scoring survives a user domain of any size. Bucket membership
    * depends only on `key`, so equal keys share a bucket and the
    * in-bucket `(key, user_id)` order is the global total order.
    */
  private def ntileScore(df: DataFrame, key: String, k: Int,
      out: String): DataFrame = {
    val bounds = df.stat.approxQuantile(
      key, (1 until 32).map(_ / 32.0).toArray, 0.001)
    val pid = bounds.distinct
      .map(b => when(col(key) > b, 1).otherwise(0))
      .reduceOption((a: Column, b: Column) => a + b)
      .getOrElse(lit(0): Column)
    val parted = df.withColumn("_pid", pid)
    val rn = parted.withColumn("_rn", row_number().over(
      Window.partitionBy(col("_pid")).orderBy(col(key), col("user_id"))))
    val offsets = rn.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(
        Window.orderBy(col("_pid")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val g = rn.join(broadcast(offsets
        .select(col("_pid"), col("_off"), col("_n"))), Seq("_pid"))
      .withColumn("_g", col("_rn") + col("_off"))
      .withColumn("_base", (col("_n") / k).cast("long"))
      .withColumn("_rem", col("_n") % k)
    val inBig = col("_g") <= col("_rem") * (col("_base") + 1)
    g.withColumn(out,
        when(inBig, (col("_g") - 1) / (col("_base") + 1) + 1)
          .otherwise(col("_rem") +
            (col("_g") - col("_rem") * (col("_base") + 1) - 1) /
              col("_base") + 1)
          .cast("long"))
      .drop("_pid", "_rn", "_off", "_n", "_g", "_base", "_rem")
  }

  /** RFM SEGMENTATION — the marketing-analytics classic: per user,
    * recency (days since last event, against the stream's own max day
    * as the anchor), frequency (event count), monetary (exact-cents
    * value sum — integer, so ordering and hashing never touch float
    * summation), each scored into quintiles, plus the composite
    * 3-digit RFM code. Scores are data-adaptive ranks, not value
    * cuts: quintile boundaries follow the population, and the
    * `(metric, user_id)` total order makes every assignment
    * deterministic and engine-identical (ntile's first-heavy
    * allocation in closed form — see [[ntileScore]]).
    *
    * Scale shape: events collapse to one row per user FIRST (map-side
    * combinable), materialized once so the three scoring passes and
    * the sketch scans reuse it; each quintile pass is the two-phase
    * distributed rank — the only total-order windows run over the
    * ~32-row bucket-count domain. The day anchor is the
    * governance-allowlisted single-row broadcast.
    */
  private val rfm: Q = (s, d) => {
    val ev = T(s, d, "events")
    val anchor = ev.agg(max(to_date(col("ts"))).as("anchor_day"))
    val u = Dedup.materialize(
      ev.groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("f"),
          sum(round(col("value") * 100).cast("long")).as("m_cents"))
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          datediff(col("anchor_day"), col("last_day")).cast("long")
            .as("r_days"),
          col("f"), col("m_cents"))
        // recency scored on the NEGATED key: most-recent = highest
        .withColumn("neg_r", -col("r_days")))
    val scored = ntileScore(
      ntileScore(ntileScore(u, "neg_r", 5, "r_score"),
        "f", 5, "f_score"),
      "m_cents", 5, "m_score")
    scored.select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
      col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .as("rfm_code"))
  }

  private val PathsTopK = 10

  /** Top-[[PathsTopK]] most-travelled 3-step event-type PATHS — the
    * product-analytics "user journeys" query: consecutive event-type
    * trigrams per user in timestamp order (ties broken by event id, so
    * both engines walk identical sequences), counted corpus-wide, with
    * a TOTAL (count desc, path) tie-break order making the rank-10 cut
    * deterministic.
    *
    * Scale shape: one exchange on user for the ordered walk (two lead()
    * passes pipeline over the same sort), then the trigram count
    * collapses to the tiny distinct-path domain before the top-k sort —
    * the corpus_ngrams topology over sequences instead of text.
    */
  private val paths: Q = (s, d) => pathsOn(T(s, d, "events"))

  /** The paths body on an arbitrary `(user_id, event_id, ts,
    * event_type)`-shaped frame — split out so the walk order and the
    * user boundary are testable on literal sequences.
    */
  private[graft] def pathsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathsTopK)
  }

  private val retention: Q = (s, d) => {
    val ev = T(s, d, "events")
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), weekDay(col("first_ts")).as("cohort_day"))
    val activity = ev
      .select(col("user_id"), weekDay(col("ts")).as("week_day"))
      .distinct()
    activity.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        ((col("week_day") - col("cohort_day")) / 7).cast("long")
          .as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Traffic-spike detection: each (event_type, hour) bucket against
    * its own trailing-24h baseline — the rate-anomaly monitor every
    * event pipeline runs. A bucket is a spike when its count exceeds
    * 2× the trailing mean, compared in INTEGER cross-multiplication
    * (`n·w_cnt > 2·w_sum`) so both engines agree exactly where a float
    * mean would wobble. The trailing window emits alongside the flag —
    * the operator is the alert AND its evidence.
    *
    * Scale shape: the raw stream collapses to (type, hour) counts
    * FIRST (one map-side-combinable shuffle; output rows = types ×
    * hours, tiny at any corpus size), so the per-type window runs over
    * the reduced domain — never over raw events.
    */
  private val eventsAnomaly: Q = (s, d) => {
    val hourly = T(s, d, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-24, -1)
    hourly.select(col("event_type"), unix_seconds(col("h")).as("hour_epoch"),
        col("n"), count(col("n")).over(w).as("w_cnt"),
        coalesce(sum(col("n")).over(w), lit(0L)).as("w_sum"))
      .withColumn("is_spike",
        col("w_cnt") > 0 && col("n") * col("w_cnt") > lit(2L) * col("w_sum"))
  }

  /** Trailing window width in hours for [[slidingUniques]]. */
  private val SlideHours = 3

  private val slidingUniques: Q = (s, d) => slidingUniquesOn(T(s, d, "events"))

  /** Sliding distinct-user counts — for each active hour, the events
    * and UNIQUE users over the trailing [[SlideHours]]-hour window (the
    * DAU/WAU-style reach metric). Unlike the event count, distinct
    * users do NOT sum across hours (one user active in two hours is one
    * user), so no window frame can fold them; the standard distributed
    * answer is the COVER EXPLODE: each distinct `(user, hour)` pair
    * covers the [[SlideHours]] window-ends it is visible to, a second
    * distinct collapses multi-hour users, and a plain count per
    * window-end is exact.
    *
    * Scale shape: the raw stream collapses to distinct `(user, hour)`
    * FIRST (map-side partial, like the retention matrix) — every later
    * step runs on that reduced domain; the cover explode multiplies it
    * by only [[SlideHours]]. The trailing event sum uses a RANGE frame
    * on the integer hour key (value-ranged, so hour gaps don't slide
    * into the frame) over the collapsed hours domain — single-task but
    * thousands of rows at any corpus size. Hours with zero events emit
    * nothing, as declared; the inner join back to the hourly table
    * drops the phantom window-ends the explode invents past a gap.
    */
  private[graft] def slidingUniquesOn(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      expr("unix_seconds(date_trunc('hour', ts)) DIV 3600").as("h"))
    val hourly = ev.groupBy(col("h")).agg(count(lit(1)).as("n_events"))
    val pairs = ev.distinct()
    val u1 = pairs.groupBy(col("h")).agg(count(lit(1)).as("n_uniques"))
    val cov = pairs
      .select(col("user_id"),
        explode(sequence(col("h"), col("h") + (SlideHours - 1))).as("h"))
      .distinct()
    val u3 = cov.groupBy(col("h")).agg(count(lit(1)).as("n_uniques_3h"))
    val w = Window.orderBy(col("h")).rangeBetween(-(SlideHours - 1), 0)
    hourly.join(u1, Seq("h")).join(u3, Seq("h"))
      .withColumn("n_events_3h", sum(col("n_events")).over(w))
      .select(col("h").as("hour_epoch"), col("n_events"), col("n_uniques"),
        col("n_events_3h"), col("n_uniques_3h"))
  }

  /** MARKOV TRANSITION MATRIX of the user journey — for every ordered
    * pair of event types, how often one follows the other in some
    * user's walk, and the row-normalized transition probability (the
    * first-order model behind next-step prediction and journey
    * simulation; [[paths]]' trigrams are this model's order-2 cousin).
    * Counts are exact integers; the probability is the single rounded
    * division at the end, so cross-engine float order can't drift.
    *
    * Scale shape: ONE exchange on user for the ordered walk (the same
    * sort [[paths]] rides), then the (from, to) count collapses
    * map-side onto the ≤ |types|² domain — the row-total window runs
    * over that tiny matrix, never over raw events.
    */
  private val markov: Q = (s, d) => markovOn(T(s, d, "events"))

  /** The transition-matrix body on an arbitrary events-shaped frame —
    * split out so row normalization and the tie order are testable on
    * literal walks.
    */
  private[graft] def markovOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val m = events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from").cast("double"), 6)
          .as("p"))
  }

  /** TIME-WEIGHTED AVERAGE value per user (the TWAP shape — sensor
    * readings, position marks, price ticks): each observation counts
    * for the seconds until the next one, over the user's observed
    * span. The weighted sum stays in exact integers (value-cents ×
    * whole seconds), so the accumulation is order-insensitive and the
    * single division at the end is the only float op. Users with one
    * event have no observed span and drop out, declared.
    *
    * Scale shape: one exchange on user for the lead(), then the
    * weighted sums collapse map-side per user — linear, no state, and
    * the int64 headroom is ample (cents × seconds × events per user).
    */
  private val timeWeighted: Q = (s, d) => timeWeightedOn(T(s, d, "events"))

  /** The TWAP body on an arbitrary events-shaped frame — split out so
    * the duration weighting and the degenerate-span drops are testable
    * on literal tick sequences.
    */
  private[graft] def timeWeightedOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("v_c"))
      .withColumn("dur", // NTZ→LTZ cast is exact under the pinned-UTC session
        unix_seconds(lead(col("ts"), 1).over(w).cast("timestamp"))
          - unix_seconds(col("ts").cast("timestamp")))
      .filter(col("dur").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("v_c") * col("dur")).as("vd"),
        sum(col("dur")).as("span_s"))
      .filter(col("span_s") > 0)
      .select(col("user_id"), col("span_s"),
        round(col("vd").cast("double") / col("span_s").cast("double"), 6)
          .as("twap_c"))
  }

  /** LAST-TOUCH REVENUE ATTRIBUTION — the marketing-analytics closer of
    * the funnel/paths family: every `purchase` credits its user's most
    * recent PRECEDING touch event (`view`/`click`) — strictly before
    * the purchase in the `(ts, event_id)` total order — and the report
    * rolls credited purchases and exact-cents revenue up by touch type;
    * first-session purchases with no prior touch land in the `direct`
    * bucket. The carry is `last(touch, ignoreNulls)` over an
    * unbounded-preceding-to--1 frame — one pass, no self-join of
    * purchases back onto touches.
    *
    * Scale shape: ONE shuffle on user_id for the carry window (frames
    * are running, never re-scanned), then the credited rows collapse
    * map-side onto the |touch-types| domain. Revenue accumulates as
    * integer cents, so summation order can never shift a hash.
    */
  private val attribution: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    T(s, d, "events")
      .withColumn("touch",
        last(when(col("event_type").isin("view", "click"),
          col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("revenue_cents"))
  }

  /** COHORT LIFETIME VALUE — the revenue companion of
    * `retention_cohorts`: purchases bucket into (signup-week cohort,
    * weeks-since-signup) cells with exact-cents revenue, and the
    * running sum per cohort is the LTV curve every growth dashboard
    * plots. Weeks with no purchases are absent by declaration (the
    * cumulative walks the observed weeks), matching the oracle.
    *
    * Scale shape: events collapse to per-user first-ts once (the
    * retention cohort table, broadcast-sized at user cardinality ≪
    * events); purchases shuffle once onto the user key for the cohort
    * tag; the cumulative window runs over the cohort × weeks domain —
    * tiny forever. Integer cents end to end.
    */
  private val cohortLtv: Q = (s, d) => {
    val ev = T(s, d, "events")
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), weekDay(col("first_ts")).as("cohort_day"))
    val weekly = ev.filter(col("event_type") === "purchase")
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        ((weekDay(col("ts")) - col("cohort_day")) / 7).cast("long")
          .as("weeks_since"))
      .agg(sum(round(col("value") * 100).cast("long")).as("revenue_cents"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("weeks_since"))
      .rowsBetween(Window.unboundedPreceding, 0)
    weekly.withColumn("cum_revenue_cents",
      sum(col("revenue_cents")).over(w))
  }

  private val EwmaScale = 1000L

  /** INTEGER-EXACT EWMA (α = 1/2) over the hourly count series — the
    * smoothing primitive under burn-rate alerts and capacity curves,
    * formulated so both engines agree on every value: the state is the
    * [[EwmaScale]]-scaled integer `s ← (s + n·S) div 2` (floor), seeded
    * at the first hour's `n·S`. α = 1/2 makes the update a plain
    * integer halving — no float accumulation to diverge, at the cost
    * of the usual ~1/S quantization, irrelevant for a smoothing gauge.
    *
    * Scale shape: the stream collapses map-side to the (type, hour)
    * count domain first; the sequential fold runs INSIDE one codegen'd
    * `aggregate` HOF over each type's sorted hour list — types ×
    * hours rows total, a recurrence a window cannot express (each
    * output depends on the previous OUTPUT, not previous inputs) done
    * without a single cross-row shuffle beyond the count itself.
    */
  private val ewma: Q = (s, d) => {
    val hourly = T(s, d, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val listed = hourly.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("h"), col("n")))).as("xs"))
    val folded = listed.select(col("event_type"), explode(expr(
      s"""aggregate(xs,
         |  slice(transform(xs, x -> named_struct(
         |    'h', x.h, 'n', x.n, 's', x.n * $EwmaScale)), 1, 0),
         |  (acc, x) -> concat(acc, array(named_struct(
         |    'h', x.h, 'n', x.n,
         |    's', CASE WHEN size(acc) = 0 THEN x.n * $EwmaScale
         |         ELSE (element_at(acc, -1).s + x.n * $EwmaScale) div 2
         |         END))))""".stripMargin)).as("e"))
    folded.select(col("event_type"),
      unix_seconds(col("e.h").cast("timestamp")).as("hour_epoch"),
      col("e.n").as("n"), col("e.s").as("ewma_scaled"))
  }

  /** INTEGER-EXACT Holt double-exponential smoothing (α = β = 1/2) —
    * EWMA's trend-aware sibling: a LEVEL and a TREND state per series,
    * `l' = (l + b + n·S) div 2`, `b' = (b + (l' − l)) div 2`, seeded at
    * `(n₀·S, 0)`. The one-step forecast `l + b` is the burn-rate
    * projection a capacity alert actually wants (EWMA lags a ramp;
    * Holt tracks it). Halving is the α = β = 1/2 specialization that
    * keeps every value an exact integer — and `div` truncates toward
    * zero in BOTH engines (Spark `div`, DuckDB `//`, verified on
    * negatives — the trend term goes negative on falling series), so
    * the recursive-CTE oracle states the identical recurrence.
    *
    * Scale shape: identical to [[ewma]] — map-side collapse to the
    * (type, hour) domain, then the two-state fold runs inside one
    * codegen'd `aggregate` HOF per type.
    */
  private val holt: Q = (s, d) => {
    val hourly = T(s, d, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val listed = hourly.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("h"), col("n")))).as("xs"))
    val folded = listed.select(col("event_type"), explode(expr(
      s"""aggregate(xs,
         |  slice(transform(xs, x -> named_struct(
         |    'h', x.h, 'n', x.n,
         |    'l', x.n * $EwmaScale, 'b', CAST(0 AS BIGINT))), 1, 0),
         |  (acc, x) -> concat(acc, array(
         |    CASE WHEN size(acc) = 0 THEN named_struct(
         |      'h', x.h, 'n', x.n,
         |      'l', x.n * $EwmaScale, 'b', CAST(0 AS BIGINT))
         |    ELSE named_struct('h', x.h, 'n', x.n,
         |      'l', (element_at(acc, -1).l + element_at(acc, -1).b
         |            + x.n * $EwmaScale) div 2,
         |      'b', (element_at(acc, -1).b
         |            + ((element_at(acc, -1).l + element_at(acc, -1).b
         |                + x.n * $EwmaScale) div 2
         |               - element_at(acc, -1).l)) div 2)
         |    END)))""".stripMargin)).as("e"))
    folded.select(col("event_type"),
      unix_seconds(col("e.h").cast("timestamp")).as("hour_epoch"),
      col("e.n").as("n"), col("e.l").as("level_scaled"),
      col("e.b").as("trend_scaled"),
      (col("e.l") + col("e.b")).as("forecast_scaled"))
  }


  /** INTEGER-EXACT HOLT-WINTERS additive smoothing (α = β = γ = 1/2,
    * hour-of-day season L = 24) — the seasonal member of the
    * [[ewma]]/[[holt]] recurrence family: a LEVEL, a TREND, and a
    * 24-SLOT SEASONAL VECTOR per series, so the one-step forecast
    * `l + b + s[next hour]` tracks the daily rhythm that makes plain
    * Holt misread every evening peak as a trend change. Slots key on
    * TRUE hour-of-day (`(epoch div 3600) mod 24`), so gaps in the
    * series can't rotate the season. Updates are the halving
    * specialization, exact integers end to end:
    * `l' = (n·S − s_old + l + b) div 2`, `b' = (b + (l'−l)) div 2`,
    * `s' = (s_old + n·S − l') div 2`, seeded `(n₀·S, 0, 0⃗)`. The next
    * hour's slot is never the slot just written (mod-24 neighbors
    * differ), so the forecast reads the PRE-update vector — both
    * engines state that simplification.
    *
    * Scale shape: the [[ewma]] topology with VECTOR state — map-side
    * collapse to the (type, hour) domain, then one codegen'd
    * `aggregate` HOF per type whose accumulator carries (l, b, seas[24],
    * out); the window-inexpressible part is the whole point.
    */
  private val holtWinters: Q = (s, d) => {
    val S = EwmaScale
    val idxE = "CAST((unix_seconds(CAST(x.h AS TIMESTAMP)) div 3600) % 24 AS INT)"
    val sOld = s"element_at(acc.seas, $idxE + 1)"
    val lp = s"((x.n * $S - $sOld + acc.l + acc.b) div 2)"
    val bp = s"((acc.b + ($lp - acc.l)) div 2)"
    val sn = s"(($sOld + x.n * $S - $lp) div 2)"
    val seasUpd = s"transform(acc.seas, (v, i) -> IF(i = $idxE, $sn, v))"
    val fc = s"($lp + $bp + element_at(acc.seas, (($idxE + 1) % 24) + 1))"
    val outRow = s"named_struct('h', x.h, 'n', x.n, 'l', $lp, 'b', $bp, " +
      s"'s', $sn, 'f', $fc)"
    val seedRow = s"named_struct('h', x.h, 'n', x.n, " +
      s"'l', x.n * $S, 'b', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT), " +
      s"'f', x.n * $S)"
    val hourly = T(s, d, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val listed = hourly.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("h"), col("n")))).as("xs"))
    val folded = listed.select(col("event_type"), explode(expr(
      s"""aggregate(xs,
         |  named_struct(
         |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
         |    'seas', array_repeat(CAST(0 AS BIGINT), 24),
         |    'out', slice(transform(xs, x -> $seedRow), 1, 0)),
         |  (acc, x) -> CASE WHEN size(acc.out) = 0 THEN named_struct(
         |      'l', x.n * $S, 'b', CAST(0 AS BIGINT), 'seas', acc.seas,
         |      'out', array($seedRow))
         |    ELSE named_struct(
         |      'l', $lp, 'b', $bp, 'seas', $seasUpd,
         |      'out', concat(acc.out, array($outRow)))
         |    END,
         |  acc -> acc.out)""".stripMargin)).as("e"))
    folded.select(col("event_type"),
      unix_seconds(col("e.h").cast("timestamp")).as("hour_epoch"),
      col("e.n").as("n"), col("e.l").as("level_scaled"),
      col("e.b").as("trend_scaled"), col("e.s").as("seasonal_scaled"),
      col("e.f").as("forecast_scaled"))
  }

  /** Token-bucket parameters: capacity 1 token (scaled ×1000), refill
    * one token per [[RlRefillSec]] seconds — tight enough that
    * same-session bursts genuinely exhaust the bucket on this data.
    */
  private[graft] val RlRefillSec = 7200L

  /** TOKEN-BUCKET RATE-LIMIT REPLAY — the admission-control primitive
    * (every API gateway's limiter) replayed over the event archive:
    * per user, tokens refill linearly with elapsed time (integer:
    * `(dt·1000) div RlRefillSec`, capped at 1000) and each event
    * spends 1000 or is dropped. "What would this limiter have done" is
    * the capacity-planning question a 100 TB archive answers offline
    * before a config ships. Another previous-OUTPUT recurrence (the
    * bucket level depends on the prior decision), folded per user in
    * one codegen'd `aggregate` HOF over the (ts, event_id)-sorted
    * event list; the report collapses to one row per user.
    */
  private val rateLimit: Q = (s, d) => rateLimitOn(T(s, d, "events"))

  /** The limiter body on an arbitrary events frame — split out so the
    * burst/refill mechanics are testable on literal sequences.
    */
  private[graft] def rateLimitOn(events: DataFrame): DataFrame = {
    val listed = events
      .select(col("user_id"),
        unix_seconds(col("ts").cast("timestamp")).as("te"), col("event_id"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("te"), col("event_id"))))
        .as("xs"))
    val folded = listed.select(col("user_id"), expr(
      s"""aggregate(xs,
         |  named_struct('pt', CAST(-1 AS BIGINT),
         |    'tok', CAST(1000 AS BIGINT),
         |    'na', CAST(0 AS BIGINT), 'nd', CAST(0 AS BIGINT)),
         |  (acc, x) -> CASE WHEN least(CAST(1000 AS BIGINT),
         |      acc.tok + CASE WHEN acc.pt < 0 THEN CAST(0 AS BIGINT)
         |        ELSE ((x.te - acc.pt) * 1000) div $RlRefillSec END) >= 1000
         |    THEN named_struct('pt', x.te,
         |      'tok', least(CAST(1000 AS BIGINT),
         |        acc.tok + CASE WHEN acc.pt < 0 THEN CAST(0 AS BIGINT)
         |          ELSE ((x.te - acc.pt) * 1000) div $RlRefillSec END) - 1000,
         |      'na', acc.na + 1, 'nd', acc.nd)
         |    ELSE named_struct('pt', x.te,
         |      'tok', least(CAST(1000 AS BIGINT),
         |        acc.tok + CASE WHEN acc.pt < 0 THEN CAST(0 AS BIGINT)
         |          ELSE ((x.te - acc.pt) * 1000) div $RlRefillSec END),
         |      'na', acc.na, 'nd', acc.nd + 1)
         |    END)""".stripMargin).as("r"))
    folded.select(col("user_id"),
      (col("r.na") + col("r.nd")).as("n_events"),
      col("r.na").as("n_allowed"), col("r.nd").as("n_dropped"),
      col("r.tok").as("tokens_final_scaled"))
  }

  /** FORECAST BACKTEST — one-step-ahead evaluation of [[holt]] vs
    * [[holtWinters]] on their own series, the `sim_*_recall` move
    * applied to forecasting: each row t's forecast is scored against
    * the NEXT observed point's `n·S`, absolute errors accumulate as
    * exact integers, and the per-type MAE pair (plus who won) becomes a
    * hash gate — a regression in either recurrence's predictive power
    * now fails correctness, not just taste. Positional next (row
    * number), matching the recurrences' own positional step.
    *
    * Scale shape: both inputs are the already-collapsed (type, hour)
    * domains; one rn window each, an equi-join on (type, rn), and a
    * map-side collapse onto |types| rows.
    *
    * Measured finding the face exists to surface: on this synthetic
    * corpus Holt WINS (hw_wins = 0 for every type) — the event series
    * has no daily rhythm, so the seasonal slots only add variance.
    * A model upgrade must prove itself against the data, not the prior.
    */
  private val forecastEval: Q = (s, d) => {
    def positioned(df: DataFrame, fcol: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour_epoch"))
      df.select(col("event_type"), col("hour_epoch"), col("n"),
          col(fcol).as("f"))
        .withColumn("rn", row_number().over(w))
    }
    val h = positioned(holt(s, d), "forecast_scaled")
    val hw = positioned(holtWinters(s, d), "forecast_scaled")
    val actual = h.select(col("event_type"), (col("rn") - 1).as("rn"),
      (col("n") * EwmaScale).as("actual_scaled"))
    h.select(col("event_type"), col("rn"), col("f").as("f_holt"))
      .join(hw.select(col("event_type"), col("rn"), col("f").as("f_hw")),
        Seq("event_type", "rn"))
      .join(actual, Seq("event_type", "rn"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_evals"),
        expr("sum(abs(f_holt - actual_scaled)) div count(1)")
          .as("mae_holt_scaled"),
        expr("sum(abs(f_hw - actual_scaled)) div count(1)")
          .as("mae_hw_scaled"))
      .withColumn("hw_wins",
        when(col("mae_hw_scaled") < col("mae_holt_scaled"), lit(1L))
          .otherwise(lit(0L)))
  }

  /** OUTAGE / SILENCE DETECTION — consecutive-event gaps longer than
    * [[GapSeconds]] (the sessionize gap) per event type: the monitoring primitive behind
    * "type X went quiet for half an hour" (the reference's outage gauge
    * tracks source-connection silence; this is the same signal computed
    * from the data itself, so it works retroactively over any archive).
    * One lag window per type, integer epoch arithmetic.
    */
  private val outageGaps: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    T(s, d, "events")
      .select(col("event_type"),
        unix_seconds(col("ts").cast("timestamp")).as("te"),
        lag(unix_seconds(col("ts").cast("timestamp")), 1).over(w).as("pe"))
      .where(col("te") - col("pe") > GapSeconds)
      .select(col("event_type"), col("pe").as("gap_start_epoch"),
        col("te").as("gap_end_epoch"),
        (col("te") - col("pe")).as("gap_seconds"))
  }

  /** Allowance (slack) of the CUSUM recurrence — deviations within
    * ±[[CusumSlack]] of the mean accumulate nothing, so the statistic
    * only charges sustained shifts.
    */
  private val CusumSlack = 1L

  /** CUSUM CHANGEPOINT DETECTION (Page 1954) — the sequential
    * shift-detector under every "did the rate move" alert: two one-sided
    * statistics per series, `S⁺ ← max(0, S⁺ + (n − μ − k))` and
    * `S⁻ ← max(0, S⁻ + (μ − n − k))`, flag when either exceeds the
    * decision interval (here μ itself — a mean-sized cumulative
    * deviation). Every term is a plain integer on the hourly count
    * domain — μ is the floor mean `Σn div H` — so both engines agree on
    * every value, and unlike [[ewma]]'s smoothing (which a threshold
    * still reads pointwise) CUSUM accumulates small sustained drifts
    * that no single point would trip.
    *
    * Scale shape: identical to [[ewma]] — the stream collapses map-side
    * to the (type, hour) count domain, μ rides the same aggregation,
    * and the two-state fold runs inside one codegen'd `aggregate` HOF
    * per type; each output depends on the previous OUTPUT (the max-0
    * clamp), which is exactly what a window frame cannot express.
    */
  private val cusum: Q = (s, d) => {
    val hourly = T(s, d, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val listed = hourly.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("h"), col("n")))).as("xs"),
        expr("sum(n) div count(1)").as("mu"))
    val folded = listed.select(col("event_type"), col("mu"), explode(expr(
      s"""aggregate(xs,
         |  slice(transform(xs, x -> named_struct(
         |    'h', x.h, 'n', x.n,
         |    'sp', CAST(0 AS BIGINT), 'sn', CAST(0 AS BIGINT))), 1, 0),
         |  (acc, x) -> concat(acc, array(named_struct(
         |    'h', x.h, 'n', x.n,
         |    'sp', greatest(CAST(0 AS BIGINT),
         |      CASE WHEN size(acc) = 0 THEN CAST(0 AS BIGINT)
         |           ELSE element_at(acc, -1).sp END
         |      + (x.n - mu - $CusumSlack)),
         |    'sn', greatest(CAST(0 AS BIGINT),
         |      CASE WHEN size(acc) = 0 THEN CAST(0 AS BIGINT)
         |           ELSE element_at(acc, -1).sn END
         |      + (mu - x.n - $CusumSlack))))))""".stripMargin)).as("e"))
    folded.select(col("event_type"),
      unix_seconds(col("e.h").cast("timestamp")).as("hour_epoch"),
      col("e.n").as("n"), col("mu"),
      col("e.sp").as("cusum_pos"), col("e.sn").as("cusum_neg"),
      when(col("e.sp") > col("mu") || col("e.sn") > col("mu"), lit(1L))
        .otherwise(lit(0L)).as("alarm"))
  }

  /** M4 pixel-bucket width (seconds): 6 h → ~120 buckets over the
    * month-long event range, a dashboard-like reduction.
    */
  private val M4Span = 21600L

  /** M4 TIME-SERIES DOWNSAMPLING (Jugel et al., VLDB 2014) — the
    * published error-free line-chart reduction: per (series, time
    * bucket), keep exactly the FOUR values a pixel column can render —
    * min, max, first, last — so the downsampled series draws the
    * identical line at that resolution while shrinking 100 TB of points
    * to O(pixels). Everything is exact integer cents; first/last are
    * anchored on the registry's (ts, event_id) total order via window
    * row numbers, so both engines pick the same endpoints even inside
    * equal-timestamp bursts.
    *
    * Scale shape: ONE shuffle onto (type, bucket) for the window pass
    * (running frames, no re-scan), and the final aggregation reuses the
    * same key so it collapses map-side — the output is the bucket
    * domain, tiny forever.
    */
  private val m4Downsample: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type"), col("bucket_epoch"))
      .orderBy(col("te"), col("event_id"))
    T(s, d, "events")
      .select(col("event_type"), col("event_id"),
        unix_seconds(col("ts").cast("timestamp")).as("te"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("bucket_epoch", expr(s"te div $M4Span * $M4Span"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("bucket_epoch"))))
      .groupBy(col("event_type"), col("bucket_epoch"))
      .agg(count(lit(1)).as("n"),
        min(col("c")).as("v_min_cents"), max(col("c")).as("v_max_cents"),
        max(when(col("rn") === 1, col("c"))).as("v_first_cents"),
        max(when(col("rn") === col("cnt"), col("c"))).as("v_last_cents"))
  }

  /** CEP pattern window (seconds): view→purchase within this.
    * `private[graft]` so the streaming twin ([[graft.streaming.CepFold]])
    * references THIS constant — the batch face, its oracle, and the
    * fold must never desynchronize on the window.
    */
  private[graft] val CepWindow = 3600L

  /** Packing base for the `(te, event_id)` → single-long total-order
    * ordinal the CEP and rate-limit faces share with their streaming
    * folds and the DuckDB oracle. Order-equivalence REQUIRES
    * `event_id < OrdBase`: past it, ordinals from different seconds
    * interleave and `ord div OrdBase` decodes the wrong second. All
    * three implementations pack through this constant, and the batch
    * face raises at runtime on violation ([[packedOrd]]) — at archive
    * scale event_id WILL eventually cross any fixed base, and the hash
    * gate can't see a divergence all three sides share.
    */
  private[graft] val OrdBase = 10000000L

  /** The guarded packing: `te·OrdBase + event_id`, raising on an
    * event_id outside the packable domain instead of silently
    * corrupting the total order. Stays inside whole-stage codegen
    * (when/raise_error are codegen'd scalar expressions).
    */
  private def packedOrd(te: Column, eventId: Column): Column =
    when(eventId >= 0 && eventId < OrdBase, te * OrdBase + eventId)
      .otherwise(raise_error(concat(
        lit(s"packed ordinal overflow: event_id "), eventId,
        lit(s" outside [0, $OrdBase)"))))

  /** COMPLEX-EVENT-PROCESSING PATTERN MATCH — `view → purchase within
    * 1 h with NO error in between`, the NEGATIVE-condition sequence
    * rule the funnel faces can't express (funnels count presence of
    * stages; CEP also constrains what must NOT occur between them —
    * SASE/MATCH_RECOGNIZE's `A ¬C B` shape). Per purchase, ONE carry
    * window per user yields the most recent preceding view and error
    * (as combined `ts·10⁷+event_id` ordinals, so "between" is exact on
    * the registry's total order even inside same-second bursts); the
    * match test is then row-local arithmetic, and matches roll up per
    * day.
    *
    * Scale shape: one shuffle on user_id for the carry window (running
    * frame, never re-scanned — the attribution topology), then map-side
    * collapse onto the day domain. No self-join of purchases onto
    * candidate views, no per-pattern state machine.
    */
  private val cepMatch: Q = (s, d) => cepMatchOn(T(s, d, "events"))

  /** The CEP body on an arbitrary events frame — split out so the
    * negative condition and window boundary are testable on literal
    * sequences.
    */
  private[graft] def cepMatchOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_type"),
        unix_seconds(col("ts").cast("timestamp")).as("te"),
        col("event_id"))
      .withColumn("ord", packedOrd(col("te"), col("event_id")))
      .withColumn("lv",
        last(when(col("event_type") === "view", col("ord")),
          ignoreNulls = true).over(w))
      .withColumn("le",
        last(when(col("event_type") === "error", col("ord")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("matched",
        when(col("lv").isNotNull
          && col("te") - expr(s"lv div $OrdBase") <= CepWindow
          && (col("le").isNull || col("le") < col("lv")), lit(1L))
          .otherwise(lit(0L)))
      .groupBy(expr("te div 86400 * 86400").as("day_epoch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("matched")).as("n_matched"))
  }

  /** Gap thresholds swept by [[sessionSweep]] (seconds). */
  private val SweepGaps = Seq(900L, 1800L, 3600L, 7200L)

  /** SESSION-COUNT vs GAP-THRESHOLD SWEEP — the sessionization knob as
    * a hash-checked curve (the fourth tuning-curve gate): per
    * inactivity threshold, the corpus-wide session count. A session
    * starts at a user's first event or wherever the gap to the
    * previous event exceeds the threshold, so
    * `n_sessions(T) = Σ users + Σ [gap > T]` — ONE windowed lag pass
    * computes every threshold's count simultaneously (each row's gap
    * is compared to all four constants in the same aggregate), and a
    * larger threshold can only merge sessions, so the curve is
    * monotone non-increasing (spec-pinned).
    */
  private val sessionSweep: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapped = T(s, d, "events")
      .withColumn("gap",
        unix_seconds(col("ts").cast("timestamp")) -
          unix_seconds(lag(col("ts"), 1).over(byUser).cast("timestamp")))
    val aggs = SweepGaps.map(t =>
      count_if(col("gap").isNull || col("gap") > t).as(s"s$t"))
    gapped.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(SweepGaps.map(t =>
        struct(lit(t).as("gap_seconds"), col(s"s$t").as("n_sessions")))
        : _*)).as("r"))
      .select(col("r.gap_seconds").as("gap_seconds"),
        col("r.n_sessions").as("n_sessions"))
  }

  /** SAX parameters: 6 piecewise segments of 5 days, 4-letter alphabet
    * on fixed integer breakpoints (5/10/15 events per segment). */
  private val SaxSegments = 6L
  private val SaxSegDays = 5L

  /** SAX TIME-SERIES FINGERPRINTING (Lin & Keogh's Symbolic Aggregate
    * approXimation — the classic symbolic representation behind
    * distributed time-series similarity search): each user's 30-day
    * activity series reduces to piecewise segment AGGREGATES
    * ([[SaxSegments]] sums — integer PAA; equal segment lengths make
    * sums order-equivalent to means), each segment quantizes to a
    * 4-letter alphabet on fixed integer breakpoints, and the
    * concatenated word is the series' similarity KEY: users sharing a
    * word are bucket-join candidates for "similar behavior" — the same
    * banding idiom the dedup family uses, applied to the time axis.
    * The report is the word census plus the per-bucket candidate-pair
    * count (what the verify stage downstream would price).
    *
    * Scale shape: one aggregation onto (user, segment), densified to
    * the fixed segment domain by an equi-join against
    * user × [0, segments) (inactive segments read 0 — the empty
    * segment IS signal), the word built by a deterministic
    * struct-array sort, one final census aggregation. The day anchor
    * is the single-row min-day scalar broadcast (allowlisted pattern).
    */
  private val saxMatch: Q = (s, d) => {
    val ev = T(s, d, "events").select(col("user_id"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"))
    val mn = ev.agg(min(col("day")).as("d0"))
    val seg = ev.crossJoin(broadcast(mn))
      .select(col("user_id"),
        least(expr(s"(day - d0) div $SaxSegDays"), lit(SaxSegments - 1))
          .as("seg"))
      .groupBy(col("user_id"), col("seg")).agg(count(lit(1)).as("n"))
    val words = ev.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(lit(0L), lit(SaxSegments - 1))).as("seg"))
      .join(seg, Seq("user_id", "seg"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("sym",
        when(col("n") < 5, "a").when(col("n") < 10, "b")
          .when(col("n") < 15, "c").otherwise("d"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("seg"), col("sym")))),
        x => x.getField("sym")), "").as("word"))
    words.groupBy(col("word"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("candidate_pairs", expr("n_users * (n_users - 1) div 2"))
  }

  /** A/B EXPERIMENT ASSIGNMENT AND READOUT — deterministic hash
    * bucketing (the industry-standard sticky assignment: arm is a pure
    * function of user_id, so every event of a user lands in one arm,
    * replays reassign identically, and no assignment table needs
    * storing) plus the per-arm readout every experimentation platform
    * reports: users, events, conversions, exact revenue cents — and
    * the SAMPLE-RATIO-MISMATCH audit in basis points, the first
    * integrity check an experiment review asks for (a skewed split
    * means the bucketing or logging is broken and the readout is
    * garbage). The float significance test belongs downstream; the
    * counts it consumes are all hash-checked here.
    *
    * Scale shape: assignment is a scan-local expression; one
    * aggregation onto the 2-row arm domain (countDistinct shuffles
    * (arm, user) partials map-side); the SRM window runs over 2 rows.
    */
  private val abAssign: Q = (s, d) => {
    val arm = when(conv(substring(md5(concat(lit("ab:"),
      col("user_id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % 2 === 0, "control").otherwise("treatment")
    T(s, d, "events")
      .select(arm.as("arm"), col("user_id"), col("event_type"),
        col("value"))
      .groupBy(col("arm"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        count_if(col("event_type") === "purchase").as("n_conversions"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(lit(0L)))
          .as("revenue_cents"))
      .withColumn("tot", sum(col("n_users")).over(Window.partitionBy()))
      .select(col("arm"), col("n_users"), col("n_events"),
        col("n_conversions"), col("revenue_cents"),
        expr("abs(2 * n_users - tot) * 10000 div tot").as("srm_dev_bp"))
  }

  val queries: Map[String, Q] = Map(
    "events_ab_assign" -> abAssign,
    "events_session_sweep" -> sessionSweep,
    "ts_sax_match" -> saxMatch,
    "events_rate_limit" -> rateLimit,
    "events_forecast_eval" -> forecastEval,
    "events_holtwinters" -> holtWinters,
    "events_cep_match" -> cepMatch,
    "events_m4_downsample" -> m4Downsample,
    "events_cusum" -> cusum,
    "events_ewma" -> ewma,
    "events_holt" -> holt,
    "events_outage_gaps" -> outageGaps,
    "events_cohort_ltv" -> cohortLtv,
    "events_attribution" -> attribution,
    "events_markov" -> markov,
    "events_timeweighted" -> timeWeighted,
    "events_rfm" -> rfm,
    "events_state_history" -> stateHistory,
    "audience_overlap" -> audienceOverlap,
    "events_sliding_uniques" -> slidingUniques,
    "events_churn" -> churn,
    "events_paths" -> paths,
    "retention_cohorts" -> retention,
    "funnel_conversion" -> funnel,
    "asof_join" -> asofJoin,
    "sessionize" -> sessionize,
    "sessionize_native" -> sessionizeNative,
    "gapfill_hours" -> gapfill,
    "interval_join" -> intervalJoin,
    "events_anomaly" -> eventsAnomaly,
  )

  /** The identical three-state recurrence as a recursive CTE whose rows
    * CARRY the 24-slot seasonal vector as a list column, the slot write
    * expressed with list slices; `//` matches `div` per the holt
    * precedent, and the forecast reads the pre-update vector (the
    * mod-24-neighbor simplification both engines share).
    */
  private val holtWintersOracle: String = {
    val zeros = (1 to 24).map(_ => "0").mkString("[", ",", "]") + "::BIGINT[]"
    val sOld = "r.seas[h.idx + 1]"
    val lp = s"((h.n * 1000 - $sOld + r.l + r.b) // 2)"
    val bp = s"((r.b + ($lp - r.l)) // 2)"
    val sn = s"(($sOld + h.n * 1000 - $lp) // 2)"
    val seasUpd = s"r.seas[1:h.idx] || [$sn] || r.seas[h.idx + 2:24]"
    val fc = s"($lp + $bp + r.seas[((h.idx + 1) % 24) + 1])"
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY date_trunc('hour', ts)) AS rn
       |  FROM events GROUP BY 1, 2),
       |hx AS (
       |  SELECT *, CAST((CAST(floor(epoch(h)) AS BIGINT) // 3600) % 24
       |    AS INT) AS idx
       |  FROM hourly),
       |rec AS (
       |  SELECT event_type, rn, h, n,
       |    CAST(n * 1000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
       |    CAST(0 AS BIGINT) AS s, $zeros AS seas,
       |    CAST(n * 1000 AS BIGINT) AS f
       |  FROM hx WHERE rn = 1
       |  UNION ALL
       |  SELECT h.event_type, h.rn, h.h, h.n,
       |    CAST($lp AS BIGINT), CAST($bp AS BIGINT), CAST($sn AS BIGINT),
       |    $seasUpd, CAST($fc AS BIGINT)
       |  FROM rec r JOIN hx h
       |    ON h.event_type = r.event_type AND h.rn = r.rn + 1)
       |SELECT event_type, CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch,
       |  n, l AS level_scaled, b AS trend_scaled, s AS seasonal_scaled,
       |  f AS forecast_scaled
       |FROM rec""".stripMargin
  }

  /** The `events_holt` oracle, named so [[forecastEval]]'s oracle can
    * embed it as a derived table.
    */
  private val holtOracleText: String =
    """WITH RECURSIVE hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY date_trunc('hour', ts)) AS rn
      |  FROM events GROUP BY 1, 2),
      |rec AS (
      |  SELECT event_type, rn, h, n,
      |    n * 1000 AS lv, CAST(0 AS BIGINT) AS tr
      |  FROM hourly WHERE rn = 1
      |  UNION ALL
      |  SELECT h.event_type, h.rn, h.h, h.n,
      |    (r.lv + r.tr + h.n * 1000) // 2,
      |    (r.tr + ((r.lv + r.tr + h.n * 1000) // 2 - r.lv)) // 2
      |  FROM rec r JOIN hourly h
      |    ON h.event_type = r.event_type AND h.rn = r.rn + 1)
      |SELECT event_type, CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch,
      |  n, CAST(lv AS BIGINT) AS level_scaled,
      |  CAST(tr AS BIGINT) AS trend_scaled,
      |  CAST(lv + tr AS BIGINT) AS forecast_scaled
      |FROM rec""".stripMargin

  val oracles: Map[String, String] = Map(
    "ts_sax_match" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
         |  FROM events),
         |mn AS (SELECT min(day) AS d0 FROM ev),
         |seg AS (
         |  SELECT user_id, least((day - d0) // $SaxSegDays,
         |    ${SaxSegments - 1}) AS seg, count(*) AS n
         |  FROM ev, mn GROUP BY 1, 2),
         |dense AS (
         |  SELECT u.user_id, g.seg, coalesce(s.n, 0) AS n
         |  FROM (SELECT DISTINCT user_id FROM ev) u
         |  CROSS JOIN unnest(generate_series(0, ${SaxSegments - 1}))
         |    g(seg)
         |  LEFT JOIN seg s ON s.user_id = u.user_id AND s.seg = g.seg),
         |words AS (
         |  SELECT user_id,
         |    string_agg(CASE WHEN n < 5 THEN 'a' WHEN n < 10 THEN 'b'
         |      WHEN n < 15 THEN 'c' ELSE 'd' END, '' ORDER BY seg)
         |      AS word
         |  FROM dense GROUP BY 1)
         |SELECT word, count(*) AS n_users,
         |  count(*) * (count(*) - 1) // 2 AS candidate_pairs
         |FROM words GROUP BY 1""".stripMargin,
    "events_ab_assign" ->
      """WITH e AS (
        |  SELECT CASE WHEN
        |      ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 8))::BIGINT
        |      % 2 = 0
        |    THEN 'control' ELSE 'treatment' END AS arm,
        |    user_id, event_type, value
        |  FROM events),
        |agg AS (
        |  SELECT arm, count(DISTINCT user_id) AS n_users,
        |    count(*) AS n_events,
        |    count(*) FILTER (event_type = 'purchase') AS n_conversions,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS revenue_cents
        |  FROM e GROUP BY 1)
        |SELECT arm, n_users, n_events, n_conversions, revenue_cents,
        |  abs(2 * n_users - CAST(sum(n_users) OVER () AS BIGINT)) * 10000
        |    // CAST(sum(n_users) OVER () AS BIGINT) AS srm_dev_bp
        |FROM agg""".stripMargin,
    // the same clamped refill-and-spend recurrence per user; the seed
    // row is the full bucket spending its first token
    "events_rate_limit" ->
      s"""WITH RECURSIVE ev AS (
         |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS te, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS rn
         |  FROM events),
         |rec AS (
         |  SELECT user_id, rn, te, CAST(0 AS BIGINT) AS tok,
         |    CAST(1 AS BIGINT) AS na, CAST(0 AS BIGINT) AS nd
         |  FROM ev WHERE rn = 1
         |  UNION ALL
         |  SELECT e.user_id, e.rn, e.te,
         |    CASE WHEN least(1000, r.tok + ((e.te - r.te) * 1000)
         |           // $RlRefillSec) >= 1000
         |      THEN least(1000, r.tok + ((e.te - r.te) * 1000)
         |           // $RlRefillSec) - 1000
         |      ELSE least(1000, r.tok + ((e.te - r.te) * 1000)
         |           // $RlRefillSec) END,
         |    r.na + CASE WHEN least(1000, r.tok + ((e.te - r.te) * 1000)
         |           // $RlRefillSec) >= 1000 THEN 1 ELSE 0 END,
         |    r.nd + CASE WHEN least(1000, r.tok + ((e.te - r.te) * 1000)
         |           // $RlRefillSec) >= 1000 THEN 0 ELSE 1 END
         |  FROM rec r JOIN ev e
         |    ON e.user_id = r.user_id AND e.rn = r.rn + 1),
         |last AS (
         |  SELECT user_id, rn, tok, na, nd, row_number() OVER (
         |    PARTITION BY user_id ORDER BY rn DESC) AS rr
         |  FROM rec)
         |SELECT user_id, CAST(rn AS BIGINT) AS n_events,
         |  CAST(na AS BIGINT) AS n_allowed, CAST(nd AS BIGINT) AS n_dropped,
         |  CAST(tok AS BIGINT) AS tokens_final_scaled
         |FROM last WHERE rr = 1""".stripMargin,
    // both recursive oracles embed as derived tables; positional join
    // on (type, rn), integer MAE
    "events_forecast_eval" ->
      s"""WITH h AS (
         |  SELECT event_type, hour_epoch, n, forecast_scaled AS f,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY hour_epoch) AS rn
         |  FROM (${holtOracleText})),
         |hw AS (
         |  SELECT event_type, forecast_scaled AS f,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY hour_epoch) AS rn
         |  FROM (${holtWintersOracle})),
         |act AS (
         |  SELECT event_type, rn - 1 AS rn, n * 1000 AS actual_scaled
         |  FROM h),
         |j AS (
         |  SELECT h.event_type, h.f AS f_holt, hw.f AS f_hw,
         |    act.actual_scaled
         |  FROM h JOIN hw USING (event_type, rn)
         |  JOIN act USING (event_type, rn)),
         |m AS (
         |  SELECT event_type, count(*) AS n_evals,
         |    CAST(sum(abs(f_holt - actual_scaled)) // count(*) AS BIGINT)
         |      AS mae_holt_scaled,
         |    CAST(sum(abs(f_hw - actual_scaled)) // count(*) AS BIGINT)
         |      AS mae_hw_scaled
         |  FROM j GROUP BY 1)
         |SELECT event_type, n_evals, mae_holt_scaled, mae_hw_scaled,
         |  CAST(CASE WHEN mae_hw_scaled < mae_holt_scaled THEN 1 ELSE 0 END
         |       AS BIGINT) AS hw_wins
         |FROM m""".stripMargin,
    "events_holtwinters" -> holtWintersOracle,
    // same carry ordinals; lag-free formulation via last_value IGNORE
    // NULLS over the identical frame
    "events_cep_match" ->
      s"""WITH t AS (
         |  SELECT user_id, event_type, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS te
         |  FROM events),
         |o AS (
         |  SELECT *, te * $OrdBase + event_id AS ord FROM t),
         |c AS (
         |  SELECT user_id, event_type, te,
         |    last_value(CASE WHEN event_type = 'view' THEN ord END
         |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ord
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv,
         |    last_value(CASE WHEN event_type = 'error' THEN ord END
         |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ord
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS le
         |  FROM o)
         |SELECT (te // 86400) * 86400 AS day_epoch,
         |  count(*) AS n_purchases,
         |  CAST(sum(CASE WHEN lv IS NOT NULL
         |    AND te - lv // $OrdBase <= $CepWindow
         |    AND (le IS NULL OR le < lv) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_matched
         |FROM c WHERE event_type = 'purchase'
         |GROUP BY 1""".stripMargin,
    // same bucketing, same (ts, event_id)-anchored endpoints
    "events_m4_downsample" ->
      s"""WITH t AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS te,
         |    CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events),
         |b AS (
         |  SELECT event_type, c,
         |    (te // $M4Span) * $M4Span AS bucket_epoch,
         |    row_number() OVER (PARTITION BY event_type, (te // $M4Span)
         |      ORDER BY te, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type, (te // $M4Span))
         |      AS cnt
         |  FROM t)
         |SELECT event_type, bucket_epoch, count(*) AS n,
         |  min(c) AS v_min_cents, max(c) AS v_max_cents,
         |  max(CASE WHEN rn = 1 THEN c END) AS v_first_cents,
         |  max(CASE WHEN rn = cnt THEN c END) AS v_last_cents
         |FROM b GROUP BY 1, 2""".stripMargin,
    // the identical clamped two-state recurrence; mu = Σn // H is
    // nonnegative, so // floors exactly like Spark's div here
    "events_cusum" ->
      s"""WITH RECURSIVE hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY date_trunc('hour', ts)) AS rn
         |  FROM events GROUP BY 1, 2),
         |st AS (
         |  SELECT event_type, sum(n) // count(*) AS mu FROM hourly
         |  GROUP BY 1),
         |rec AS (
         |  SELECT h.event_type, h.rn, h.h, h.n, st.mu,
         |    greatest(0, h.n - st.mu - $CusumSlack) AS sp,
         |    greatest(0, st.mu - h.n - $CusumSlack) AS sn
         |  FROM hourly h JOIN st USING (event_type) WHERE h.rn = 1
         |  UNION ALL
         |  SELECT h.event_type, h.rn, h.h, h.n, r.mu,
         |    greatest(0, r.sp + (h.n - r.mu - $CusumSlack)),
         |    greatest(0, r.sn + (r.mu - h.n - $CusumSlack))
         |  FROM rec r JOIN hourly h
         |    ON h.event_type = r.event_type AND h.rn = r.rn + 1)
         |SELECT event_type, CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch,
         |  n, CAST(mu AS BIGINT) AS mu,
         |  CAST(sp AS BIGINT) AS cusum_pos, CAST(sn AS BIGINT) AS cusum_neg,
         |  CAST(CASE WHEN sp > mu OR sn > mu THEN 1 ELSE 0 END AS BIGINT)
         |    AS alarm
         |FROM rec""".stripMargin,
    // the identical integer recurrence as a recursive CTE over the
    // per-type hour sequence; // floors like Spark's div on nonnegatives
    "events_ewma" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY date_trunc('hour', ts)) AS rn
        |  FROM events GROUP BY 1, 2),
        |rec AS (
        |  SELECT event_type, rn, h, n, n * 1000 AS s
        |  FROM hourly WHERE rn = 1
        |  UNION ALL
        |  SELECT h.event_type, h.rn, h.h, h.n, (r.s + h.n * 1000) // 2
        |  FROM rec r JOIN hourly h
        |    ON h.event_type = r.event_type AND h.rn = r.rn + 1)
        |SELECT event_type, CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch,
        |  n, CAST(s AS BIGINT) AS ewma_scaled
        |FROM rec""".stripMargin,
    "events_outage_gaps" ->
      s"""WITH t AS (
         |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS te,
         |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
         |      PARTITION BY event_type ORDER BY ts, event_id) AS pe
         |  FROM events)
         |SELECT event_type, pe AS gap_start_epoch, te AS gap_end_epoch,
         |  te - pe AS gap_seconds
         |FROM t WHERE te - pe > $GapSeconds""".stripMargin,
    // the same two-state recurrence; `//` truncates toward zero exactly
    // like Spark's `div`, including on the negative trend values
    "events_holt" -> holtOracleText,
    // the retention cohort CTEs + exact-cents weekly revenue and a
    // running sum over the observed weeks
    "events_cohort_ltv" ->
      """WITH wk AS (
        |  SELECT user_id, event_type, value,
        |    date_diff('day', DATE '1970-01-01',
        |              CAST(date_trunc('week', ts) AS DATE)) AS week_day
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, min(week_day) AS cohort_day FROM wk GROUP BY 1),
        |weekly AS (
        |  SELECT c.cohort_day,
        |    CAST((w.week_day - c.cohort_day) // 7 AS BIGINT) AS weeks_since,
        |    CAST(sum(CAST(round(w.value * 100) AS BIGINT)) AS BIGINT)
        |      AS revenue_cents
        |  FROM wk w JOIN cohorts c USING (user_id)
        |  WHERE w.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_day, weeks_since, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_day
        |    ORDER BY weeks_since
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_revenue_cents
        |FROM weekly""".stripMargin,
    // the same carry window; DuckDB's IGNORE NULLS last_value over the
    // strictly-preceding frame
    "events_attribution" ->
      """WITH c AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS touch_type,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM c WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
    "events_markov" ->
      """WITH o AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM m""".stripMargin,
    "events_timeweighted" ->
      """WITH o AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) AS v_c,
        |    CAST(floor(epoch(lead(ts, 1) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id))) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) AS dur
        |  FROM events),
        |a AS (
        |  SELECT user_id, CAST(sum(v_c * dur) AS BIGINT) AS vd,
        |    CAST(sum(dur) AS BIGINT) AS span_s
        |  FROM o WHERE dur IS NOT NULL GROUP BY 1)
        |SELECT user_id, span_s,
        |  round(CAST(vd AS DOUBLE) / CAST(span_s AS DOUBLE), 6) AS twap_c
        |FROM a WHERE span_s > 0""".stripMargin,
    "events_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(max(ts) AS DATE),
        |      (SELECT CAST(max(ts) AS DATE) FROM events)) AS r_days,
        |    count(*) AS f,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS m_cents
        |  FROM events GROUP BY 1),
        |sc AS (
        |  SELECT user_id, r_days, f, m_cents,
        |    CAST(ntile(5) OVER (ORDER BY -r_days, user_id) AS BIGINT)
        |      AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY f, user_id) AS BIGINT)
        |      AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY m_cents, user_id) AS BIGINT)
        |      AS m_score
        |  FROM u)
        |SELECT user_id, r_days, f, m_cents, r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS rfm_code
        |FROM sc""".stripMargin,
    "events_state_history" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type, 1) OVER w AS prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (
        |  SELECT *, CAST(sum(CASE WHEN prev IS NULL
        |      OR prev <> event_type THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM o),
        |runs AS (
        |  SELECT user_id, version, min(event_type) AS state,
        |    min(ts) AS valid_from, count(*) AS n_events
        |  FROM f GROUP BY 1, 2)
        |SELECT user_id, version, state, valid_from,
        |  lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
        |    AS valid_to,
        |  n_events
        |FROM runs""".stripMargin,
    "audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        |b AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
        |  round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
        |    AS jaccard
        |FROM b
        |JOIN sizes sa ON sa.event_type = type_a
        |JOIN sizes sb ON sb.event_type = type_b""".stripMargin,
    "events_churn" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01',
        |              CAST(date_trunc('week', ts) AS DATE)) AS w
        |  FROM events),
        |f AS (SELECT user_id, min(w) AS fw FROM uw GROUP BY 1),
        |p AS (SELECT user_id, w + 7 AS w FROM uw),
        |a AS (SELECT w, count(*) AS n_active,
        |        CAST(sum(CASE WHEN fw = w THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_new
        |      FROM uw JOIN f USING (user_id) GROUP BY 1),
        |r AS (SELECT uw.w, count(*) AS n_retained
        |      FROM uw JOIN p ON p.user_id = uw.user_id AND p.w = uw.w
        |      GROUP BY 1),
        |c AS (SELECT p.w, count(*) AS n_churned
        |      FROM p LEFT JOIN uw ON uw.user_id = p.user_id AND uw.w = p.w
        |      WHERE uw.user_id IS NULL GROUP BY 1)
        |SELECT a.w AS week_day, a.n_active, a.n_new,
        |  coalesce(r.n_retained, 0) AS n_retained,
        |  coalesce(c.n_churned, 0) AS n_churned
        |FROM a LEFT JOIN r USING (w) LEFT JOIN c USING (w)""".stripMargin,
    "events_paths" ->
      s"""WITH o AS (
         |  SELECT event_type,
         |    lead(event_type, 1) OVER w AS t2,
         |    lead(event_type, 2) OVER w AS t3
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_type || '>' || t2 || '>' || t3 AS path,
         |  count(*) AS n
         |FROM o WHERE t3 IS NOT NULL
         |GROUP BY 1 ORDER BY n DESC, path LIMIT $PathsTopK""".stripMargin,
    "events_sliding_uniques" ->
      s"""WITH e AS (
         |  SELECT user_id,
         |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600 AS h
         |  FROM events),
         |hourly AS (SELECT h, count(*) AS n_events FROM e GROUP BY 1),
         |pairs AS (SELECT DISTINCT user_id, h FROM e),
         |u1 AS (SELECT h, count(*) AS n_uniques FROM pairs GROUP BY 1),
         |cov AS (SELECT DISTINCT user_id, h + i AS h
         |        FROM pairs, unnest(generate_series(0, ${SlideHours - 1})) t(i)),
         |u3 AS (SELECT h, count(*) AS n_uniques_3h FROM cov GROUP BY 1)
         |SELECT h AS hour_epoch, n_events, n_uniques,
         |  CAST(sum(n_events) OVER (ORDER BY h
         |    RANGE BETWEEN ${SlideHours - 1} PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS n_events_3h,
         |  n_uniques_3h
         |FROM hourly JOIN u1 USING (h) JOIN u3 USING (h)""".stripMargin,
    "retention_cohorts" ->
      """WITH wk AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01',
        |              CAST(date_trunc('week', ts) AS DATE)) AS week_day
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, min(week_day) AS cohort_day FROM wk GROUP BY 1),
        |activity AS (SELECT DISTINCT user_id, week_day FROM wk)
        |SELECT c.cohort_day,
        |  CAST((a.week_day - c.cohort_day) // 7 AS BIGINT) AS weeks_since,
        |  count(*) AS n_users
        |FROM activity a JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |         OVER (PARTITION BY user_id) AS v_ts FROM e),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts
        |                          THEN ts END)
        |         OVER (PARTITION BY user_id) AS c_ts FROM w1),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts
        |                          THEN ts END)
        |         OVER (PARTITION BY user_id) AS p_ts FROM w2),
        |u AS (SELECT user_id, min(v_ts) AS vt, min(c_ts) AS ct,
        |             min(p_ts) AS pt
        |      FROM w3 GROUP BY user_id)
        |SELECT 'view' AS stage, count(vt) AS n_users FROM u
        |UNION ALL SELECT 'click', count(ct) FROM u
        |UNION ALL SELECT 'purchase', count(pt) FROM u""".stripMargin,
    "asof_join" ->
      """SELECT event_id AS purchase_id, user_id, signup_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_id
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |WHERE event_type = 'purchase'""".stripMargin,
    "events_session_sweep" -> {
      val branches = SweepGaps.map(t =>
        s"""SELECT CAST($t AS BIGINT) AS gap_seconds,
           |  count(*) FILTER (gap IS NULL OR gap > $t) AS n_sessions
           |FROM g""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT CAST(floor(epoch(ts)) AS BIGINT)
         |    - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id))) AS BIGINT) AS gap
         |  FROM events)
         |$branches""".stripMargin
    },
    "sessionize" ->
      """SELECT user_id, session_no, count(*) AS n_events,
        |  round(sum(value), 2) AS session_value
        |FROM (
        |  SELECT user_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM (
        |    SELECT user_id, ts, event_id, value,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |             OR CAST(floor(epoch(ts)) AS BIGINT)
        |                - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY user_id, session_no""".stripMargin,
    "sessionize_native" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts)
        |              - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
        |         THEN 1 ELSE 0 END AS ns,
        |    event_id
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n
        |FROM sess GROUP BY user_id, sid""".stripMargin,
    "events_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch, n,
        |  CAST(count(n) OVER w AS BIGINT) AS w_cnt,
        |  CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS w_sum,
        |  (count(n) OVER w > 0 AND
        |   n * count(n) OVER w > 2 * coalesce(sum(n) OVER w, 0)) AS is_spike
        |FROM hourly
        |WINDOW w AS (PARTITION BY event_type ORDER BY h
        |             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "gapfill_hours" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        |  FROM hourly)
        |SELECT CAST(floor(epoch(spine.h)) AS BIGINT) AS hour_epoch,
        |  coalesce(n, 0) AS n
        |FROM spine LEFT JOIN hourly ON spine.h = hourly.h""".stripMargin,
    "interval_join" ->
      s"""WITH f AS (SELECT * FROM events WHERE user_id < $IjMaxUser),
         |m AS (SELECT user_id, ts, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR CAST(floor(epoch(ts)) AS BIGINT)
         |              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
         |              > $GapSeconds
         |         THEN 1 ELSE 0 END AS ns
         |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |c AS (SELECT user_id, sec,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS sid
         |  FROM m),
         |sess AS (SELECT user_id, sid, min(sec) AS s, max(sec) AS e
         |         FROM c GROUP BY 1, 2)
         |SELECT a.user_id AS user_a, a.sid AS sess_a,
         |  b.user_id AS user_b, b.sid AS sess_b,
         |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_secs
         |FROM sess a JOIN sess b
         |  ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e""".stripMargin,
  )
}
