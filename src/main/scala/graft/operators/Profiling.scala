package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{load => T}

/** Data-quality operators: table profiling (the `ANALYZE`-style
  * per-column statistics report every warehouse exposes) and
  * corrupt-record quarantine (the ingestion-robustness split every
  * pipeline needs at the door).
  */
object Profiling {

  type Q = (SparkSession, String) => DataFrame

  private val NumCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
  private val StrCols = Seq("o_orderstatus", "o_orderpriority")

  /** Per-column profile of `orders`: null count, exact distinct count,
    * min/max — numerics in double columns, strings in string columns
    * (numbers never render to text, so no cross-engine formatting
    * hazard). TWO passes total, independent of column count: one plain
    * aggregation computes every column's nulls/min/max side by side
    * (codegen'd, no shuffle beyond the final merge), and the exact
    * distinct counts go through one explode → `(col, value)` keyed
    * two-phase distinct — partial dedup map-side, so the shuffle
    * carries per-partition distincts, never raw rows. (A single agg
    * with N `countDistinct`s instead plans an Expand — every row
    * replicated ×N through one aggregate — measured 2.5× slower at
    * sf0.1 than this split and strictly worse at scale; N separate
    * per-column aggs rescan the table N times.) At 100 TB the exact
    * count downgrades to HLL (`approx_count_distinct`, oracle-checked
    * in `approx_distinct`) and folds into the first pass — exactness
    * here is what makes the row hash-checkable.
    */
  private val profileOrders: Q = (s, d) => {
    val o = T(s, d, "orders")
    val all = NumCols ++ StrCols
    def moments(c: String) = Seq(
      (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max"))
    val aggs = all.flatMap(moments)
    val statRow = o.agg(aggs.head, aggs.tail: _*)
    // distinct values survive a string render (the doubles here format
    // 1-1), so one exploded column serves every source type
    val dist = o.select(explode(array(all.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.*"))
      .groupBy(col("col_name"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    val reports = NumCols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_min").cast("double").as("min_num"),
        col(s"${c}_max").cast("double").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ StrCols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}_nulls").as("n_nulls"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"${c}_min").as("min_str"),
        col(s"${c}_max").as("max_str"))
    }
    statRow.select(explode(array(reports: _*)).as("p")).select(col("p.*"))
      .join(dist, Seq("col_name"))
      .select(col("col_name"), col("n_nulls"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** Corrupt-record quarantine: a deterministic dirty JSON feed (every
    * 13th order's record is truncated mid-object — the classic torn
    * write) is split at the door into parsed rows and quarantined
    * ones, reported as per-bucket counts plus the extracted-key sum
    * over the GOOD rows only. The parse is `get_json_object` —
    * codegen'd, null on malformed input, no exceptions on the hot
    * path; the quarantined residue would be routed to a dead-letter
    * sink in production rather than dropped.
    */
  private val jsonQuarantine: Q = (s, d) => {
    val js = concat(lit("{\"k\":"), col("o_orderkey"),
      lit(",\"s\":\""), col("o_orderstatus"), lit("\"}"))
    T(s, d, "orders")
      .select(when(pmod(col("o_orderkey"), lit(13)) === 0,
        substring(js, 1, 9)).otherwise(js).as("js"))
      .select(get_json_object(col("js"), "$.k").cast("long").as("k"))
      .select(when(col("k").isNotNull, "parsed").otherwise("quarantined")
        .as("bucket"), col("k"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
  }

  /** Keys of `key` appearing more than once in `df` — the primary-key
    * uniqueness violation count. One hash shuffle on the key.
    */
  private[graft] def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Child rows whose `fk` has no match in `parent.pk` — referential-
    * integrity violations, shaped as a LEFT ANTI join so Catalyst can
    * broadcast a small parent or fall back to a shuffled hash join on
    * a 100 TB one; never a subquery-per-row.
    */
  private[graft] def danglingFk(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")

  /** Declarative data-quality suite over the star schema — the
    * constraint checks (PK unique, FK closed, ranges, temporal order,
    * non-null) every warehouse runs at the ingestion door, reported as
    * `(rule, n_checked, n_violations)`. The clean synthetic tables
    * yield all-zero violations — the healthy result the gate hashes;
    * detection itself is spec-asserted on deliberately dirty literal
    * frames. Row-local rules (range, non-null) fold into single
    * scan-level aggregates; the temporal rule joins lineitem→orders on
    * their shared key (co-partitioned shuffle join at scale).
    */
  private val dqChecks: Q = (s, d) => {
    val o = T(s, d, "orders")
    val li = T(s, d, "lineitem")
    val c = T(s, d, "customer")
    // FOUR jobs total (r7 shipped one checked/violations aggregate PAIR
    // per rule — ~10 scans for 5 rules): every row-local rule folds
    // into its table's single aggregate, and the two relational rules
    // (FK closure, temporal order) keep their join but share scans —
    // the temporal join doubles as lineitem's row-local pass.
    // 1. orders, keyed once on the PK: group sizes give the PK rule
    //    both faces AND the table's row count (FK rule's n_checked).
    val ordersAgg = o.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("pk_checked"),
        count_if(col("n") > 1).as("pk_viol"),
        sum(col("n")).as("orders_rows"))
    // 2. FK closure: LEFT ANTI against customer (broadcast or shuffled
    //    hash at Catalyst's discretion), count-only.
    val fkViol = danglingFk(o, "o_custkey", c, "c_custkey")
      .agg(count(lit(1)).as("fk_viol"))
    // 3. lineitem scanned ONCE: a LEFT join to orders keeps every row
    //    (o_orderkey is the PK — sizes checked by rule 1), so the range
    //    rule and the temporal rule ride the same pass; a NULL
    //    o_orderdate (dangling key) compares to null = not a violation,
    //    matching the oracle's inner join.
    val liAgg = li
      .join(o.select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"), "left")
      .agg(count(lit(1)).as("li_rows"),
        count_if(!col("l_quantity").between(1, 50)).as("qty_viol"),
        count_if(col("l_shipdate") < col("o_orderdate")).as("ship_viol"))
    // 4. customer row-local rules in one aggregate.
    val custAgg = c.agg(count(lit(1)).as("cust_rows"),
      count_if(col("c_name").isNull).as("name_viol"))
    // assemble the report: three single-row crossJoins (bounded by
    // construction, allowlisted in PlanGovernanceSpec) + one explode
    def row(rule: String, checked: String, viol: String) =
      struct(lit(rule).as("rule"), col(checked).as("n_checked"),
        col(viol).as("n_violations"))
    ordersAgg.crossJoin(fkViol).crossJoin(liAgg).crossJoin(custAgg)
      .select(explode(array(
        row("orders_pk_unique", "pk_checked", "pk_viol"),
        row("orders_fk_customer", "orders_rows", "fk_viol"),
        row("lineitem_qty_range", "li_rows", "qty_viol"),
        row("lineitem_ship_after_order", "li_rows", "ship_viol"),
        row("customer_name_nonnull", "cust_rows", "name_viol"))).as("r"))
      .select(col("r.*"))
  }

  /** Histogram bucket width: $5,000 in cents. */
  private val HistWidth = 500000L

  /** EQUI-WIDTH HISTOGRAM of `o_totalprice` — the ANALYZE statistic
    * next to [[profileOrders]]'s min/max/distinct: per fixed-width
    * bucket, the count plus the exact in-bucket extrema (which also
    * hash-pin the bucketing rule itself). Exact integer cents; one
    * map-side-combinable aggregation on the bucket key, output is the
    * O(range/width) bucket domain however big the table.
    */
  private val profileHistogram: Q = (s, d) =>
    T(s, d, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy(expr(s"c div $HistWidth").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))

  /** Minimum acceptable quasi-identifier group size. */
  private val KAnon = 5L

  /** K-ANONYMITY REPORT over the (nation, market-segment) quasi-
    * identifier — the release-gate governance check: a customer row is
    * k-anonymous when at least k rows share its quasi-identifier tuple,
    * so the per-group census with a `< k` flag IS the re-identification
    * risk surface (flagged groups are the rows a release would have to
    * suppress or generalize). One aggregation on the QI key; the QI
    * domain (|nations|·|segments|) stays tiny at any row count.
    */
  private val kAnonymity: Q = (s, d) =>
    T(s, d, "customer")
      .groupBy(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("below_k",
        when(col("n") < KAnon, lit(1L)).otherwise(lit(0L)))

  /** Numeric drift bin width: $50 in cents. */
  private val DriftBinCents = 5000L

  /** DISTRIBUTION-DRIFT REPORT between two dataset versions — the check
    * a training pipeline runs before admitting a new crawl snapshot:
    * has a column's distribution moved, did new categories appear, did
    * old ones vanish? The two "versions" are the data-defined halves of
    * the events table (time midpoint on the micros axis — a pure
    * expression both engines state identically); per profiled column
    * and bucket (categories for `event_type`, fixed $50 bins of
    * `value`) the report carries old/new counts, both shares in BASIS
    * POINTS (integer `div` — the exact-arithmetic cousin of the PSI
    * inputs; the float PSI itself is derived in ProfilingSpec, outside
    * the hash gate), the absolute share drift, and the
    * new/vanished/stable status flag.
    *
    * Scale shape: one single-row min/max scalar broadcast onto the
    * scan (the scalar-stats pattern, allowlisted), one
    * map-side-combinable aggregation onto the (column, bucket) domain,
    * and share windows partitioned by COLUMN NAME — rows per partition
    * bounded by the bucket domain, never the table.
    */
  private val dqSchemaDrift: Q = (s, d) => {
    val ev = T(s, d, "events")
      .select(expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsl"),
        col("event_type"), col("value"))
    val bounds = ev.agg(min(col("tsl")).as("t0"), max(col("tsl")).as("t1"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("is_new",
        (col("tsl") * 2 >= col("t0") + col("t1")).cast("long"))
    // ONE scan: each row contributes its two (column, bucket) facts
    // through a single explode instead of a self-union that would scan
    // the table (and rebuild the scalar broadcast) twice
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"))
    tagged.select(col("is_new"), explode(array(
        struct(lit("event_type").as("col_name"),
          col("event_type").as("bucket")),
        struct(lit("value").as("col_name"),
          concat(lit("bin_"),
            expr(s"CAST(round(value * 100) AS BIGINT) div $DriftBinCents"))
            .as("bucket")))).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.bucket").as("bucket"),
        col("is_new"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(count_if(col("is_new") === 0).as("n_old"),
        count_if(col("is_new") === 1).as("n_new"))
      .withColumn("tot_old", sum(col("n_old")).over(w))
      .withColumn("tot_new", sum(col("n_new")).over(w))
      .withColumn("share_old_bp", expr("(n_old * 10000) div tot_old"))
      .withColumn("share_new_bp", expr("(n_new * 10000) div tot_new"))
      .select(col("col_name"), col("bucket"), col("n_old"), col("n_new"),
        col("share_old_bp"), col("share_new_bp"),
        abs(col("share_new_bp") - col("share_old_bp")).as("drift_bp"),
        when(col("n_old") === 0, lit("new"))
          .when(col("n_new") === 0, lit("vanished"))
          .otherwise(lit("stable")).as("status"))
  }

  /** Staleness alarm threshold: a feed is flagged when its newest event
    * lags the freshest feed by more than a day. */
  private val FreshnessSlaSeconds = 86400L

  /** FEED-FRESHNESS AUDIT — the first data-ops check on every ingest
    * dashboard: per event type (standing in for "per upstream feed"),
    * the newest event time, its lag behind the freshest feed in
    * seconds, and the SLA flag. A silently-stalled producer shows up
    * as a growing lag long before any downstream metric moves; making
    * the lag hash-checked means a stall in the SYNTHETIC generator
    * (or a regression in timestamp handling anywhere in the load
    * path) fails the gate. One map-side-combinable max aggregation
    * onto the type domain plus the freshest-feed window over
    * |types| rows.
    */
  private val dqFreshness: Q = (s, d) =>
    T(s, d, "events")
      .groupBy(col("event_type"))
      .agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP))")).as("last_us"))
      .withColumn("lag_seconds",
        expr("(max(last_us) OVER () - last_us) div 1000000"))
      .select(col("event_type"), col("last_us"), col("lag_seconds"),
        when(col("lag_seconds") > FreshnessSlaSeconds, lit(1L))
          .otherwise(lit(0L)).as("stale"))

  val queries: Map[String, Q] = Map(
    "dq_freshness" -> dqFreshness,
    "profile_table" -> profileOrders,
    "profile_histogram" -> profileHistogram,
    "dq_k_anonymity" -> kAnonymity,
    "dq_schema_drift" -> dqSchemaDrift,
    "json_quarantine" -> jsonQuarantine,
    "dq_checks" -> dqChecks,
  )

  private val profileOracle: String = {
    val numParts = NumCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num,
         |  CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str,
         |  CAST(NULL AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    }
    val strParts = StrCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num,
         |  CAST(NULL AS DOUBLE) AS max_num,
         |  min($c) AS min_str,
         |  max($c) AS max_str
         |FROM orders""".stripMargin
    }
    (numParts ++ strParts).mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    "profile_histogram" ->
      s"""SELECT CAST(round(o_totalprice * 100) AS BIGINT) // $HistWidth
         |    AS bucket,
         |  count(*) AS n,
         |  min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
         |  max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
         |FROM orders GROUP BY 1""".stripMargin,
    "dq_k_anonymity" ->
      s"""SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
         |  count(*) AS n,
         |  CAST(CASE WHEN count(*) < $KAnon THEN 1 ELSE 0 END AS BIGINT)
         |    AS below_k
         |FROM customer GROUP BY 1, 2""".stripMargin,
    "dq_freshness" ->
      s"""WITH a AS (
         |  SELECT event_type, max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY 1),
         |l AS (
         |  SELECT event_type, last_us,
         |    (CAST(max(last_us) OVER () AS BIGINT) - last_us) // 1000000
         |      AS lag_seconds
         |  FROM a)
         |SELECT event_type, last_us, lag_seconds,
         |  CAST(CASE WHEN lag_seconds > $FreshnessSlaSeconds
         |    THEN 1 ELSE 0 END AS BIGINT) AS stale
         |FROM l""".stripMargin,
    "dq_schema_drift" ->
      s"""WITH ev AS (
         |  SELECT epoch_us(ts) AS tsl, event_type, value FROM events),
         |b AS (SELECT min(tsl) AS t0, max(tsl) AS t1 FROM ev),
         |tagged AS (
         |  SELECT e.*, CASE WHEN e.tsl * 2 >= b.t0 + b.t1
         |    THEN 1 ELSE 0 END AS is_new
         |  FROM ev e, b),
         |buckets AS (
         |  SELECT 'event_type' AS col_name, event_type AS bucket, is_new
         |  FROM tagged
         |  UNION ALL
         |  SELECT 'value',
         |    'bin_' ||
         |      (CAST(round(value * 100) AS BIGINT) // $DriftBinCents),
         |    is_new
         |  FROM tagged),
         |counts AS (
         |  SELECT col_name, bucket,
         |    count(*) FILTER (is_new = 0) AS n_old,
         |    count(*) FILTER (is_new = 1) AS n_new
         |  FROM buckets GROUP BY 1, 2),
         |shared AS (
         |  SELECT *,
         |    n_old * 10000 //
         |      CAST(sum(n_old) OVER (PARTITION BY col_name) AS BIGINT)
         |      AS share_old_bp,
         |    n_new * 10000 //
         |      CAST(sum(n_new) OVER (PARTITION BY col_name) AS BIGINT)
         |      AS share_new_bp
         |  FROM counts)
         |SELECT col_name, bucket, n_old, n_new,
         |  share_old_bp, share_new_bp,
         |  abs(share_new_bp - share_old_bp) AS drift_bp,
         |  CASE WHEN n_old = 0 THEN 'new'
         |       WHEN n_new = 0 THEN 'vanished'
         |       ELSE 'stable' END AS status
         |FROM shared""".stripMargin,
    "dq_checks" ->
      """SELECT 'orders_pk_unique' AS rule,
        |  (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_checked,
        |  (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |     GROUP BY 1 HAVING count(*) > 1)) AS n_violations
        |UNION ALL SELECT 'orders_fk_customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL SELECT 'lineitem_qty_range',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_quantity NOT BETWEEN 1 AND 50)
        |UNION ALL SELECT 'lineitem_ship_after_order',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE l.l_shipdate < o.o_orderdate)
        |UNION ALL SELECT 'customer_name_nonnull',
        |  (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM customer WHERE c_name IS NULL)""".stripMargin,
    "profile_table" -> profileOracle,
    "json_quarantine" ->
      """WITH feed AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0
        |    THEN substr('{"k":' || o_orderkey || ',"s":"' || o_orderstatus || '"}', 1, 9)
        |    ELSE '{"k":' || o_orderkey || ',"s":"' || o_orderstatus || '"}'
        |  END AS js FROM orders),
        |parsed AS (
        |  SELECT CASE WHEN json_valid(js)
        |    THEN CAST(js->>'$.k' AS BIGINT) END AS k
        |  FROM feed)
        |SELECT CASE WHEN k IS NOT NULL THEN 'parsed'
        |            ELSE 'quarantined' END AS bucket,
        |  count(*) AS n, sum(k) AS k_sum
        |FROM parsed GROUP BY 1""".stripMargin,
  )
}
