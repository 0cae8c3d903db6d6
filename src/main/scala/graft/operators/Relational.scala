package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{load => T}

/** The generic relational query surface (SURVEY.md §2.2): the reference's
  * CRUD/query semantics generalized to a full analytical API — joins,
  * windows, rollups, set ops, scalar/date/JSON functions — expressed purely
  * with Spark built-ins so Catalyst supplies pushdown, pruning, join
  * strategy selection, whole-stage codegen and AQE.
  *
  * Scale posture per query is noted inline; the general rules:
  *  - dimension tables (region, nation) are `broadcast()` — replicated hash
  *    joins, no shuffle of the fact side;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and
  *    AQE re-plans skew at runtime;
  *  - all aggregates are partial (map-side combine) before the shuffle.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style scan-heavy aggregate: one scan, partial agg, tiny
    * shuffle (|groups| = 6). The shape that must not regress at 100 TB.
    */
  private val q1: Q = (s, d) =>
    T(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: dim filter → fact join → agg → top-k. customer is
    * broadcast (small side); orders ⋈ lineitem shuffles on orderkey.
    */
  private val q3: Q = (s, d) => {
    val c = T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = T(s, d, "orders")
    val l = T(s, d, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style multi-join: snowflake dims broadcast down onto the fact
    * scan; one shuffle for the final group-by on nation.
    */
  private val q5: Q = (s, d) => {
    val r = T(s, d, "region").filter(col("r_name") === "ASIA")
    val n = T(s, d, "nation")
    val c = T(s, d, "customer")
    val o = T(s, d, "orders")
    val l = T(s, d, "lineitem")
    val sup = T(s, d, "supplier")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** Left-semi join: EXISTS — customers with at least one order. */
  private val joinSemi: Q = (s, d) =>
    T(s, d, "customer")
      .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Left outer join + null-ignoring aggregate: order count per customer
    * including zeros.
    */
  private val joinLeftOuter: Q = (s, d) =>
    T(s, d, "customer")
      .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"),
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))

  /** Full outer join on per-nation presence: which side(s) populate each
    * nation key — exercises null production on both sides.
    */
  private val joinFullOuter: Q = (s, d) => {
    val c = T(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = T(s, d, "supplier").groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("nk") === col("snk"), "full_outer")
      .select(coalesce(col("nk"), col("snk")).as("nationkey"),
        col("n_cust"), col("n_supp"))
  }

  /** lead/lag/first window sampler over each user's event sequence. */
  private val windowLeadLag: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    T(s, d, "events").select(
      col("event_id"), col("user_id"),
      lag(col("event_type"), 1).over(w).as("prev_type"),
      lead(col("event_type"), 1).over(w).as("next_type"),
      first(col("event_type")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("first_type"))
  }

  /** Whole-partition frame window functions: first_value / last_value /
    * nth_value over the full per-user session — the "compare every
    * event to the session's endpoints" shape (`window_lead_lag` covers
    * the running-prefix frame; this is the UNBOUNDED FOLLOWING face,
    * which Spark executes with the same single per-partition sort).
    */
  private val windowFirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    T(s, d, "events").select(
      col("event_id"), col("user_id"),
      first(col("event_type")).over(full).as("first_type"),
      last(col("event_type")).over(full).as("last_type"),
      nth_value(col("event_type"), 2).over(full).as("second_type"))
  }

  /** Left-anti join: NOT EXISTS — customers with no orders. */
  private val joinAnti: Q = (s, d) =>
    T(s, d, "customer")
      .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Global top-k: TakeOrderedAndProject — no full sort at scale. */
  private val sortTopk: Q = (s, d) =>
    T(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** Per-group top-k via row_number window: one shuffle on the group key. */
  private val windowRank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T(s, d, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"))
  }

  /** Relative-rank windows — `percent_rank` ((rank−1)/(n−1)) and
    * `cume_dist` (rows ≤ current / n): both single integer divisions of
    * window-local counts, so the doubles are bit-identical on any
    * IEEE engine (no accumulation), and nonnegative (no signed-zero
    * hazard). Partitioned by order status — the per-group relative
    * standing report percentile dashboards read.
    */
  private val windowRankStats: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    T(s, d, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** Running (prefix) sum per key — sequential within partition, so the
    * floating-point fold order is deterministic and engine-independent.
    */
  private val windowRunning: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T(s, d, "events")
      .select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 2).as("running_value"))
  }

  /** ROLLUP over the region → nation hierarchy. */
  private val rollupAgg: Q = (s, d) =>
    T(s, d, "customer")
      .join(broadcast(T(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        (round(sum(col("c_acctbal")), 2) + lit(0.0)).as("acctbal"))

  /** Set op: EXCEPT (distinct) — nations with customers but no suppliers. */
  private val setopExcept: Q = (s, d) =>
    T(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .except(T(s, d, "supplier").select(col("s_nationkey").as("nationkey")))

  /** Set op: INTERSECT — nations with both customers and suppliers. */
  private val setopIntersect: Q = (s, d) =>
    T(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(T(s, d, "supplier").select(col("s_nationkey").as("nationkey")))

  /** CUBE: all 2^k grouping-key combinations in one pass. The average
    * balance is exact-integer cents end to end (acctbal is a 2-decimal
    * value, so `round(bal·100)` recovers its integer cents exactly):
    * a float `avg` was order-nondeterministic under parallel sum and
    * occasionally landed `round(·, 2)` on a half-way point where the
    * engines disagree (observed at sf0.001). Half-up on the exact
    * rational `(2·|Σ| + n) div (2n)`, sign-split so truncating `div` ≡
    * flooring `//` on nonnegative operands; the final ÷100.0 is one
    * IEEE division of exact integers — bit-identical cross-engine.
    */
  private val cubeAgg: Q = (s, d) =>
    T(s, d, "customer")
      .join(broadcast(T(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("sc"))
      .select(col("n_name"), col("c_mktsegment"), col("n"),
        (expr("""CASE WHEN sc >= 0 THEN (2 * sc + n) div (2 * n)
                |ELSE -((2 * (-sc) + n) div (2 * n)) END""".stripMargin)
          / lit(100.0)).as("avg_bal"))

  /** Set op: EXCEPT ALL — bag semantics, multiplicities preserved
    * (customer nation keys minus one occurrence per supplier key).
    */
  private val setopExceptAll: Q = (s, d) =>
    T(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(T(s, d, "supplier").select(col("s_nationkey").as("nationkey")))

  /** UNPIVOT (wide → long): per-customer balance and key as (metric,
    * value) rows via `stack` — the melt every feature store needs.
    */
  private val unpivotOp: Q = (s, d) =>
    T(s, d, "customer").select(col("c_custkey"),
      expr("stack(2, 'acctbal', round(c_acctbal, 2) + 0.0, " +
        "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"))

  /** Fuzzy string matching via edit distance: customer/supplier name
    * pairs within the same nation at levenshtein <= 6 — the
    * entity-resolution primitive, blocked on the nation key so the
    * candidate product is bounded per block (the standard blocking
    * pattern; never a full cross join). The bounded `levenshtein(l, r,
    * k)` form abandons each DP as soon as the distance must exceed k
    * (returns -1), so non-matches — the vast majority — cost O(k·len)
    * instead of O(len²); a threshold below the string length is what
    * makes the band actually narrower than the full matrix.
    */
  private val stringDistance: Q = (s, d) =>
    T(s, d, "customer")
      .select(col("c_nationkey").as("nationkey"), col("c_name"))
      .join(T(s, d, "supplier")
        .select(col("s_nationkey").as("nationkey"), col("s_name")),
        Seq("nationkey"))
      .withColumn("dist",
        levenshtein(col("c_name"), col("s_name"), 6).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("nationkey"), col("c_name"), col("s_name"), col("dist"))

  /** DISTINCT (exact dedup on a projection). */
  private val distinctSegments: Q = (s, d) =>
    T(s, d, "customer").select(col("c_mktsegment")).distinct()

  /** Scalar string/math/conditional function sampler — all codegen'd
    * built-ins, no UDFs.
    */
  private val scalarFuncs: Q = (s, d) =>
    T(s, d, "customer").select(
      col("c_custkey"),
      upper(col("c_name")).as("uname"),
      length(col("c_name")).cast("long").as("name_len"),
      substring(col("c_name"), 1, 8).as("prefix"),
      round(abs(col("c_acctbal")), 1).as("mag"),
      when(col("c_acctbal") < 0, "neg").otherwise("pos").as("sign"))

  /** JSON field extraction from the events `props` payload. */
  private val jsonExtract: Q = (s, d) =>
    T(s, d, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** GROUP BY + HAVING. */
  private val havingAgg: Q = (s, d) =>
    T(s, d, "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .filter(col("n") > 5)

  /** CASE WHEN bucketing + aggregate. */
  private val caseBucket: Q = (s, d) =>
    T(s, d, "orders")
      .select(when(col("o_totalprice") < 1000, "low")
        .when(col("o_totalprice") < 10000, "mid")
        .otherwise("high").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Aggregate function breadth: min/max/avg/stddev/count-distinct. */
  private val aggStats: Q = (s, d) =>
    T(s, d, "lineitem").groupBy(col("l_returnflag"))
      .agg(
        round(min(col("l_quantity")), 2).as("min_qty"),
        round(max(col("l_quantity")), 2).as("max_qty"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        countDistinct(col("l_partkey")).as("n_parts"))

  /** Date/time function breadth: calendar grouping. */
  private val dateFuncs: Q = (s, d) =>
    T(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1,
    "q3_topk_revenue" -> q3,
    "q5_nation_revenue" -> q5,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_left_outer" -> joinLeftOuter,
    "join_full_outer" -> joinFullOuter,
    "window_lead_lag" -> windowLeadLag,
    "window_firstlast" -> windowFirstLast,
    "sort_topk" -> sortTopk,
    "window_rank" -> windowRank,
    "window_rank_stats" -> windowRankStats,
    "window_running" -> windowRunning,
    "rollup_agg" -> rollupAgg,
    "cube_agg" -> cubeAgg,
    "setop_except" -> setopExcept,
    "setop_except_all" -> setopExceptAll,
    "unpivot_op" -> unpivotOp,
    "string_distance" -> stringDistance,
    "setop_intersect" -> setopIntersect,
    "distinct_segments" -> distinctSegments,
    "scalar_funcs" -> scalarFuncs,
    "json_extract" -> jsonExtract,
    "having_agg" -> havingAgg,
    "case_bucket" -> caseBucket,
    "agg_stats" -> aggStats,
    "date_funcs" -> dateFuncs,
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_revenue" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(nk, snk) AS nationkey, n_cust, n_supp FROM
        |  (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        |  FULL OUTER JOIN
        |  (SELECT s_nationkey AS snk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON nk = snk""".stripMargin,
    "window_lead_lag" ->
      """SELECT event_id, user_id,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
        |  first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
        |FROM events""".stripMargin,
    "window_firstlast" ->
      """SELECT event_id, user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "sort_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "window_rank_stats" ->
      """SELECT o_orderstatus, o_orderkey,
        |  percent_rank() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS cume
        |FROM orders""".stripMargin,
    "window_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin,
    "rollup_agg" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) + 0.0 AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "cube_agg" ->
      """SELECT n_name, c_mktsegment, n,
        |  (CASE WHEN sc >= 0 THEN (2 * sc + n) // (2 * n)
        |   ELSE -((2 * (-sc) + n) // (2 * n)) END) / 100.0 AS avg_bal
        |FROM (
        |  SELECT n_name, c_mktsegment, count(*) AS n,
        |    sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sc
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY CUBE (n_name, c_mktsegment))""".stripMargin,
    "setop_except" ->
      "SELECT DISTINCT c_nationkey AS nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier",
    "setop_except_all" ->
      "SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier",
    "unpivot_op" ->
      """SELECT c_custkey, metric, value FROM (
        |  SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) + 0.0 AS value FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer)""".stripMargin,
    "string_distance" ->
      """SELECT c.c_nationkey AS nationkey, c_name, s_name,
        |  CAST(levenshtein(c_name, s_name) AS BIGINT) AS dist
        |FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
        |WHERE levenshtein(c_name, s_name) <= 6""".stripMargin,
    "setop_intersect" ->
      "SELECT DISTINCT c_nationkey AS nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier",
    "distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer",
    "scalar_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
        |  substr(c_name, 1, 8) AS prefix, round(abs(c_acctbal), 1) AS mag,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sign
        |FROM customer""".stripMargin,
    "json_extract" ->
      "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events",
    "having_agg" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY user_id HAVING count(*) > 5""".stripMargin,
    "case_bucket" ->
      """SELECT bucket, count(*) AS n FROM (
        |  SELECT CASE WHEN o_totalprice < 1000 THEN 'low'
        |              WHEN o_totalprice < 10000 THEN 'mid'
        |              ELSE 'high' END AS bucket FROM orders)
        |GROUP BY bucket""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(min(l_quantity), 2) AS min_qty,
        |  round(max(l_quantity), 2) AS max_qty,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "date_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY year(o_orderdate), month(o_orderdate)""".stripMargin,
  )
}
