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
    * hazard). One aggregation pass per column over a single cached
    * scan; at 100 TB the same shape runs all columns in ONE pass via
    * a single multi-aggregate projection, and the exact distinct
    * count downgrades to HLL (`approx_count_distinct`, oracle-checked
    * separately in `approx_distinct`) — exactness here is what makes
    * the row hash-checkable.
    */
  private val profileOrders: Q = (s, d) => {
    val o = T(s, d, "orders")
    val parts = NumCols.map { c =>
      o.agg(
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_num"),
        max(col(c)).cast("double").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
        .select(lit(c).as("col_name"), col("*"))
    } ++ StrCols.map { c =>
      o.agg(
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        min(col(c)).as("min_str"),
        max(col(c)).as("max_str"))
        .select(lit(c).as("col_name"), col("*"))
    }
    parts.reduce(_ union _)
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

  val queries: Map[String, Q] = Map(
    "profile_table" -> profileOrders,
    "json_quarantine" -> jsonQuarantine,
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
