package graft

import org.scalatest.funsuite.AnyFunSuite

class OracleSqlSpec extends AnyFunSuite {

  test("plain CTEs get MATERIALIZED") {
    val in  = "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) SELECT * FROM b"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("a AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out.contains("b AS MATERIALIZED (SELECT x FROM a)"))
  }

  test("recursive members stay unmarked, non-recursive siblings don't") {
    val in =
      """WITH RECURSIVE ed AS (SELECT 1 AS u),
        |rec AS (SELECT u FROM ed UNION ALL SELECT u + 1 FROM rec WHERE u < 3)
        |SELECT * FROM rec""".stripMargin
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("ed AS MATERIALIZED (SELECT 1 AS u)"))
    assert(out.contains("rec AS (SELECT u FROM ed"))
    assert(!out.contains("rec AS MATERIALIZED"))
  }

  test("self-name-as-alias false positive is skipped, never broken") {
    // tf's body aliases a column `AS tf` — conservative detection must
    // leave it alone (skipping the optimization is safe; marking a true
    // recursive member would be a DuckDB error).
    val in = "WITH tf AS (SELECT count(*) AS tf FROM t) SELECT * FROM tf"
    val out = OracleSql.materializeCtes(in)
    assert(out == in)
  }

  test("column-list CTE heads are rewritten in place") {
    val in  = "WITH s0(q_id, doc_id) AS (SELECT 1, 2) SELECT * FROM s0"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("s0(q_id, doc_id) AS MATERIALIZED (SELECT 1, 2)"))
  }

  test("named-WINDOW definitions are never touched") {
    val in =
      """WITH hourly AS (SELECT h, n FROM t)
        |SELECT n, sum(n) OVER w FROM hourly
        |WINDOW w AS (PARTITION BY h ORDER BY n ROWS 3 PRECEDING)""".stripMargin
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("hourly AS MATERIALIZED (SELECT"))
    assert(out.contains("WINDOW w AS (PARTITION BY"))
    // a CTE named like a window alias still materializes (body is a query)
    val in2 = "WITH w AS (SELECT 1 AS x) SELECT x, count(*) OVER v FROM w " +
      "WINDOW v AS (ORDER BY x)"
    val out2 = OracleSql.materializeCtes(in2)
    assert(out2.contains("w AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out2.contains("WINDOW v AS (ORDER BY x)"))
  }

  test("duplicate CTE names across nested WITH scopes stay unmarked") {
    // DuckDB binds a per-scope plain CTE fine but rejects duplicate
    // MATERIALIZED names — the dedup_band_sweep shape
    val in = "WITH w AS (SELECT 1 AS x), " +
      "b AS (SELECT * FROM (WITH w AS (SELECT 2 AS y) SELECT y FROM w)) " +
      "SELECT * FROM b"
    val out = OracleSql.materializeCtes(in)
    assert(!out.contains("w AS MATERIALIZED"))
    assert(out.contains("b AS MATERIALIZED"))
  }

  test("quoted parens and quoted CTE-head shapes inside literals are inert") {
    // a ')' inside a literal must not close the body scan early, and an
    // 'x AS (' inside a literal must not spawn a phantom CTE head
    val in = "WITH a AS (SELECT ') b AS (' AS s, 1 AS x) SELECT * FROM a"
    val out = OracleSql.materializeCtes(in)
    assert(out ==
      "WITH a AS MATERIALIZED (SELECT ') b AS (' AS s, 1 AS x) " +
        "SELECT * FROM a")
    // an escaped quote ('') stays inside its literal
    val in2 = "WITH a AS (SELECT 'it''s ) AS (' AS s) SELECT * FROM a"
    val out2 = OracleSql.materializeCtes(in2)
    assert(out2 ==
      "WITH a AS MATERIALIZED (SELECT 'it''s ) AS (' AS s) SELECT * FROM a")
    // a self-reference that only occurs inside a literal is not recursive
    val in3 = "WITH a AS (SELECT 'a' AS s) SELECT * FROM a"
    assert(OracleSql.materializeCtes(in3).contains("a AS MATERIALIZED ("))
  }

  test("lowercase 'as (' heads still materialize") {
    val in  = "with a as (select 1 as x) select * from a"
    val out = OracleSql.materializeCtes(in)
    assert(out == "with a AS MATERIALIZED (select 1 as x) select * from a")
    // and the result is a fixed point
    assert(OracleSql.materializeCtes(out) == out)
  }

  test("idempotent and identity on non-WITH SQL") {
    val plain = "SELECT l_returnflag FROM lineitem"
    assert(OracleSql.materializeCtes(plain) == plain)
    val in  = "WITH a AS (SELECT 1 AS x) SELECT * FROM a"
    val once = OracleSql.materializeCtes(in)
    assert(OracleSql.materializeCtes(once) == once)
  }

  test("every emitted oracle keeps balanced parens and no recursive member marked") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val bal = sql.foldLeft(0) {
        case (d, '(') => d + 1
        case (d, ')') => d - 1
        case (d, _)   => d
      }
      assert(bal == 0, s"unbalanced parens in oracle for $name")
      // a recursive step that got materialized would contain
      // "X AS MATERIALIZED (" with X referenced inside its own body;
      // re-running the detector on the output must find nothing marked.
      val out = OracleSql.materializeCtes(sql)
      assert(out == sql, s"oracle for $name not a fixed point of the rewrite")
    }
  }
}
