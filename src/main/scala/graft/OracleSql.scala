package graft

import scala.util.matching.Regex

/** Post-processor for the DuckDB oracle SQL the driver replays.
  *
  * DuckDB inlines every CTE referenced from a recursive CTE's step (and
  * any CTE referenced more than once) unless it is declared
  * `AS MATERIALIZED`. Several oracles here pair an expensive derivation
  * (an ANN kNN graph, a BM25 + cosine fusion) with a sequential recursion
  * or an unrolled greedy loop over it; inlining re-evaluates the whole
  * derivation once per step — measured 285 s for the Kruskal oracle and
  * 47 s for the MMR oracle at sf0.01, vs 1.2 s / 0.2 s materialized, with
  * bit-identical results. The full 257-oracle gate replay dropped from
  * ~8.7 min to ~2 min, which is what keeps the driver's correctness
  * compare inside its budget.
  *
  * The rewrite marks every CTE `AS MATERIALIZED` EXCEPT self-referencing
  * (recursive) members, which DuckDB rejects as materialized. Detection is
  * conservative: a CTE whose body mentions its own name anywhere (even as
  * a column alias) is left untouched — a false positive only skips an
  * optimization, never changes semantics. Results are hash-identical by
  * construction (materialization is an evaluation strategy, not a
  * semantic change) and re-proven by the full verify gate.
  *
  * All scanning (head matching, paren matching, self-reference search)
  * runs over a MASKED copy of the SQL in which the contents of
  * single-quoted string literals are blanked out (same length, so match
  * offsets line up with the original): a `')'` or `' AS ('` inside a
  * literal must neither close a body scan nor spawn a phantom CTE head,
  * and the rewrite must never splice text inside a literal. The head
  * keyword matches case-insensitively (`as (` is a legal CTE head).
  */
object OracleSql {

  /** `name` or `name(col, ...)` followed by `AS (` — a CTE definition
    * head. `AS (` cannot appear in a CAST (a type name follows AS there)
    * and column aliases are never followed by `(`. The one non-CTE
    * construct sharing the shape is a named-WINDOW definition
    * (`WINDOW w AS (PARTITION BY …)`) — disambiguated by the body's
    * first keyword (a CTE body is a query; a window body never is).
    */
  private val CteHead: Regex =
    """(\w+)\s*(\([\w,\s]*\))?\s+(?i:AS)\s+\(""".r

  /** Blank out the interior of every single-quoted string literal
    * (SQL-standard `''` escape stays inside its literal). Length is
    * preserved, so offsets into the mask index the original text.
    */
  private def maskLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var inLit = false
    while (i < out.length) {
      val c = out(i)
      if (!inLit) {
        if (c == '\'') inLit = true
      } else {
        if (c == '\'') {
          // '' is an escaped quote: stay in the literal, blank both
          if (i + 1 < out.length && out(i + 1) == '\'') {
            out(i) = '_'; out(i + 1) = '_'; i += 1
          } else inLit = false
        } else out(i) = '_'
      }
      i += 1
    }
    new String(out)
  }

  /** A CTE body starts with a query keyword; a named-window body starts
    * with PARTITION/ORDER/ROWS/RANGE (or another window's name).
    */
  private def bodyIsQuery(masked: String, bodyStart: Int): Boolean = {
    val firstWord = """\w+""".r
      .findFirstIn(masked.substring(bodyStart,
        math.min(masked.length, bodyStart + 32)))
      .getOrElse("").toUpperCase
    Set("SELECT", "VALUES", "WITH", "FROM", "TABLE").contains(firstWord)
  }

  /** Names of CTEs whose own body references their name (recursive
    * members, plus alias false-positives — both must stay unmarked).
    * Operates entirely on the masked text: a quoted `')'` cannot close
    * the body scan and a name inside a literal is not a reference.
    */
  private def selfReferencingNames(masked: String): Set[String] = {
    CteHead.findAllMatchIn(masked).flatMap { m =>
      val name = m.group(1)
      // paren-match the body starting just inside the opening '('
      var depth = 1
      var i = m.end
      while (depth > 0 && i < masked.length) {
        val c = masked.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        i += 1
      }
      val body = masked.substring(m.end, math.max(m.end, i - 1))
      if (("""(?i)\b""" + Regex.quote(name) + """\b""").r
            .findFirstIn(body).isDefined) Some(name)
      else None
    }.toSet
  }

  /** Rewrite every non-self-referencing CTE head to `AS MATERIALIZED (`.
    * Idempotent: already-materialized heads don't match `AS (`.
    */
  def materializeCtes(sql: String): String = {
    if (!sql.toUpperCase.contains("WITH")) return sql
    val masked = maskLiterals(sql)
    val rec = selfReferencingNames(masked)
    // a name defined by more than one CTE (nested WITH scopes re-using a
    // local name like `w`) must stay unmarked: DuckDB binds plain CTEs
    // per scope but rejects duplicate MATERIALIZED names outright
    val defined = CteHead.findAllMatchIn(masked)
      .filter(m => bodyIsQuery(masked, m.end)).map(_.group(1)).toSeq
    val dup = defined.groupBy(identity).collect {
      case (n, xs) if xs.size > 1 => n
    }.toSet
    // match on the mask, splice into the ORIGINAL by offset — the two
    // are the same length, and head text never overlaps a literal (the
    // name/cols groups are \w/[\w,\s] which a blanked literal cannot
    // satisfy across its quotes)
    val sb = new StringBuilder
    var last = 0
    CteHead.findAllMatchIn(masked).foreach { m =>
      val name = m.group(1)
      if (!rec.contains(name) && !dup.contains(name) &&
          bodyIsQuery(masked, m.end)) {
        val cols = Option(m.group(2))
          .map(_ => sql.substring(m.start(2), m.end(2))).getOrElse("")
        sb.append(sql.substring(last, m.start))
        sb.append(s"$name$cols AS MATERIALIZED (")
        last = m.end
      }
    }
    sb.append(sql.substring(last))
    sb.toString
  }
}
