package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over the DuckDB oracle SQL map.
  *
  * DuckDB widens `sum(BIGINT)` (and `sum(...) FILTER (...)`) to HUGEINT;
  * a subsequent `//` division then surfaces to the gate comparator as
  * float64 while Spark emits BIGINT — a hash mismatch on numerically
  * identical values. This bit `token_budget_select`/`dsir_budget_select`
  * in round 7 and `knn_density`/`embedding_drift` in round 9. The fix is
  * always the same one-liner: wrap the division in `CAST(... AS BIGINT)`.
  * This spec makes the class unrepresentable: every `sum(...) [FILTER
  * (...)] //` occurrence in any oracle string must sit inside a
  * `CAST(... AS BIGINT)` span.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Index just past the paren that matches the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    s.length
  }

  /** All [start, end) spans of `CAST( ... AS BIGINT)` (nesting-safe). */
  private def bigintCastSpans(sql: String): Seq[(Int, Int)] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, Int)]
    var from = lower.indexOf("cast")
    while (from >= 0) {
      var p = from + 4
      while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
      if (p < sql.length && sql.charAt(p) == '(') {
        val end = matchParen(sql, p)
        if (lower.substring(p, end).replaceAll("\\s+", " ").endsWith("as bigint)"))
          out += ((from, end))
      }
      from = lower.indexOf("cast", from + 4)
    }
    out.result()
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** Word-boundary positions of `sum(` tokens (`checksum(x)` is not a
    * sum — require a non-identifier char, or start-of-string, before).
    */
  private def sumTokens(sql: String): Seq[Int] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[Int]
    var from = lower.indexOf("sum")
    while (from >= 0) {
      val boundary = from == 0 || {
        val c = sql.charAt(from - 1)
        !(Character.isLetterOrDigit(c) || c == '_')
      }
      val p = skipWs(sql, from + 3)
      if (boundary && p < sql.length && sql.charAt(p) == '(') out += from
      from = lower.indexOf("sum", from + 3)
    }
    out.result()
  }

  /** Positions where a HUGEINT-typed expression meets the DuckDB integer
    * division operator uncast. Two passes:
    *   1. direct — `sum(...)` (plus optional FILTER clause) immediately
    *      followed by `//`;
    *   2. parenthesized — `( ... ) //` where the parenthesized expression
    *      contains a `sum(` token (e.g. `(sum(a) - sum(b)) // n`: the
    *      difference of HUGEINTs is still HUGEINT, and the `//` does not
    *      directly follow a sum's closing paren — the r12 pinned false
    *      negative, now detected).
    * A division whose span sits inside a `CAST(... AS BIGINT)` is safe.
    */
  private def unsafeDivisions(sql: String): Seq[Int] = {
    val lower = sql.toLowerCase
    val casts = bigintCastSpans(sql)
    val sums = sumTokens(sql)
    def castedOver(from: Int, q: Int): Boolean =
      casts.exists { case (a, b) => from > a && q < b }
    val out = Seq.newBuilder[(Int, Int)] // (reported position, div position)
    // pass 1: sum(...) [FILTER (...)] //
    sums.foreach { from =>
      val p = skipWs(sql, from + 3)
      var q = skipWs(sql, matchParen(sql, p))
      if (lower.startsWith("filter", q)) {
        val fp = skipWs(sql, q + 6)
        if (fp < sql.length && sql.charAt(fp) == '(') q = skipWs(sql, matchParen(sql, fp))
      }
      if (sql.startsWith("//", q) && !castedOver(from, q)) out += ((from, q))
    }
    // pass 2: ( ...sum(... ) //  — any paren group containing a sum token
    var open = sql.indexOf('(')
    while (open >= 0) {
      val end = matchParen(sql, open)
      val q = skipWs(sql, end)
      if (sql.startsWith("//", q) &&
          sums.exists(s => s > open && s < end) &&
          !castedOver(open, q))
        out += ((open, q))
      open = sql.indexOf('(', open + 1)
    }
    // a direct hit inside a flagged paren group reports once (the paren)
    out.result().map(_._1).distinct.sorted
  }

  test("every oracle `sum(...) //` division is wrapped in CAST(... AS BIGINT)") {
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      pos <- unsafeDivisions(sql)
    } yield s"$name @ char $pos: ...${sql.slice(math.max(0, pos - 20), math.min(sql.length, pos + 60)).replaceAll("\\s+", " ")}..."
    assert(bad.isEmpty,
      s"un-cast HUGEINT division(s) in oracle SQL (DuckDB sum(BIGINT)->HUGEINT " +
        s"surfaces // results as float64 to the gate comparator):\n${bad.mkString("\n")}")
  }

  test("lint self-check: the scanner catches the round-9 failure shapes") {
    // exactly the two shapes that shipped red in r09 — must be flagged
    assert(unsafeDivisions("SELECT sum(x) // count(*) AS m FROM t").nonEmpty)
    assert(unsafeDivisions(
      "SELECT sum(q) FILTER (is_ref) // count(*) FILTER (is_ref) AS m FROM t").nonEmpty)
    // and the fixed forms must pass
    assert(unsafeDivisions("SELECT CAST(sum(x) // count(*) AS BIGINT) AS m FROM t").isEmpty)
    assert(unsafeDivisions(
      """SELECT CAST(sum(q) FILTER (NOT r) // count(*) FILTER (NOT r)
           - sum(q) FILTER (r) // count(*) FILTER (r) AS BIGINT) AS d FROM t""").isEmpty)
    // non-sum integer division (BIGINT // BIGINT stays BIGINT) is fine
    assert(unsafeDivisions("SELECT epoch_us(ts)//5000000 AS w FROM t").isEmpty)
    // word boundary: an identifier merely ENDING in "sum" is not sum()
    assert(unsafeDivisions("SELECT checksum(x) // 4 AS m FROM t").isEmpty)
    assert(unsafeDivisions("SELECT my_sum(x) // 4 AS m FROM t").isEmpty)
    // the r12 pinned FALSE NEGATIVE, now a positive detection (r12 verdict
    // directive 7): a PARENTHESIZED sum expression whose `//` follows the
    // outer paren is still a HUGEINT division in DuckDB — the paren-
    // matching pass catches it
    assert(unsafeDivisions("SELECT (sum(a) - sum(b)) // n AS m FROM t").nonEmpty,
      "paren-matching pass must flag `(sum(a) - sum(b)) // n`")
    assert(unsafeDivisions("SELECT (2 * sum(a)) // n AS m FROM t").nonEmpty)
    // ...and the CAST-wrapped parenthesized form stays safe
    assert(unsafeDivisions(
      "SELECT CAST((sum(a) - sum(b)) // n AS BIGINT) AS m FROM t").isEmpty)
    // a paren group WITHOUT a sum followed by `//` is plain BIGINT division
    assert(unsafeDivisions("SELECT (a - b) // n AS m FROM t").isEmpty)
    // checksum inside a paren group is not a sum token
    assert(unsafeDivisions("SELECT (checksum(x) - 1) // 4 AS m FROM t").isEmpty)
  }
}
