package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over every oracle SQL string in SparkEntry.oracleSql: a bare
  * integer `sum(...)` as a TOP-LEVEL item of the FINAL select is forbidden.
  *
  * Why: DuckDB types `sum(BIGINT)` as HUGEINT while Spark emits LONG; the
  * driver's value-hash is type-aware, so the values match but the hash
  * does not. Round 11 shipped exactly this in q132/q133/q136 (the round's
  * only red rows) and the old pandas-normalizing local gate could not see
  * it. The authoritative guard is now tools/oracle_check.py's DESCRIBE-
  * based declared-type comparison; this spec is the in-build lint that
  * rejects the known syntactic class before the python gate ever runs:
  * any final-select `sum( ... ) AS alias` not wrapped in CAST(…)/round(…).
  *
  * Bare sums INSIDE arithmetic (e.g. `round(x / sum(n), 6)`) are fine —
  * the surrounding expression fixes the result type — so the lint only
  * fires when the sum's own closing paren is followed by `AS`, i.e. the
  * sum IS the select item.
  */
class OracleLintSpec extends AnyFunSuite {

  /** The final top-level SELECT list of a (possibly WITH-prefixed) query:
    * text from the last depth-0 SELECT to its depth-0 FROM.
    */
  private def finalSelect(sql: String): String = {
    val lower = sql.toLowerCase
    var depth = 0
    var lastSel = -1
    var i = 0
    while (i < lower.length) {
      lower.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 's' if depth == 0 && lower.startsWith("select", i) &&
          (i == 0 || !lower.charAt(i - 1).isLetter) &&
          (i + 6 >= lower.length || !lower.charAt(i + 6).isLetter) =>
          lastSel = i
        case _ =>
      }
      i += 1
    }
    if (lastSel < 0) return sql
    val seg = lower.substring(lastSel)
    depth = 0
    i = 0
    while (i < seg.length) {
      seg.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'f' if depth == 0 && seg.startsWith("from", i) &&
          !seg.charAt(i - 1).isLetter &&
          (i + 4 >= seg.length || !seg.charAt(i + 4).isLetter) =>
          return sql.substring(lastSel, lastSel + i)
        case _ =>
      }
      i += 1
    }
    sql.substring(lastSel)
  }

  /** Offsets of `sum(` occurrences in s whose matching `)` is followed
    * (after whitespace) by the keyword AS, and that are not directly
    * wrapped in CAST( / round(.
    */
  private def bareTopLevelSums(s: String): Seq[String] = {
    val lower = s.toLowerCase
    val hits = Seq.newBuilder[String]
    var i = lower.indexOf("sum(")
    while (i >= 0) {
      val wordStart = i == 0 || !lower.charAt(i - 1).isLetterOrDigit
      val pre = lower.substring(0, i).reverse.dropWhile(_.isWhitespace)
      val wrapped = pre.startsWith("(tsac") || pre.startsWith("(dnuor")
      if (wordStart && !wrapped) {
        // find the matching close paren of sum(
        var depth = 1
        var j = i + 4
        while (j < lower.length && depth > 0) {
          val c = lower.charAt(j)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          j += 1
        }
        val rest = lower.substring(j).dropWhile(_.isWhitespace)
        if (rest.startsWith("as") &&
          (rest.length == 2 || !rest.charAt(2).isLetterOrDigit))
          hits += s.substring(i, math.min(s.length, j + 20)).replace('\n', ' ')
      }
      i = lower.indexOf("sum(", i + 1)
    }
    hits.result()
  }

  test("no oracle's final select carries a bare top-level sum (HUGEINT trap)") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        bareTopLevelSums(finalSelect(sql)).map(h => s"$name: $h")
    }
    assert(offenders.isEmpty,
      "bare final-select sum() — DuckDB will type it HUGEINT, Spark LONG; " +
        "wrap in CAST(... AS BIGINT) (or round(...) for doubles):\n" +
        offenders.mkString("\n"))
  }

  test("the lint catches the round-11 q136 regression verbatim") {
    val preFix =
      """WITH d AS (SELECT source, CAST(len(x) AS BIGINT) AS nt FROM documents)
         SELECT shard, count(*) AS n_docs, sum(nt) AS n_tokens,
           count(DISTINCT source) AS n_sources
         FROM r GROUP BY shard ORDER BY shard"""
    assert(bareTopLevelSums(finalSelect(preFix)).nonEmpty,
      "the pre-fix q136 oracle must trip the lint")
    val postFix = preFix.replace("sum(nt) AS n_tokens",
      "CAST(sum(nt) AS BIGINT) AS n_tokens")
    assert(bareTopLevelSums(finalSelect(postFix)).isEmpty,
      "the cast form must pass")
  }
}
