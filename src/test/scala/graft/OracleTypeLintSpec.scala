package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural lint over the oracle SQL strings: DuckDB types an integer
 * `sum()` as HUGEINT while Spark emits BIGINT, and the driver's value
 * hash is TYPE-sensitive — an uncast integer sum reaching an oracle's
 * final projection fails hash_match even when every value is identical
 * (exactly the r9 `q_calibration` / `q_collocations` failures: both
 * defined a raw `sum(...) AS alias` in a CTE and emitted the alias bare
 * in the final SELECT).
 *
 * The analyzer taints every alias defined by a raw (not CAST-wrapped)
 * `sum(...)`, propagates taint through bare `alias AS other` renames,
 * and rejects any depth-0 (final / set-op branch) projection item that
 * is a raw sum or a bare tainted alias. Quoted string literals are
 * masked before any structural scan so parens inside regex/format
 * literals can't skew depth counting.
 */
object OracleSumLint {

  /** SQL type keywords that `x AS <type>` inside CAST must not taint. */
  private val TypeWords = Set(
    "bigint", "double", "int", "integer", "varchar", "boolean", "date",
    "timestamp", "decimal", "float", "real", "smallint", "tinyint",
    "hugeint", "ubigint", "text", "blob", "interval")

  /** Blank out single-quoted literal contents (structure-preserving). */
  def maskQuotes(sql: String): String = {
    val sb = new StringBuilder(sql)
    var i = 0
    var in = false
    while (i < sb.length) {
      if (sb(i) == '\'') in = !in
      else if (in) sb.setCharAt(i, ' ')
      i += 1
    }
    sb.toString
  }

  /** Index of the ')' matching the '(' at `open`, or -1. */
  private def matchParen(s: String, open: Int): Int = {
    var d = 0
    var i = open
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '(') d += 1
      else if (ch == ')') { d -= 1; if (d == 0) return i }
      i += 1
    }
    -1
  }

  /** The testdata columns parquet types as DOUBLE: `sum(double)` is
    * DOUBLE in both DuckDB and Spark — no HUGEINT, no mismatch. */
  private val DoubleColumns = Set(
    "c_acctbal", "l_discount", "l_extendedprice", "l_quantity", "l_tax",
    "o_totalprice", "p_retailprice", "s_acctbal", "value")

  /** Start offsets of raw `sum(` sites: not directly wrapped in a
    * type-converting call (CAST and round are the recognized safe
    * wrappers) and not summing a known-DOUBLE input (a double column
    * reference, a float literal, or an `AS DOUBLE` cast inside the
    * argument). */
  private def rawSumSites(masked: String): Seq[Int] = {
    val lower = masked.toLowerCase
    "\\bsum\\s*\\(".r.findAllMatchIn(lower).map(_.start).filter { pos =>
      val prefix = lower.substring(math.max(0, pos - 40), pos)
      val wrapped = prefix.matches("(?s).*\\b(cast|round)\\s*\\(\\s*")
      val open = lower.indexOf('(', pos)
      val close = matchParen(lower, open)
      val arg = if (close > open) lower.substring(open + 1, close) else ""
      val doubleArg =
        "\\b\\w+\\b".r.findAllIn(arg).exists(DoubleColumns) ||
          arg.contains("as double") || arg.matches("(?s).*\\d\\.\\d.*")
      !wrapped && !doubleArg
    }.toSeq
  }

  /** Aliases whose defining expression is a raw integer-sum (HUGEINT in
    * DuckDB), plus bare-rename propagation. */
  def taintedAliases(masked: String): Set[String] = {
    val tainted = scala.collection.mutable.Set[String]()
    val asRe = "(?is)^\\s*as\\s+(\\w+)".r
    val skipRe = "(?is)^\\s*(filter|over)\\s*\\(".r
    for (pos <- rawSumSites(masked)) {
      val open = masked.indexOf('(', pos)
      var end = matchParen(masked, open)
      var go = end >= 0
      while (go) {
        // skip optional FILTER (...) / OVER (...) clauses
        val rest = masked.substring(end + 1)
        skipRe.findFirstMatchIn(rest) match {
          case Some(m) =>
            val o2 = end + 1 + m.end - 1
            val e2 = matchParen(masked, o2)
            if (e2 < 0) go = false else end = e2
          case None => go = false
        }
      }
      if (end >= 0) {
        asRe.findFirstMatchIn(masked.substring(end + 1)).foreach { am =>
          val a = am.group(1).toLowerCase
          if (!TypeWords(a)) tainted += a
        }
      }
    }
    // propagate bare renames: `<tainted> AS <other>` keeps the HUGEINT
    var changed = true
    val renameRe = "(?i)([,(]|\\bselect)\\s*(\\w+)\\s+as\\s+(\\w+)".r
    while (changed) {
      changed = false
      for (m <- renameRe.findAllMatchIn(masked)) {
        val from = m.group(2).toLowerCase
        val to = m.group(3).toLowerCase
        if (tainted(from) && !TypeWords(to) && !tainted(to)) {
          tainted += to
          changed = true
        }
      }
    }
    tainted.toSet
  }

  /** Projection items of every depth-0 SELECT — the final query and its
    * set-operation branches (CTE bodies sit at depth >= 1). */
  def finalProjectionItems(masked: String): Seq[String] = {
    val lower = masked.toLowerCase
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    def wordAt(i: Int, w: String): Boolean =
      lower.startsWith(w, i) &&
        (i == 0 || !isWordChar(lower(i - 1))) &&
        (i + w.length >= lower.length || !isWordChar(lower(i + w.length)))
    val selStarts = scala.collection.mutable.Buffer[Int]()
    var depth = 0
    var i = 0
    while (i < lower.length) {
      lower(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 's' if depth == 0 && wordAt(i, "select") => selStarts += i
        case _ =>
      }
      i += 1
    }
    selStarts.toSeq.flatMap { st =>
      var j = st + 6
      var d = 0
      var fromPos = -1
      while (j < lower.length && fromPos < 0) {
        lower(j) match {
          case '(' => d += 1
          case ')' => d -= 1
          case 'f' if d == 0 && wordAt(j, "from") => fromPos = j
          case _ =>
        }
        j += 1
      }
      val proj = if (fromPos >= 0) masked.substring(st + 6, fromPos)
                 else masked.substring(st + 6)
      val items = scala.collection.mutable.Buffer[String]()
      var d2 = 0
      var start = 0
      var k = 0
      while (k < proj.length) {
        proj(k) match {
          case '(' => d2 += 1
          case ')' => d2 -= 1
          case ',' if d2 == 0 => items += proj.substring(start, k); start = k + 1
          case _ =>
        }
        k += 1
      }
      items += proj.substring(start)
      items.toSeq.map(_.trim).filter(_.nonEmpty)
    }
  }

  /** Human-readable violations for one oracle SQL string. */
  def violations(sql: String): Seq[String] = {
    val masked = maskQuotes(sql)
    val tainted = taintedAliases(masked)
    val bareId = "(?is)^(\\w+)(\\s+as\\s+\\w+)?$".r
    finalProjectionItems(masked).flatMap {
      case item @ bareId(name, _) if tainted(name.toLowerCase) =>
        Some(s"bare HUGEINT-tainted alias in final SELECT: '$item' " +
          "(wrap as CAST(... AS BIGINT))")
      case item if item.toLowerCase.matches("(?s)^sum\\s*\\(.*") &&
          rawSumSites(item).nonEmpty =>
        Some(s"raw sum() in final SELECT: '${item.take(60)}' " +
          "(DuckDB types it HUGEINT; wrap as CAST(... AS BIGINT))")
      case _ => None
    }
  }
}

class OracleTypeLintSpec extends AnyFunSuite {

  test("every oracle SQL is free of uncast integer sums in its final projection") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      OracleSumLint.violations(sql).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, "oracle type lint:\n" + bad.mkString("\n"))
  }

  test("the lint would have caught both r9 hash failures (canaries)") {
    // q_calibration pre-fix shape: raw sum alias emitted bare at the end
    val calib = """WITH g AS (SELECT bin, count(*) AS n, sum(label) AS positives
      FROM d GROUP BY 1)
      SELECT CAST(bin AS BIGINT) AS bin, n, positives FROM g ORDER BY bin"""
    assert(OracleSumLint.violations(calib).exists(_.contains("positives")))
    // q_collocations pre-fix shape: taint flows through two CTEs
    val colloc = """WITH pc AS (SELECT w1, w2, count(*) AS k11 FROM pr GROUP BY 1, 2),
      m1 AS (SELECT w1, sum(k11) AS n_w1 FROM pc GROUP BY 1),
      g AS (SELECT w1, k11 AS n_pair, n_w1 FROM pc JOIN m1 USING (w1))
      SELECT w1, n_pair, n_w1 FROM g ORDER BY w1"""
    assert(OracleSumLint.violations(colloc).exists(_.contains("n_w1")))
    // a raw integer sum directly in the final select is also rejected
    val direct = "SELECT lang, sum(n_tokens) AS total FROM documents GROUP BY 1"
    assert(OracleSumLint.violations(direct).nonEmpty)
    // the CAST convention passes, and a known-DOUBLE column is exempt
    // (sum(double) is DOUBLE in both engines — no HUGEINT)
    val fixed = direct.replace("sum(n_tokens)", "CAST(sum(n_tokens) AS BIGINT)")
    assert(OracleSumLint.violations(fixed).isEmpty)
    val dbl = "SELECT sum(l_quantity) AS sum_qty FROM lineitem"
    assert(OracleSumLint.violations(dbl).isEmpty)
  }
}
