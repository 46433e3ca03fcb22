package graft

/** Shared statement-lexing helpers for the SQL pre-parser routes
  * ([[DdlSql]], [[TemporalSql]], [[graft.cep.MatchRecognizeSql]]):
  * one quote-tracking scan instead of a bespoke copy per route, so a
  * quote-handling fix lands everywhere at once (r10 review).
  */
object SqlLex {

  /** `true` at positions inside (or delimiting) a single-quoted string
    * literal; doubled quotes ('') read as an escaped quote because the
    * closing quote immediately re-opens a literal on the next pass.
    */
  def inStringMask(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { m(i) = true; if (c == '\'') inStr = false }
      else if (c == '\'') { m(i) = true; inStr = true }
      i += 1
    }
    m
  }

  /** Split on top-level commas — depth-0 w.r.t. parens, outside
    * single-quoted literals — so `DECIMAL(38,0)` / `'a,b'` survive.
    */
  def splitTopCommas(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach { c =>
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => cur += c; inStr = true
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Remove `alias.` qualifiers OUTSIDE string literals — a plain
    * regex replaceAll would also rewrite alias-shaped text inside a
    * literal, silently changing the predicate (r10 review class).
    * Word-bounded on the left (so `grp.` survives `agg_grp.`-free) and
    * requires the trailing dot.
    */
  def stripQualifiers(s: String, aliases: Seq[String]): String = {
    val mask = inStringMask(s)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val hit = if (mask(i)) None
        else aliases.find { a =>
          s.regionMatches(true, i, a, 0, a.length) &&
            i + a.length < s.length && s.charAt(i + a.length) == '.' &&
            (i == 0 || {
              val p = s.charAt(i - 1)
              !Character.isLetterOrDigit(p) && p != '_' && p != '.'
            })
        }
      hit match {
        case Some(a) => i += a.length + 1 // drop alias and its dot
        case None => sb += s.charAt(i); i += 1
      }
    }
    sb.toString
  }

  /** Split a predicate on top-level `AND`s — word-bounded,
    * case-insensitive, depth-0 w.r.t. parens, outside string literals —
    * so `note = 'x AND y'` and `(a AND b)` survive as single conjuncts.
    */
  def splitTopAnd(s: String): Seq[String] = {
    val mask = inStringMask(s)
    val out = scala.collection.mutable.Buffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    val up = s.toUpperCase
    while (i < s.length) {
      val c = s.charAt(i)
      if (!mask(i)) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && (c == 'A' || c == 'a') && i + 3 <= s.length &&
            up.regionMatches(i, "AND", 0, 3) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') &&
            (i + 3 == s.length || !Character.isLetterOrDigit(s.charAt(i + 3)) && s.charAt(i + 3) != '_')) {
          out += s.substring(start, i)
          start = i + 3
          i += 2 // outer increment lands on the boundary char, which
          //        still needs paren tracking (e.g. `AND(`)
        }
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
