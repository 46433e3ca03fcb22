package graft

/** Shared statement-lexing helpers for the SQL pre-parser routes —
  * [[DdlSql]] (comma split), [[TemporalSql]] (AND split, qualifier
  * strip, shear detection), and [[graft.cep.MatchRecognizeSql]]'s
  * rewrite masks delegate here, so a quote-handling fix lands
  * everywhere at once (r10 review). One bespoke tracker remains: the
  * MATCH_RECOGNIZE clause splitter's inline depth scan, which predates
  * this file and is pinned by its own doubled-quote spec.
  */
object SqlLex {

  /** `true` at positions inside (or delimiting) a string literal.
    * Spark's default literal grammar (the statements this lexer
    * pre-parses are destined for Spark): single- OR double-quoted
    * strings, backslash escapes inside either, and doubled quotes read
    * as an escape because the closing quote immediately re-opens a
    * literal on the next pass.
    */
  def inStringMask(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        m(i) = true
        if (c == '\\' && i + 1 < s.length) { m(i + 1) = true; i += 1 }
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') { m(i) = true; quote = c }
      i += 1
    }
    m
  }

  /** `true` when every string literal in `s` closes — a fragment a
    * statement regex captured THROUGH a literal (a clause keyword
    * inside a string sheared the match) has an odd dangling quote, and
    * any rewrite over it would corrupt the literal; callers reject
    * such statements loudly instead.
    */
  def literalsClosed(s: String): Boolean = {
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < s.length) i += 1
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') quote = c
      i += 1
    }
    quote == 0
  }

  /** Split on top-level commas — depth-0 w.r.t. parens, outside
    * single-quoted literals — so `DECIMAL(38,0)` / `'a,b'` survive.
    */
  def splitTopCommas(s: String): Seq[String] = {
    val mask = inStringMask(s)
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (mask(i)) cur += c
      else c match {
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
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
    while (i < s.length) {
      val c = s.charAt(i)
      if (!mask(i)) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && (c == 'A' || c == 'a') && i + 3 <= s.length &&
            // case-insensitive match on the ORIGINAL string — an
            // uppercased copy can change UTF-16 length (ß→SS) and
            // misalign every later offset
            s.regionMatches(true, i, "AND", 0, 3) &&
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
