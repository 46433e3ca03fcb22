package graft.cep

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** SQL-statement route for MATCH_RECOGNIZE — the reference accepts row
  * pattern matching as a SQL clause (ref: StreamExecMatch.scala:68 via
  * the Calcite SqlMatchRecognize parse node), and a real user's first
  * CEP attempt is the SQL statement, not a builder API. This is a
  * LIGHT pre-parser: it recognizes the one construct Catalyst cannot
  * parse, lowers it onto the already-oracled [[MatchRecognize]] /
  * [[NFA]] machinery, and hands everything around it back to Spark SQL.
  *
  * Supported clause subset (documented, erroring loudly otherwise):
  *
  *  - `FROM <table>` or `FROM (<subquery>)` — the subquery is executed
  *    by Spark SQL and registered as the pattern input;
  *  - `PARTITION BY c1[, c2…]` — plain columns;
  *  - `ORDER BY c1 [ASC|DESC][, c2…]` — plain columns with direction
  *    (row-pattern order is the within-partition sort);
  *  - `MEASURES m AS name, …` with m ∈ `FIRST(V.c)`, `LAST(V.c)`,
  *    `V.c` (≡ FINAL LAST, the SQL:2016 default), `COUNT(V.*)`,
  *    `COUNT(*)`, `SUM(V.c)`, `MIN(V.c)`, `MAX(V.c)`, and — under ALL
  *    ROWS PER MATCH — `CLASSIFIER()`, `RUNNING COUNT(*)`,
  *    `RUNNING COUNT(V.*)`, and `RUNNING SUM|MIN|MAX([V.]c)`;
  *  - `ONE ROW PER MATCH` (default) or `ALL ROWS PER MATCH` (one output
  *    row per MATCHED event: every input column + the measures, with
  *    CLASSIFIER/RUNNING evaluated per row and aggregates FINAL);
  *  - `WITHIN INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY` — the match window
  *    anchored at the match start, clocked by the first ORDER BY column
  *    (required ascending) cast to timestamp;
  *  - `AFTER MATCH SKIP PAST LAST ROW` / `SKIP TO NEXT ROW` /
  *    `SKIP TO [FIRST|LAST] <variable>` (bare variable ≡ LAST);
  *  - `PATTERN (…)` — the full [[MatchRecognize.compileMulti]] grammar:
  *    quantifiers `+ * ? {n} {n,m} {n,}` (greedy + reluctant),
  *    alternation groups, PERMUTE;
  *  - `DEFINE V AS <predicate>, …` where each predicate is a top-level
  *    AND of (a) Spark-SQL boolean expressions, optionally navigating
  *    the INPUT sequence with `PREV(V.c[, n])` / `NEXT(V.c[, n])`
  *    (lowered to `lag`/`lead` window columns — Catalyst evaluates them
  *    once, codegen'd, so `DOWN.price < PREV(DOWN.price)` costs one
  *    window pass, not one evaluation per NFA transition), and (b)
  *    binding-navigation comparisons `x <op> FIRST|LAST(A.c[, n])`
  *    (lowered onto the NFA's ITERATIVE conditions, ref:
  *    IterativeCondition.java:65-85, with SQL RUNNING semantics — the
  *    row under test is the current LAST of its own variable). A
  *    pattern variable without a DEFINE matches any row (SQL).
  *
  * Clause parsing is SEQUENTIAL in the SQL:2016 canonical clause order,
  * and clause keywords are recognized only at parenthesis depth 0
  * outside string literals — a DEFINE predicate mentioning a column
  * named `pattern` or `within` cannot truncate an earlier clause
  * (clauses are only searched for AFTER the previous clause's position,
  * and DEFINE, the free-form clause, is last: its body runs to the end
  * of the block by construction).
  *
  * Execution shape (100 TB posture): DEFINE predicates are evaluated
  * ONCE as boolean columns by Catalyst codegen (PREV/NEXT as lag/lead
  * in the same pass) — the NFA re-evaluates nothing per transition
  * except the rare FIRST/LAST iterative conjuncts; then one shuffle on
  * the partition keys, a within-partition sort, and group-local
  * matching via mapPartitions with key-change detection (the
  * secondary-sort shape — no per-key collect, embarrassingly parallel
  * across keys, same as [[CEP.batchFlatMulti]]).
  */
object MatchRecognizeSql {

  /** Does this statement contain a MATCH_RECOGNIZE clause? (word-bounded,
    * case-insensitive — a column named `match_recognized` must not trip it)
    */
  def applies(sql: String): Boolean =
    "(?i)\\bMATCH_RECOGNIZE\\s*\\(".r.findFirstIn(sql).isDefined

  private[cep] final case class Measure(name: String, fn: String, variable: String, column: String)

  /** One binding-navigation conjunct of a DEFINE predicate:
    * `<refCol> <op> FIRST|LAST(<variable>.<column>[, offset])`.
    */
  private[cep] final case class NavCond(refCol: String, op: String,
      fn: String, variable: String, column: String, offset: Int)

  private[cep] final case class Spec(
      table: String,
      partitionBy: Seq[String],
      orderBy: Seq[(String, Boolean)], // (column, desc)
      measures: Seq[Measure],
      skip: AfterMatch,
      pattern: String,
      define: Map[String, String],
      allRows: Boolean = false,
      withinMs: Option[Long] = None)

  /** Rewrite-and-run: lower the MATCH_RECOGNIZE block onto the NFA,
    * register the result as a temp view, and delegate the surrounding
    * statement (outer SELECT / ORDER BY / anything Catalyst parses) to
    * Spark SQL against that view.
    */
  def run(spark: SparkSession, sql: String): DataFrame = {
    val m = "(?i)\\bMATCH_RECOGNIZE\\s*\\(".r.findFirstMatchIn(sql)
      .getOrElse(throw new IllegalArgumentException("no MATCH_RECOGNIZE clause"))
    // balance parens to find the block end (DEFINE expressions nest)
    val openIdx = sql.indexOf('(', m.start)
    var depth = 0; var i = openIdx
    while (i < sql.length && { if (sql(i) == '(') depth += 1; if (sql(i) == ')') depth -= 1; depth != 0 }) i += 1
    require(i < sql.length, "unbalanced MATCH_RECOGNIZE parentheses")
    val block = sql.substring(openIdx + 1, i)
    // the FROM operand immediately before MATCH_RECOGNIZE: a plain table
    // name, or a parenthesized subquery (executed by Spark SQL and
    // registered as the pattern input)
    val before = sql.substring(0, m.start)
    val beforeTrim = before.replaceFirst("\\s+$", "")
    val tableRx = "(?is).*\\bFROM\\s+([A-Za-z_][\\w.]*)\\s*$".r
    val (inputDf, fromAt, inputLabel) =
      if (beforeTrim.endsWith(")")) {
        // backward paren balance to the subquery's open paren
        var d = 0; var j = beforeTrim.length - 1
        while (j >= 0 && { if (beforeTrim(j) == ')') d += 1; if (beforeTrim(j) == '(') d -= 1; d != 0 }) j -= 1
        require(j >= 0, "unbalanced subquery parentheses before MATCH_RECOGNIZE")
        val pre = beforeTrim.substring(0, j)
        val fm = "(?is).*\\b(FROM)\\s*$".r.findFirstMatchIn(pre).getOrElse(
          throw new IllegalArgumentException(
            "MATCH_RECOGNIZE must directly follow 'FROM <table>' or 'FROM (<subquery>)'"))
        val sub = beforeTrim.substring(j + 1, beforeTrim.length - 1)
        (spark.sql(sub), fm.start(1), "__mr_subquery")
      } else {
        val table = beforeTrim match {
          case tableRx(t) => t
          case _ => throw new IllegalArgumentException(
            "MATCH_RECOGNIZE must directly follow 'FROM <table>' or 'FROM (<subquery>)'")
        }
        val fromAt = ("(?is)\\bFROM\\s+" + java.util.regex.Pattern.quote(table) + "\\s*$").r
          .findFirstMatchIn(before).get.start
        (spark.table(table), fromAt, table)
      }
    val spec = parseBlock(inputLabel, block)
    val out = execute(spark, inputDf, spec)
    // splice: FROM <operand> MATCH_RECOGNIZE (...) → FROM <view>, then
    // hand the surrounding statement back to Catalyst. The FROM located
    // by the anchored regex, not a substring search — an identifier
    // merely CONTAINING "from" must not be the splice point.
    val view = s"__mr_${math.abs(sql.hashCode).toString}"
    out.createOrReplaceTempView(view)
    val outer = before.substring(0, fromAt) + s"FROM $view " + sql.substring(i + 1)
    spark.sql(outer)
  }

  // ---------------------------------------------------------------- //
  // parsing                                                          //
  // ---------------------------------------------------------------- //

  /** `mask(i)` = position `i` is at parenthesis depth 0 and outside a
    * single-quoted string literal — the only places clause keywords are
    * recognized.
    */
  private def topLevelMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var depth = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      mask(i) = depth == 0 && !inStr
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case _    =>
      }
      i += 1
    }
    mask
  }

  /** The SQL:2016 canonical clause order; each entry is (name, header
    * regex). Scanned SEQUENTIALLY with a cursor: a clause header only
    * counts if it appears at depth 0 AFTER the previous clause found —
    * so free-form DEFINE bodies (last clause) can contain any keyword.
    */
  private val clauseDefs: Seq[(String, String)] = Seq(
    "PARTITION BY" -> "(?is)\\bPARTITION\\s+BY\\b",
    "ORDER BY"     -> "(?is)\\bORDER\\s+BY\\b",
    "MEASURES"     -> "(?is)\\bMEASURES\\b",
    "ONE ROW PER MATCH"  -> "(?is)\\bONE\\s+ROW\\s+PER\\s+MATCH\\b",
    "ALL ROWS PER MATCH" -> "(?is)\\bALL\\s+ROWS\\s+PER\\s+MATCH\\b",
    "AFTER MATCH"  -> "(?is)\\bAFTER\\s+MATCH\\b",
    "PATTERN"      -> "(?is)\\bPATTERN\\s*\\(",
    "SUBSET"       -> "(?is)\\bSUBSET\\b",
    "WITHIN"       -> "(?is)\\bWITHIN\\s+INTERVAL\\b",
    "DEFINE"       -> "(?is)\\bDEFINE\\b")

  /** Sequentially locate each clause; returns name → body text (from
    * header end to the next found clause's header start).
    */
  private def splitClauses(block: String): Map[String, String] = {
    val mask = topLevelMask(block)
    var cursor = 0
    val found = Seq.newBuilder[(String, Int, Int)] // (name, headerStart, bodyStart)
    for ((name, rxs) <- clauseDefs) {
      val rx = rxs.r
      rx.findAllMatchIn(block).find(mm => mm.start >= cursor && mask(mm.start)).foreach { mm =>
        // PATTERN's header regex consumes its '(' — the body must keep it
        val bodyStart = if (name == "PATTERN") block.indexOf('(', mm.start) else mm.end
        found += ((name, mm.start, bodyStart))
        cursor = bodyStart
      }
    }
    val fs = found.result()
    require(!fs.exists(_._1 == "SUBSET"),
      "SUBSET is not supported (union variables: compute the union in MEASURES instead)")
    // out-of-canonical-order guard: a clause header visible at depth 0
    // but NOT consumed by the sequential scan means the statement
    // deviates from the canonical clause order — fail loudly instead of
    // silently ignoring it (a WITHIN placed before PATTERN would
    // otherwise leave the match unbounded in time). The free-form
    // DEFINE body (always last) is exempt, so keyword-named
    // identifiers inside DEFINE remain legal.
    val defineBodyStart = fs.find(_._1 == "DEFINE").map(_._3).getOrElse(block.length)
    val consumed = fs.map(_._2).toSet
    for ((name, rxs) <- clauseDefs; mm <- rxs.r.findAllMatchIn(block)
         if mask(mm.start) && mm.start < defineBodyStart && !consumed(mm.start))
      throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE clause $name (offset ${mm.start}) is out of the canonical " +
          "SQL:2016 clause order (PARTITION BY, ORDER BY, MEASURES, rows-per-match, " +
          "AFTER MATCH, PATTERN, WITHIN, DEFINE)")
    fs.zipWithIndex.map { case ((name, _, bodyStart), k) =>
      val end = if (k + 1 < fs.length) fs(k + 1)._2 else block.length
      name -> block.substring(bodyStart, end).trim
    }.toMap
  }

  /** Split on top-level commas (depth-0 wrt parens) — MEASURES and
    * DEFINE lists carry parenthesized expressions.
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var last = 0
    for (j <- s.indices) s(j) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(last, j); last = j + 1
      case _ =>
    }
    out += s.substring(last)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val MeasureRx = "(?is)^(?:(FIRST|LAST|COUNT|SUM|MIN|MAX)\\s*\\(\\s*)?" +
    "(?:([A-Za-z_]\\w*)\\s*\\.\\s*)?(\\*|[A-Za-z_]\\w*)\\s*\\)?\\s+AS\\s+([A-Za-z_]\\w*)$"

  private val WithinRx =
    "(?is)^INTERVAL\\s+'(\\d+)'\\s+(SECOND|MINUTE|HOUR|DAY)S?$".r

  private[cep] def parseBlock(table: String, block: String): Spec = {
    val clauses = splitClauses(block)
    def c(kw: String): Option[String] = clauses.get(kw)
    require(!(clauses.contains("ONE ROW PER MATCH") && clauses.contains("ALL ROWS PER MATCH")),
      "ONE ROW PER MATCH and ALL ROWS PER MATCH are mutually exclusive")
    val allRows = clauses.contains("ALL ROWS PER MATCH")
    val withinMs = c("WITHIN").map(b => "INTERVAL " + b).map {
      case WithinRx(n, unit) =>
        n.toLong * (unit.toUpperCase match {
          case "SECOND" => 1000L
          case "MINUTE" => 60000L
          case "HOUR"   => 3600000L
          case "DAY"    => 86400000L
        })
      case other => throw new IllegalArgumentException(
        s"unsupported WITHIN: '${other.stripPrefix("INTERVAL ")}' (expected INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY)")
    }
    val partitionBy = c("PARTITION BY").map(splitTop(_).map(_.trim))
      .getOrElse(throw new IllegalArgumentException("PARTITION BY is required"))
    val orderBy = c("ORDER BY").map(splitTop(_).map(_.trim).map { spec =>
      val parts = spec.split("\\s+")
      require(parts.length <= 2 &&
        (parts.length == 1 || parts(1).equalsIgnoreCase("ASC") || parts(1).equalsIgnoreCase("DESC")),
        s"ORDER BY supports only `col [ASC|DESC]`, got: $spec")
      (parts(0), parts.length > 1 && parts(1).equalsIgnoreCase("DESC"))
    }).getOrElse(throw new IllegalArgumentException("ORDER BY is required"))
    val measuresRaw = c("MEASURES")
      .getOrElse(throw new IllegalArgumentException("MEASURES is required"))
    val rx = MeasureRx.r
    val classifierRx = "(?is)^CLASSIFIER\\s*\\(\\s*\\)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val rcountRx = "(?is)^RUNNING\\s+COUNT\\s*\\(\\s*(?:([A-Za-z_]\\w*)\\s*\\.\\s*)?\\*\\s*\\)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val raggRx = "(?is)^RUNNING\\s+(SUM|MIN|MAX)\\s*\\(\\s*(?:([A-Za-z_]\\w*)\\s*\\.\\s*)?([A-Za-z_]\\w*)\\s*\\)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val measures = splitTop(measuresRaw).map {
      case classifierRx(name) =>
        require(allRows, s"CLASSIFIER() ($name) is only meaningful under ALL ROWS PER MATCH")
        Measure(name, "CLASSIFIER", "", "")
      case rcountRx(v, name) =>
        require(allRows, s"RUNNING COUNT ($name) is only meaningful under ALL ROWS PER MATCH")
        Measure(name, "RCOUNT", Option(v).getOrElse(""), "")
      case raggRx(fn, v, colName, name) =>
        require(allRows, s"RUNNING ${fn.toUpperCase} ($name) is only meaningful under ALL ROWS PER MATCH")
        Measure(name, "R" + fn.toUpperCase, Option(v).getOrElse(""), colName)
      case rx(fn, v, colName, name) =>
        val f = Option(fn).map(_.toUpperCase).getOrElse("LAST")
        require(colName != "*" || f == "COUNT", s"bare * only under COUNT: $name")
        require(v != null || f == "COUNT" || colName != "*",
          s"measure $name needs a pattern-variable qualifier")
        Measure(name, f, Option(v).getOrElse(""), colName)
      case other => throw new IllegalArgumentException(
        s"unsupported MEASURES item: '$other' (supported: FIRST/LAST/COUNT/SUM/MIN/MAX of V.col, " +
          "V.col, COUNT(*), and under ALL ROWS: CLASSIFIER(), RUNNING COUNT/SUM/MIN/MAX)")
    }
    val skip = c("AFTER MATCH") match {
      case None => AfterMatch.SkipPastLast
      case Some(body) =>
        val norm = body.replaceAll("\\s+", " ").trim
        val skipToRx = "(?is)^SKIP\\s+TO\\s+(?:(FIRST|LAST)\\s+)?([A-Za-z_]\\w*)$".r
        norm.toUpperCase match {
          case "SKIP PAST LAST ROW" => AfterMatch.SkipPastLast
          case "SKIP TO NEXT ROW"   => AfterMatch.NoSkip
          case _ => norm match {
            case skipToRx(fl, v) =>
              if (fl != null && fl.equalsIgnoreCase("FIRST")) AfterMatch.SkipToFirst(v)
              else AfterMatch.SkipToLast(v) // SKIP TO <v> ≡ SKIP TO LAST <v> (SQL:2016)
            case other => throw new IllegalArgumentException(s"unsupported AFTER MATCH: $other")
          }
        }
    }
    val pattern = c("PATTERN")
      .map(_.trim).map(p => p.substring(p.indexOf('(') + 1, p.lastIndexOf(')')))
      .getOrElse(throw new IllegalArgumentException("PATTERN is required"))
    val defineRaw = c("DEFINE").getOrElse("")
    val defRx = "(?is)^([A-Za-z_]\\w*)\\s+AS\\s+(.+)$".r
    val define = splitTop(defineRaw).map {
      case defRx(v, e) => v -> e.trim
      case other => throw new IllegalArgumentException(s"bad DEFINE item: '$other'")
    }.toMap
    Spec(table, partitionBy, orderBy, measures, skip, pattern, define,
      allRows, withinMs)
  }

  // ---------------------------------------------------------------- //
  // DEFINE lowering: PREV/NEXT → lag/lead columns, FIRST/LAST →       //
  // iterative NavConds                                               //
  // ---------------------------------------------------------------- //

  private val PrevNextRx =
    "(?i)\\b(PREV|NEXT)\\s*\\(\\s*([A-Za-z_]\\w*)\\s*\\.\\s*([A-Za-z_]\\w*)\\s*(?:,\\s*(\\d+))?\\s*\\)".r
  private val NavPart =
    "(FIRST|LAST)\\s*\\(\\s*([A-Za-z_]\\w*)\\s*\\.\\s*([A-Za-z_]\\w*)\\s*(?:,\\s*(\\d+))?\\s*\\)"
  private val RefPart = "(?:([A-Za-z_]\\w*)\\s*\\.\\s*)?([A-Za-z_]\\w*)"
  private val OpPart = "(<=|>=|<>|!=|=|<|>)"
  private val NavRightRx = ("(?is)^\\s*" + RefPart + "\\s*" + OpPart + "\\s*" + NavPart + "\\s*$").r
  private val NavLeftRx  = ("(?is)^\\s*" + NavPart + "\\s*" + OpPart + "\\s*" + RefPart + "\\s*$").r
  private val NavHintRx  = "(?i)\\b(FIRST|LAST)\\s*\\(\\s*[A-Za-z_]\\w*\\s*\\.".r

  private def flipOp(op: String): String = op match {
    case "<" => ">"
    case ">" => "<"
    case "<=" => ">="
    case ">=" => "<="
    case other => other // = <> != are symmetric
  }

  /** Literal positions (shared lexer, [[graft.SqlLex.inStringMask]] —
    * single/double quotes + backslash escapes, Spark's default literal
    * grammar): the navigation-rewrite regexes must not fire there.
    */
  private def inStringMask(s: String): Array[Boolean] =
    graft.SqlLex.inStringMask(s)

  /** Split a DEFINE predicate on top-level ANDs (depth 0, outside
    * strings).
    */
  private def splitAnd(s: String): Seq[String] = {
    val mask = topLevelMask(s)
    val andRx = "(?i)\\bAND\\b".r
    val cuts = andRx.findAllMatchIn(s).filter(m => mask(m.start)).toSeq
    val bounds = (0 +: cuts.map(_.end)).zip(cuts.map(_.start) :+ s.length)
    bounds.map { case (a, b) => s.substring(a, b).trim }.filter(_.nonEmpty)
  }

  /** Lower variable `v`'s DEFINE body: returns (row-local SQL with
    * PREV/NEXT rewritten to lag/lead over the pattern's input order,
    * binding-navigation conjuncts as [[NavCond]]s).
    */
  private[cep] def lowerDefine(v: String, raw: String,
      partitionBy: Seq[String], orderBy: Seq[(String, Boolean)]): (Option[String], Seq[NavCond]) = {
    val over = s"PARTITION BY ${partitionBy.mkString(", ")} ORDER BY " +
      orderBy.map { case (c, d) => if (d) s"$c DESC" else c }.mkString(", ")
    def refOf(qual: String, c: String): String = {
      require(qual == null || qual == v,
        s"DEFINE $v: row reference ${qual}.$c must use the defined variable " +
          "(other variables' columns: navigate with FIRST/LAST)")
      c
    }
    val (navs, sqls) = splitAnd(raw).partitionMap { conj =>
      conj match {
        case NavRightRx(qual, refCol, op, fn, nv, ncol, noff) =>
          Left(NavCond(refOf(qual, refCol), op, fn.toUpperCase, nv, ncol,
            Option(noff).map(_.toInt).getOrElse(0)))
        case NavLeftRx(fn, nv, ncol, noff, op, qual, refCol) =>
          Left(NavCond(refOf(qual, refCol), flipOp(op), fn.toUpperCase, nv, ncol,
            Option(noff).map(_.toInt).getOrElse(0)))
        case _ =>
          // literal-aware rewrites: navigation-shaped text INSIDE a
          // single-quoted literal is data, not syntax — the masks keep
          // PrevNextRx/QualRx from corrupting it (r9 advice)
          val strMask = inStringMask(conj)
          require(NavHintRx.findAllMatchIn(conj).forall(m => strMask(m.start)),
            s"DEFINE $v: FIRST/LAST navigation is supported only as a top-level " +
              s"comparison conjunct `x <op> FIRST|LAST(A.c[, n])`, got: '$conj'")
          val navLowered = PrevNextRx.replaceAllIn(conj, m => {
            if (strMask(m.start))
              java.util.regex.Matcher.quoteReplacement(m.matched)
            else {
              require(m.group(2) == v,
                s"DEFINE $v: ${m.group(1).toUpperCase}(${m.group(2)}.${m.group(3)}) must navigate " +
                  s"the defined variable (other variables: use FIRST/LAST)")
              val f = if (m.group(1).equalsIgnoreCase("PREV")) "lag" else "lead"
              val off = Option(m.group(4)).getOrElse("1")
              java.util.regex.Matcher.quoteReplacement(
                s"$f(${m.group(3)}, $off) OVER ($over)")
            }
          })
          // the defined variable's qualified refs mean the CURRENT row
          // (SQL:2016): V.price → price. Other qualifiers pass through
          // (struct field access); unknown variable refs fail loudly in
          // Spark's analyzer.
          val lowMask = inStringMask(navLowered)
          val QualRx = ("\\b" + java.util.regex.Pattern.quote(v) + "\\s*\\.\\s*([A-Za-z_]\\w*)").r
          Right(QualRx.replaceAllIn(navLowered, m =>
            java.util.regex.Matcher.quoteReplacement(
              if (lowMask(m.start)) m.matched else m.group(1))))
      }
    }
    (if (sqls.isEmpty) None else Some(sqls.map(s => s"($s)").mkString(" AND ")), navs)
  }

  private def isInfinite(n: Number): Boolean = n match {
    case d: java.lang.Double => d.isInfinite
    case f: java.lang.Float => f.isInfinite
    case _ => false
  }

  /** Exact comparison across the column types the route supports; None
    * when either side is null/NaN (SQL: the comparison is not true).
    */
  private def cmpAny(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Double, _) if x.isNaN => None
    case (_, y: Double) if y.isNaN => None
    case (x: Float, _) if x.isNaN => None
    case (_, y: Float) if y.isNaN => None
    case (x: Number, y: Number) if isInfinite(x) || isInfinite(y) =>
      // BigDecimal cannot represent ±Infinity; an infinite side dominates
      // any finite value, so the double compare is exact here
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: Number, y: Number) =>
      Some(new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString)))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => Some(x.compareTo(y))
    case (x: java.sql.Date, y: java.sql.Date) => Some(x.compareTo(y))
    case _ => throw new IllegalArgumentException(
      s"FIRST/LAST comparison unsupported between ${a.getClass.getSimpleName} and ${b.getClass.getSimpleName}")
  }

  private def opHolds(op: String, c: Int): Boolean = op match {
    case "<"  => c < 0
    case "<=" => c <= 0
    case ">"  => c > 0
    case ">=" => c >= 0
    case "="  => c == 0
    case "<>" | "!=" => c != 0
  }

  // ---------------------------------------------------------------- //
  // execution                                                        //
  // ---------------------------------------------------------------- //

  private def execute(spark: SparkSession, df: DataFrame, spec: Spec): DataFrame = {
    // pattern variables, in appearance order
    val vars = "[A-Za-z_]\\w*".r.findAllIn(spec.pattern)
      .filterNot(_.equalsIgnoreCase("PERMUTE")).distinct.toVector
    spec.define.keys.foreach(v => require(vars.contains(v),
      s"DEFINE for unknown pattern variable $v"))
    val lowered: Map[String, (Option[String], Seq[NavCond])] =
      spec.define.map { case (v, raw) =>
        v -> lowerDefine(v, raw, spec.partitionBy, spec.orderBy)
      }
    // a navigated variable outside the pattern would make eventsFor
    // return empty — an always-false condition that silently yields
    // zero matches; error loudly instead (r9 advice, mirrors the
    // define-keys check above)
    lowered.foreach { case (v, (_, navs)) =>
      navs.foreach(nc => require(vars.contains(nc.variable),
        s"DEFINE $v: FIRST/LAST navigates unknown pattern variable ${nc.variable}"))
    }
    // DEFINE row-local parts evaluated ONCE by Catalyst codegen as
    // boolean columns (PREV/NEXT as lag/lead in the same pass) — the NFA
    // reads a precomputed flag per transition. Undefined variables match
    // any row (SQL default).
    val aug0 = vars.foldLeft(df) { (d, v) =>
      d.withColumn(s"__def_$v",
        expr(lowered.get(v).flatMap(_._1).getOrElse("true")).cast("boolean"))
    }
    // WITHIN needs real event time: the first ORDER BY column (cast to
    // timestamp) becomes the NFA's microsecond clock
    val aug = spec.withinMs match {
      case Some(_) =>
        require(!spec.orderBy.head._2, "WITHIN requires the first ORDER BY column ascending")
        aug0.withColumn("__ord_us",
          expr(s"unix_micros(cast(${spec.orderBy.head._1} AS TIMESTAMP))"))
      case None => aug0
    }
    val partExprs: Seq[Column] = spec.partitionBy.map(col)
    val sortExprs: Seq[Column] = spec.partitionBy.map(col(_).asc) ++
      spec.orderBy.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }
    val sorted = aug.repartition(partExprs: _*).sortWithinPartitions(sortExprs: _*)
    val schema = sorted.schema
    val partIdx = spec.partitionBy.map(schema.fieldIndex)
    val defIdx = vars.map(v => v -> schema.fieldIndex(s"__def_$v")).toMap
    val colIdx = (name: String) => schema.fieldIndex(name)
    val inField = (name: String) => schema(schema.fieldIndex(name))
    // output schema: ONE ROW → partition cols + measures; ALL ROWS →
    // every original input column + measures. Measures keep the source
    // column's type except COUNT/RUNNING COUNT (long), CLASSIFIER
    // (string), and SUM (long over integral inputs, double over
    // fractional — DuckDB's sum(int) is cast BIGINT by every oracle)
    val measureFields = spec.measures.map { ms =>
      val dt = ms.fn match {
        case "COUNT" | "RCOUNT" => LongType
        case "CLASSIFIER"       => StringType
        case "SUM" | "RSUM" => inField(ms.column).dataType match {
          case ByteType | ShortType | IntegerType | LongType => LongType
          case _                                             => DoubleType
        }
        case _ => inField(ms.column).dataType
      }
      StructField(ms.name, dt, nullable = true)
    }
    val origCols = df.columns.toSeq
    val outFields =
      if (spec.allRows) origCols.map(c => inField(c).copy(name = c)) ++ measureFields
      else spec.partitionBy.map(p => inField(p).copy(name = p)) ++ measureFields
    val outSchema = StructType(outFields)
    // binding-navigation conjuncts → NFA iterative conditions (SQL
    // RUNNING semantics: the row under test is the current LAST of its
    // own variable; unbound navigation target → not true)
    val defineCtx: Map[String, (Row, MatchContext[Row]) => Boolean] =
      lowered.collect { case (v, (_, navs)) if navs.nonEmpty =>
        v -> { (row: Row, ctx: MatchContext[Row]) =>
          navs.forall { nc =>
            val bound0 = ctx.eventsFor(nc.variable)
            val bound = if (nc.variable == v) bound0 :+ row else bound0
            val tgt = nc.fn match {
              case "FIRST" => bound.lift(nc.offset)
              case "LAST"  => bound.lift(bound.length - 1 - nc.offset)
            }
            tgt.exists { t =>
              cmpAny(row.get(colIdx(nc.refCol)), t.get(colIdx(nc.column)))
                .exists(opHolds(nc.op, _))
            }
          }
        }
      }
    val patterns = MatchRecognize.compileMulti[Row](
      spec.pattern,
      vars.map(v => v -> ((r: Row) => !r.isNullAt(defIdx(v)) && r.getBoolean(defIdx(v)))).toMap,
      spec.skip,
      defineCtx).map(_.copy(withinMs = spec.withinMs))
    val measures = spec.measures
    val allRows = spec.allRows
    val ordUsIdx = if (spec.withinMs.isDefined) schema.fieldIndex("__ord_us") else -1
    val tsFn: Row => Long =
      if (ordUsIdx >= 0) (r: Row) => r.getLong(ordUsIdx) else (_: Row) => 0L
    def ordFor(dt: DataType): Ordering[Any] = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Ordering.by((a: Any) => a.asInstanceOf[Number].longValue)
      case FloatType | DoubleType =>
        Ordering.by((a: Any) => a.asInstanceOf[Number].doubleValue)
      case StringType => Ordering.by((a: Any) => a.asInstanceOf[String])
      case TimestampType => Ordering.by((a: Any) => a.asInstanceOf[java.sql.Timestamp].getTime)
      case other => throw new IllegalArgumentException(s"MIN/MAX unsupported over $other")
    }
    // hoisted per measure: the RMIN/RMAX overlay runs per OUTPUT ROW —
    // deriving the Ordering from the schema there would allocate on the
    // hot path
    val measureOrd: Array[Ordering[Any]] = measures.map(ms =>
      if (Set("MIN", "MAX", "RMIN", "RMAX")(ms.fn)) ordFor(inField(ms.column).dataType)
      else null).toArray
    val out = sorted.mapPartitions { it =>
      // key-change detection over the secondary-sorted partition: buffer
      // one key group at a time (the NFA needs the full ordered group,
      // exactly like CEP.batchFlatMulti's flatMapGroups)
      new Iterator[Seq[Row]] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): Seq[Row] = {
          val key = partIdx.map(buf.head.get)
          val group = Vector.newBuilder[Row]
          while (buf.hasNext && partIdx.map(buf.head.get) == key) group += buf.next()
          group.result()
        }
      }.flatMap { group =>
        val key = partIdx.map(group.head.get)
        NFA.findMatchesMulti[Row](group.toIndexedSeq, tsFn, patterns, tsPerMs = 1000L)
          .flatMap { pm =>
            // match-level (FINAL) measure values, computed once
            val matchVals = measures.zipWithIndex.map { case (ms, mvi) =>
              def bound = pm.bindings.getOrElse(ms.variable, Nil)
              def colOf(r: Row): Any = r.get(colIdx(ms.column))
              ms.fn match {
                case "FIRST" => bound.headOption.map(colOf).orNull
                case "LAST"  => bound.lastOption.map(colOf).orNull
                case "COUNT" =>
                  if (ms.variable.isEmpty) pm.rows.size.toLong else bound.size.toLong
                case "SUM" =>
                  val nums = bound.map(colOf).filter(_ != null).map(_.asInstanceOf[Number])
                  if (nums.isEmpty) null
                  else inField(ms.column).dataType match {
                    case ByteType | ShortType | IntegerType | LongType =>
                      nums.map(_.longValue).sum
                    case _ => nums.map(_.doubleValue).sum
                  }
                case "MIN" | "MAX" =>
                  val xs = bound.map(colOf).filter(_ != null)
                  if (xs.isEmpty) null
                  else {
                    val ord = measureOrd(mvi)
                    if (ms.fn == "MIN") xs.min(ord) else xs.max(ord)
                  }
                // per-row, overlaid below
                case "CLASSIFIER" | "RCOUNT" | "RSUM" | "RMIN" | "RMAX" => null
              }
            }
            if (!allRows) Seq(Row.fromSeq(key ++ matchVals))
            else {
              // RUNNING aggregate state, advanced row by row
              val nm = measures.length
              val rCnt = new Array[Long](nm)
              val rSumL = new Array[Long](nm)
              val rSumD = new Array[Double](nm)
              val rMinMax = new Array[Any](nm)
              pm.rows.zipWithIndex.map { case ((cls, row), i) =>
                val overlaid = measures.zip(matchVals).zipWithIndex.map {
                  case ((ms, _), mi) if ms.fn == "CLASSIFIER" => cls
                  case ((ms, _), mi) if ms.fn == "RCOUNT" =>
                    if (ms.variable.isEmpty || ms.variable == cls) rCnt(mi) += 1
                    rCnt(mi)
                  case ((ms, _), mi) if ms.fn == "RSUM" =>
                    val applies = ms.variable.isEmpty || ms.variable == cls
                    val v = if (applies) row.get(colIdx(ms.column)) else null
                    val integral = inField(ms.column).dataType match {
                      case ByteType | ShortType | IntegerType | LongType => true
                      case _ => false
                    }
                    if (v != null) {
                      rCnt(mi) += 1
                      if (integral) rSumL(mi) += v.asInstanceOf[Number].longValue
                      else rSumD(mi) += v.asInstanceOf[Number].doubleValue
                    }
                    if (rCnt(mi) == 0) null
                    else if (integral) java.lang.Long.valueOf(rSumL(mi))
                    else java.lang.Double.valueOf(rSumD(mi))
                  case ((ms, _), mi) if ms.fn == "RMIN" || ms.fn == "RMAX" =>
                    val applies = ms.variable.isEmpty || ms.variable == cls
                    val v = if (applies) row.get(colIdx(ms.column)) else null
                    if (v != null) {
                      val ord = measureOrd(mi)
                      rMinMax(mi) =
                        if (rMinMax(mi) == null) v
                        else if (ms.fn == "RMIN") ord.min(rMinMax(mi), v)
                        else ord.max(rMinMax(mi), v)
                    }
                    rMinMax(mi)
                  case ((_, v), _) => v
                }
                Row.fromSeq(origCols.map(c => row.get(colIdx(c))) ++ overlaid)
              }
            }
          }
      }
    }(Encoders.row(outSchema))
    out
  }
}
