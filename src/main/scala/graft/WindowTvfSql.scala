package graft

/** Windowing-TVF SQL surface — the reference's
  * `FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))`
  * statement family (SqlTumbleTableFunction / SqlHopTableFunction /
  * SqlCumulateTableFunction; the flagship §2.6 SQL shape). Spark's
  * parser has no window TVFs, so [[TableEnv.sqlQuery]] routes
  * statements containing one through this rewriter: each
  * `TABLE(TUMBLE|HOP|CUMULATE(...))` call becomes a derived table
  * computing the same assignment with Spark's own `window()` (tumble /
  * hop) or an explode over cumulate steps — after which the whole
  * statement is ordinary Catalyst SQL, windows and all.
  *
  * Faithful output columns: `window_start`, `window_end`, and
  * `window_time` (= end − 1 ms, the reference's rowtime of the window)
  * alongside every input column. One benign deviation: the helper
  * struct `__w` also rides along (harmless under explicit projections
  * or GROUP BY; documented here rather than hidden behind a
  * schema-dependent projection).
  *
  * Argument order follows the reference exactly: HOP takes (slide,
  * size), CUMULATE takes (step, max). Intervals are single-field
  * `INTERVAL '<n>' <unit>`; CUMULATE requires max to be a multiple of
  * step in the same unit (the reference raises the same planning
  * error).
  */
object WindowTvfSql {

  private val Tumble =
    raw"(?is)TABLE\s*\(\s*TUMBLE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*INTERVAL\s*'(\d+)'\s+(\w+)\s*\)\s*\)".r
  private val Hop =
    raw"(?is)TABLE\s*\(\s*HOP\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*INTERVAL\s*'(\d+)'\s+(\w+)\s*,\s*INTERVAL\s*'(\d+)'\s+(\w+)\s*\)\s*\)".r
  private val Cumulate =
    raw"(?is)TABLE\s*\(\s*CUMULATE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*INTERVAL\s*'(\d+)'\s+(\w+)\s*,\s*INTERVAL\s*'(\d+)'\s+(\w+)\s*\)\s*\)".r
  // ref SqlSessionTableFunction: SESSION(TABLE t [PARTITION BY k, ...],
  // DESCRIPTOR(ts), gap) — the one TVF whose window bounds are
  // data-dependent (start = min ts of the island, end = last ts + gap)
  private val Session =
    raw"(?is)TABLE\s*\(\s*SESSION\s*\(\s*TABLE\s+(\w+)(?:\s+PARTITION\s+BY\s+\(?\s*([\w]+(?:\s*,\s*[\w]+)*)\s*\)?)?\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*INTERVAL\s*'(\d+)'\s+(\w+)\s*\)\s*\)".r

  def applies(sql: String): Boolean =
    Tumble.findFirstIn(sql).isDefined || Hop.findFirstIn(sql).isDefined ||
      Cumulate.findFirstIn(sql).isDefined || Session.findFirstIn(sql).isDefined

  private def dur(n: String, unit: String): String = s"$n ${unit.toLowerCase}"

  private def windowed(table: String, col: String, winArgs: String): String =
    s"(SELECT __b.*, __b.__w.start AS window_start, __b.__w.end AS window_end, " +
      s"__b.__w.end - INTERVAL 1 MILLISECOND AS window_time " +
      s"FROM (SELECT *, window($col, $winArgs) AS __w FROM $table) __b)"

  /** The table a TVF call reads — lets [[TableEnv.sqlQuery]] pick the
    * streaming lowering when that table is a registered stream.
    */
  def tvfTable(sql: String): Option[String] =
    Tumble.findFirstMatchIn(sql).map(_.group(1))
      .orElse(Hop.findFirstMatchIn(sql).map(_.group(1)))
      .orElse(Cumulate.findFirstMatchIn(sql).map(_.group(1)))
      .orElse(Session.findFirstMatchIn(sql).map(_.group(1)))

  /** STREAMING lowering for aggregate-shaped TVF statements — the same
    * move the reference's planner makes (StreamExecWindowAggregate
    * subsumes the TVF): the derived-table rewrite loses Spark's
    * event-time tag when the user groups by the projected
    * `window_start`, so for a streaming source the statement
    * `SELECT … FROM TABLE(TUMBLE|HOP(…)) GROUP BY window_start[,
    * window_end][, keys]` lowers directly onto
    * `GROUP BY window(col, …)` with `window_start`/`window_end`
    * rewritten to `window.start`/`window.end` — watermark semantics
    * intact. Returns None when the statement is not that shape (the
    * caller falls back to the generic rewrite, which any BATCH query
    * can use).
    */
  def rewriteStreamingAgg(sql: String): Option[String] = {
    // (match, descriptor col, grouping fn name, fn args) — SESSION lowers
    // onto session_window (Spark's merging-window aggregate, the same
    // operator the reference's StreamExecWindowAggregate picks for
    // session TVFs); its grouped attribute is named `session_window`
    val matched =
      Tumble.findFirstMatchIn(sql)
        .map(m => (m, m.group(2), "window", s"'${dur(m.group(3), m.group(4))}'"))
        .orElse(Hop.findFirstMatchIn(sql)
          .map(m => (m, m.group(2), "window",
            s"'${dur(m.group(5), m.group(6))}', '${dur(m.group(3), m.group(4))}'")))
        .orElse(Session.findFirstMatchIn(sql)
          .map(m => (m, m.group(3), "session_window",
            s"'${dur(m.group(4), m.group(5))}'")))
    matched.flatMap { case (m, col, fn, args) =>
      val table = m.group(1)
      // session partition keys scope the merge — faithful only when the
      // aggregate also groups by every one of them
      val sessionKeys: Seq[String] =
        if (fn != "session_window") Nil
        else Option(m.group(2)).toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      val dropped = sql.substring(0, m.start) + table + sql.substring(m.end)
      val named = dropped
        .replaceAll(raw"(?i)\bwindow_start\b", s"$fn.start")
        .replaceAll(raw"(?i)\bwindow_end\b", s"$fn.end")
      val gb = raw"(?is)(GROUP\s+BY\s+)(.*?)(\s+(?:HAVING|ORDER|LIMIT)\b.*|\s*$$)".r
      gb.findFirstMatchIn(named).flatMap { g =>
        val items = g.group(2).split(",").map(_.trim).filter(_.nonEmpty)
        if (!items.exists(_.equalsIgnoreCase(s"$fn.start"))) None
        else if (sessionKeys.exists(k => !items.exists(_.equalsIgnoreCase(k)))) {
          require(false, s"SESSION TVF streaming aggregate must GROUP BY every " +
            s"PARTITION BY key (${sessionKeys.mkString(", ")}) — per-key session " +
            "merge scope cannot be widened by the aggregate")
          None
        }
        else Some(named.substring(0, g.start) + g.group(1) +
          items.flatMap {
            case i if i.equalsIgnoreCase(s"$fn.start") => Some(s"$fn($col, $args)")
            case i if i.equalsIgnoreCase(s"$fn.end") => None
            case i => Some(i)
          }.mkString(", ") + g.group(3))
      }
    }
  }

  /** SESSION lowering: the reference merges islands per partition key
    * (gap ≥ between neighbors splits); here the derived table computes
    * the identical assignment with three analytic passes over ONE
    * key-ordered exchange — break flags (lag), island ids (running
    * sum), then per-island min/max for the bounds. window_end = last
    * element + gap, window_time = end − 1 ms, per the reference.
    */
  private def sessioned(table: String, keys: Option[String], col: String,
      n: String, unit: String): String = {
    val ks = keys.toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val byKeys = if (ks.isEmpty) "" else s"PARTITION BY ${ks.mkString(", ")} "
    val island = (ks :+ "__sid").mkString(", ")
    val gap = s"INTERVAL ${n} ${unit.toUpperCase}"
    s"(SELECT __c.*, min($col) OVER __sw AS window_start, " +
      s"max($col) OVER __sw + $gap AS window_end, " +
      s"max($col) OVER __sw + $gap - INTERVAL 1 MILLISECOND AS window_time " +
      s"FROM (SELECT __m.*, sum(__brk) OVER (${byKeys}ORDER BY $col " +
      s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __sid " +
      s"FROM (SELECT *, CASE WHEN lag($col) OVER (${byKeys}ORDER BY $col) IS NULL " +
      s"OR $col - lag($col) OVER (${byKeys}ORDER BY $col) >= $gap " +
      s"THEN 1 ELSE 0 END AS __brk FROM $table) __m) __c " +
      s"WINDOW __sw AS (PARTITION BY $island))"
  }

  /** Rewrite every window-TVF call in `sql` to plain Spark SQL. */
  def rewrite(sql: String): String = {
    val t1 = Tumble.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        windowed(m.group(1), m.group(2), s"'${dur(m.group(3), m.group(4))}'")))
    val t2 = Hop.replaceAllIn(t1, m =>
      // reference arg order: slide first, size second; Spark: size, slide
      java.util.regex.Matcher.quoteReplacement(
        windowed(m.group(1), m.group(2),
          s"'${dur(m.group(5), m.group(6))}', '${dur(m.group(3), m.group(4))}'")))
    val t3 = Session.replaceAllIn(t2, m =>
      java.util.regex.Matcher.quoteReplacement(
        sessioned(m.group(1), Option(m.group(2)), m.group(3), m.group(4), m.group(5))))
    Cumulate.replaceAllIn(t3, m => {
      val (table, col) = (m.group(1), m.group(2))
      val (stepN, stepU) = (m.group(3).toLong, m.group(4).toUpperCase)
      val (maxN, maxU) = (m.group(5).toLong, m.group(6).toUpperCase)
      require(stepU == maxU && maxN % stepN == 0 && maxN > 0,
        s"CUMULATE(step INTERVAL '$stepN' $stepU, max INTERVAL '$maxN' $maxU): " +
          "max must be a positive same-unit multiple of step")
      val k = maxN / stepN
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT __b.*, __b.__w.start AS window_start, " +
          s"timestampadd($stepU, $stepN * __k, __b.__w.start) AS window_end, " +
          s"timestampadd($stepU, $stepN * __k, __b.__w.start) - INTERVAL 1 MILLISECOND AS window_time " +
          s"FROM (SELECT *, window($col, '${dur(m.group(5), maxU)}') AS __w FROM $table) __b " +
          s"LATERAL VIEW explode(sequence(1, $k)) __e AS __k " +
          s"WHERE timestampadd($stepU, $stepN * __k, __b.__w.start) > __b.$col)")
    })
  }
}
