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

  def applies(sql: String): Boolean =
    Tumble.findFirstIn(sql).isDefined || Hop.findFirstIn(sql).isDefined ||
      Cumulate.findFirstIn(sql).isDefined

  private def dur(n: String, unit: String): String = s"$n ${unit.toLowerCase}"

  private def windowed(table: String, col: String, winArgs: String): String =
    s"(SELECT __b.*, __b.__w.start AS window_start, __b.__w.end AS window_end, " +
      s"__b.__w.end - INTERVAL 1 MILLISECOND AS window_time " +
      s"FROM (SELECT *, window($col, $winArgs) AS __w FROM $table) __b)"

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
    Cumulate.replaceAllIn(t2, m => {
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
