package graft.cep

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** SQL-statement route for MATCH_RECOGNIZE — the reference accepts row
  * pattern matching as a SQL clause (ref: StreamExecMatch.scala:68 via
  * the Calcite SqlMatchRecognize parse node), and a real user's first
  * CEP attempt is the SQL statement, not the builder API. This is a
  * LIGHT pre-parser: it recognizes the one construct Catalyst cannot
  * parse, lowers it onto the already-oracled [[MatchRecognize]] /
  * [[NFA]] machinery, and hands everything around it back to Spark SQL.
  *
  * Supported clause subset (documented, erroring loudly otherwise):
  *
  *  - `PARTITION BY c1[, c2…]` — plain columns;
  *  - `ORDER BY c1[, c2…]` — plain columns, ascending (the SQL default;
  *    row-pattern order is the within-partition sort);
  *  - `MEASURES m AS name, …` with m ∈ `FIRST(V.c)`, `LAST(V.c)`,
  *    `V.c` (≡ FINAL LAST, the SQL:2016 default), `COUNT(V.*)`,
  *    `COUNT(*)`, `SUM(V.c)`, `MIN(V.c)`, `MAX(V.c)`, and — under ALL
  *    ROWS PER MATCH — `CLASSIFIER()` and `RUNNING COUNT(*)`;
  *  - `ONE ROW PER MATCH` (default) or `ALL ROWS PER MATCH` (one output
  *    row per MATCHED event: every input column + the measures, with
  *    CLASSIFIER/RUNNING evaluated per row and aggregates FINAL);
  *  - `WITHIN INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY` — the match window
  *    anchored at the match start, clocked by the first ORDER BY column
  *    cast to timestamp;
  *  - `AFTER MATCH SKIP PAST LAST ROW` / `AFTER MATCH SKIP TO NEXT ROW`;
  *  - `PATTERN (…)` — the full [[MatchRecognize.compileMulti]] grammar:
  *    quantifiers `+ * ? {n} {n,m} {n,}` (greedy + reluctant),
  *    alternation groups, PERMUTE;
  *  - `DEFINE V AS <spark-sql boolean expr>, …` — row-local predicates
  *    (PREV/NEXT navigation stays on the builder API); a pattern
  *    variable without a DEFINE matches any row (SQL semantics).
  *
  * Execution shape (100 TB posture): DEFINE predicates are evaluated
  * ONCE as boolean columns by Catalyst codegen — the NFA never
  * re-evaluates SQL per transition attempt; then one shuffle on the
  * partition keys, a within-partition sort, and group-local matching
  * via mapPartitions with key-change detection (the secondary-sort
  * shape — no per-key collect, embarrassingly parallel across keys,
  * same as [[CEP.batchFlatMulti]]).
  */
object MatchRecognizeSql {

  /** Does this statement contain a MATCH_RECOGNIZE clause? (word-bounded,
    * case-insensitive — a column named `match_recognized` must not trip it)
    */
  def applies(sql: String): Boolean =
    "(?i)\\bMATCH_RECOGNIZE\\s*\\(".r.findFirstIn(sql).isDefined

  private[cep] final case class Measure(name: String, fn: String, variable: String, column: String)

  private[cep] final case class Spec(
      table: String,
      partitionBy: Seq[String],
      orderBy: Seq[String],
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
    // the FROM operand is the token chain immediately before MATCH_RECOGNIZE
    val before = sql.substring(0, m.start)
    val tableRx = "(?is).*\\bFROM\\s+([A-Za-z_][\\w.]*)\\s*$".r
    val table = before match {
      case tableRx(t) => t
      case _ => throw new IllegalArgumentException(
        "MATCH_RECOGNIZE must directly follow 'FROM <table>' (subquery operands: use the builder API)")
    }
    val spec = parseBlock(table, block)
    val out = execute(spark, spark.table(spec.table), spec)
    // splice: FROM <table> MATCH_RECOGNIZE (...) → FROM <view>, then hand
    // the surrounding statement back to Catalyst. The FROM located by
    // the anchored regex, not a substring search — an identifier merely
    // CONTAINING "from" must not be the splice point.
    val view = s"__mr_${math.abs(sql.hashCode).toString}"
    out.createOrReplaceTempView(view)
    val fromAt = ("(?is)\\bFROM\\s+" + java.util.regex.Pattern.quote(table) + "\\s*$").r
      .findFirstMatchIn(before).get.start
    val outer = before.substring(0, fromAt) + s"FROM $view " + sql.substring(i + 1)
    spark.sql(outer)
  }

  // ---------------------------------------------------------------- //
  // parsing                                                          //
  // ---------------------------------------------------------------- //

  private def clause(block: String, kw: String, stopKws: Seq[String]): Option[String] = {
    val start = ("(?is)\\b" + kw + "\\b").r.findFirstMatchIn(block).map(_.end).getOrElse(return None)
    val rest = block.substring(start)
    val stops = stopKws.flatMap(k => ("(?is)\\b" + k + "\\b").r.findFirstMatchIn(rest).map(_.start))
    Some(rest.substring(0, if (stops.isEmpty) rest.length else stops.min).trim)
  }

  private val clauseKws = Seq("PARTITION\\s+BY", "ORDER\\s+BY", "MEASURES",
    "ONE\\s+ROW\\s+PER\\s+MATCH", "ALL\\s+ROWS\\s+PER\\s+MATCH",
    "AFTER\\s+MATCH", "PATTERN", "DEFINE", "WITHIN")

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
    def c(kw: String) = clause(block, kw, clauseKws.filterNot(_ == kw))
    val allRows = c("ALL\\s+ROWS\\s+PER\\s+MATCH").isDefined
    val withinMs = c("WITHIN").map {
      case WithinRx(n, unit) =>
        n.toLong * (unit.toUpperCase match {
          case "SECOND" => 1000L
          case "MINUTE" => 60000L
          case "HOUR"   => 3600000L
          case "DAY"    => 86400000L
        })
      case other => throw new IllegalArgumentException(
        s"unsupported WITHIN: '$other' (expected INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY)")
    }
    val partitionBy = c("PARTITION\\s+BY").map(splitTop(_).map(_.trim))
      .getOrElse(throw new IllegalArgumentException("PARTITION BY is required"))
    val orderBy = c("ORDER\\s+BY").map(splitTop(_).map(_.trim))
      .getOrElse(throw new IllegalArgumentException("ORDER BY is required"))
    val measuresRaw = c("MEASURES")
      .getOrElse(throw new IllegalArgumentException("MEASURES is required"))
    val rx = MeasureRx.r
    val classifierRx = "(?is)^CLASSIFIER\\s*\\(\\s*\\)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val rcountRx = "(?is)^RUNNING\\s+COUNT\\s*\\(\\s*\\*\\s*\\)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val measures = splitTop(measuresRaw).map {
      case classifierRx(name) =>
        require(allRows, s"CLASSIFIER() ($name) is only meaningful under ALL ROWS PER MATCH")
        Measure(name, "CLASSIFIER", "", "")
      case rcountRx(name) =>
        require(allRows, s"RUNNING COUNT(*) ($name) is only meaningful under ALL ROWS PER MATCH")
        Measure(name, "RCOUNT", "", "")
      case rx(fn, v, colName, name) =>
        val f = Option(fn).map(_.toUpperCase).getOrElse("LAST")
        require(colName != "*" || f == "COUNT", s"bare * only under COUNT: $name")
        require(v != null || f == "COUNT" || colName != "*",
          s"measure $name needs a pattern-variable qualifier")
        Measure(name, f, Option(v).getOrElse(""), colName)
      case other => throw new IllegalArgumentException(
        s"unsupported MEASURES item: '$other' (supported: FIRST/LAST/COUNT/SUM/MIN/MAX of V.col, V.col, COUNT(*))")
    }
    val skip = c("AFTER\\s+MATCH").map(_.toUpperCase.replaceAll("\\s+", " ").trim) match {
      case None | Some("SKIP PAST LAST ROW") => AfterMatch.SkipPastLast
      case Some("SKIP TO NEXT ROW")          => AfterMatch.NoSkip
      case Some(other) => throw new IllegalArgumentException(s"unsupported AFTER MATCH: $other")
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
  // execution                                                        //
  // ---------------------------------------------------------------- //

  private def execute(spark: SparkSession, df: DataFrame, spec: Spec): DataFrame = {
    // pattern variables, in appearance order
    val vars = "[A-Za-z_]\\w*".r.findAllIn(spec.pattern)
      .filterNot(_.equalsIgnoreCase("PERMUTE")).distinct.toVector
    spec.define.keys.foreach(v => require(vars.contains(v),
      s"DEFINE for unknown pattern variable $v"))
    // DEFINE predicates evaluated ONCE by Catalyst codegen as boolean
    // columns — the NFA reads a precomputed flag per transition, never
    // re-evaluating SQL. Undefined variables match any row (SQL default).
    val aug0 = vars.foldLeft(df) { (d, v) =>
      d.withColumn(s"__def_$v", expr(spec.define.getOrElse(v, "true")).cast("boolean"))
    }
    // WITHIN needs real event time: the first ORDER BY column (cast to
    // timestamp) becomes the NFA's microsecond clock
    val aug = spec.withinMs match {
      case Some(_) => aug0.withColumn("__ord_us",
        expr(s"unix_micros(cast(${spec.orderBy.head} AS TIMESTAMP))"))
      case None => aug0
    }
    val partExprs: Seq[Column] = spec.partitionBy.map(col)
    val sortExprs: Seq[Column] = (spec.partitionBy ++ spec.orderBy).map(col)
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
        case "SUM" => inField(ms.column).dataType match {
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
    val patterns = MatchRecognize.compileMulti[Row](
      spec.pattern,
      vars.map(v => v -> ((r: Row) => !r.isNullAt(defIdx(v)) && r.getBoolean(defIdx(v)))).toMap,
      spec.skip).map(_.copy(withinMs = spec.withinMs))
    val measures = spec.measures
    val allRows = spec.allRows
    val ordUsIdx = if (spec.withinMs.isDefined) schema.fieldIndex("__ord_us") else -1
    val tsFn: Row => Long =
      if (ordUsIdx >= 0) (r: Row) => r.getLong(ordUsIdx) else (_: Row) => 0L
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
            val matchVals = measures.map { ms =>
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
                    val ord: Ordering[Any] = inField(ms.column).dataType match {
                      case ByteType | ShortType | IntegerType | LongType =>
                        Ordering.by((a: Any) => a.asInstanceOf[Number].longValue)
                      case FloatType | DoubleType =>
                        Ordering.by((a: Any) => a.asInstanceOf[Number].doubleValue)
                      case StringType => Ordering.by((a: Any) => a.asInstanceOf[String])
                      case TimestampType => Ordering.by((a: Any) => a.asInstanceOf[java.sql.Timestamp].getTime)
                      case dt => throw new IllegalArgumentException(s"MIN/MAX unsupported over $dt")
                    }
                    if (ms.fn == "MIN") xs.min(ord) else xs.max(ord)
                  }
                case "CLASSIFIER" | "RCOUNT" => null // per-row, overlaid below
              }
            }
            if (!allRows) Seq(Row.fromSeq(key ++ matchVals))
            else pm.rows.zipWithIndex.map { case ((cls, row), i) =>
              val overlaid = measures.zip(matchVals).map {
                case (ms, _) if ms.fn == "CLASSIFIER" => cls
                case (ms, _) if ms.fn == "RCOUNT"     => (i + 1).toLong
                case (_, v)                           => v
              }
              Row.fromSeq(origCols.map(c => row.get(colIdx(c))) ++ overlaid)
            }
          }
      }
    }(Encoders.row(outSchema))
    out
  }
}
