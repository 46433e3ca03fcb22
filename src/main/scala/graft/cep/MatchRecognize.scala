package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}

/** MATCH_RECOGNIZE subset (ref: StreamExecMatch.scala:68 /
  * MatchCodeGenerator.scala; SQL 2016 row pattern matching): compiles a
  * PATTERN string + DEFINE predicates onto the graft NFA with SQL
  * semantics — STRICT contiguity between variables (SQL patterns match
  * consecutive rows of the ordered partition), greedy quantifiers
  * `+ * ? {n} {n,m} {n,}` plus their reluctant `?`-suffixed forms
  * (`+? *? {n,m}?`), alternation groups `(A|B)` (an event binds under
  * the first alternative whose DEFINE accepts it — SQL lexicographic
  * preference), `PERMUTE(A,B,...)` (expanded, like the reference's
  * NFACompiler, into the lexicographically-ordered permutation
  * alternatives), and AFTER MATCH SKIP PAST LAST ROW / SKIP TO NEXT ROW.
  *
  * ONE ROW PER MATCH measures are the `measures` callback over the match
  * bindings (FINAL semantics); ALL ROWS PER MATCH with RUNNING vs FINAL
  * aggregates and CLASSIFIER() is [[allRows]].
  */
object MatchRecognize {

  private val Token        = """([A-Za-z_][A-Za-z0-9_]*)([+*?]|\{\d+(,\d*)?\})?(\?)?""".r
  private val GroupToken   = """\(([A-Za-z0-9_|]+)\)([+*?]|\{\d+(,\d*)?\})?(\?)?""".r
  private val PermuteToken = """PERMUTE\(([A-Za-z0-9_,]+)\)""".r

  private def quantOf(quant: Option[String]): Quantifier.Q = quant match {
    case None      => Quantifier.Once
    case Some("+") => Quantifier.OneOrMore
    case Some("*") => Quantifier.Times(0, Int.MaxValue)
    case Some("?") => Quantifier.Optional
    case Some(braces) =>
      val inner = braces.stripPrefix("{").stripSuffix("}")
      inner.split(",", -1) match {
        case Array(n)     => Quantifier.Times(n.toInt, n.toInt)
        case Array(n, "") => Quantifier.Times(n.toInt, Int.MaxValue) // {n,}
        case Array(n, m)  => Quantifier.Times(n.toInt, m.toInt)
      }
  }

  /** Compile to preference-ordered pattern alternatives — one for a plain
    * sequence, k!·… for PERMUTE factors (cross product keeps declared
    * order = SQL lexicographic preference).
    */
  private[cep] def compileMulti[T](patternStr: String,
      define: Map[String, T => Boolean]): Seq[Pattern[T]] =
    compileMulti(patternStr, define, AfterMatch.SkipPastLast,
      Map.empty[String, (T, MatchContext[T]) => Boolean])

  private[cep] def compileMulti[T](patternStr: String,
      define: Map[String, T => Boolean], afterMatch: AfterMatch): Seq[Pattern[T]] =
    compileMulti(patternStr, define, afterMatch,
      Map.empty[String, (T, MatchContext[T]) => Boolean])

  private[cep] def compileMulti[T](
      patternStr: String,
      define: Map[String, T => Boolean],
      afterMatch: AfterMatch,
      /** ITERATIVE defines (ref: IterativeCondition.java:65-85; SQL
        * DEFINE with FIRST/LAST navigation): evaluated with the partial
        * match's [[MatchContext]], ANDed with the row-local define.
        * Plain variables only — alternation-group members keep
        * row-local semantics. */
      defineCtx: Map[String, (T, MatchContext[T]) => Boolean]): Seq[Pattern[T]] = {
    def predOf(name: String): T => Boolean = define.getOrElse(name,
      throw new IllegalArgumentException(s"no DEFINE for pattern variable $name"))
    // normalize whitespace inside (A | B) / PERMUTE(A, B) so tokens split
    // on spaces — including between the PERMUTE keyword and its paren,
    // or 'PERMUTE (A,B)' would tokenize as a bare variable PERMUTE and
    // fail with a misleading "no DEFINE" error
    val norm = patternStr.trim
      .replaceAll("\\s*\\|\\s*", "|")
      .replaceAll("PERMUTE\\s+\\(", "PERMUTE(")
      .replaceAll("\\(\\s*", "(").replaceAll("\\s*\\)", ")")
      .replaceAll("\\s*,\\s*", ",")
    val perTok: Vector[Seq[Vector[Stage[T]]]] = norm.split("\\s+").toVector.map {
      case PermuteToken(vars) =>
        val names = vars.split(",").toVector
        names.permutations.toSeq.map(_.map(n =>
          Stage[T](n, predOf(n), Quantifier.Once, innerContiguity = Contiguity.Strict,
            whereCtx = defineCtx.get(n))))
      case GroupToken(alts, q, _, r) =>
        val names = alts.split("\\|").toSeq
        Seq(Vector(Stage.oneOf(names.map(n => n -> predOf(n)), Contiguity.Strict)
          .copy(quantifier = quantOf(Option(q)),
            innerContiguity = Contiguity.Strict, greedy = r == null)))
      case Token(n, q, _, r) =>
        Seq(Vector(Stage[T](n, predOf(n), quantOf(Option(q)),
          innerContiguity = Contiguity.Strict, greedy = r == null,
          whereCtx = defineCtx.get(n))))
      case tok => throw new IllegalArgumentException(s"bad pattern token: $tok")
    }
    if (defineCtx.nonEmpty) {
      // a variable matched INSIDE an alternation group evaluates without
      // the context — if it also appears as a plain token the old
      // carried-set check passed while group-branch rows silently
      // skipped the iterative condition; reject group membership itself
      val groupMembers = norm.split("\\s+").toSeq.collect {
        case GroupToken(alts, _, _, _) => alts.split("\\|").toSeq
      }.flatten.toSet
      val carried = perTok.flatten.flatten.filter(_.whereCtx.isDefined).map(_.name).toSet
      defineCtx.keys.foreach { v =>
        require(!groupMembers.contains(v),
          s"iterative DEFINE for $v: $v also matches inside an alternation group, " +
            "where navigation is unsupported — rewrite the group or keep the define row-local")
        require(carried.contains(v),
          s"iterative DEFINE for $v: only plain pattern variables support navigation " +
            "(alternation-group members keep row-local defines)")
      }
    }
    val seqs = perTok.foldLeft(Seq(Vector.empty[Stage[T]])) { (accs, alts) =>
      for (a <- accs; b <- alts) yield a ++ b
    }
    seqs.map { stages =>
      val adjusted = stages.zipWithIndex.map { case (st, i) =>
        st.copy(contiguity = if (i == 0) Contiguity.Relaxed else Contiguity.Strict)
      }
      Pattern(adjusted, withinMs = None, afterMatch = afterMatch)
    }
  }

  private[cep] def compile[T](patternStr: String, define: Map[String, T => Boolean]): Pattern[T] = {
    val ps = compileMulti(patternStr, define)
    require(ps.size == 1, "PERMUTE patterns expand to multiple candidates — use the multi-candidate entry points")
    ps.head
  }

  /** Per-row measures context for ALL ROWS PER MATCH (ref:
    * StreamExecMatch RUNNING/FINAL handling; SQL:2016): `classifier` =
    * CLASSIFIER(), `runningCnt` = RUNNING count(*) — rows of the match up
    * to and including this one — `finalCnt` = FINAL count(*), and
    * `prev`/`next` = the PREV()/NEXT() navigation offsets over the
    * match's rows (None off either end, like SQL's null).
    */
  final case class RowCtx(classifier: String, runningCnt: Long, finalCnt: Long,
      matchRows: Seq[(String, Any)] = Nil) {
    private def at(i: Long): Option[Any] =
      if (i >= 0 && i < matchRows.length) Some(matchRows(i.toInt)._2) else None
    /** PREV(expr, n): the row `n` positions earlier in the match */
    def prev(n: Int = 1): Option[Any] = at(runningCnt - 1 - n)
    /** NEXT(expr, n): the row `n` positions later in the match */
    def next(n: Int = 1): Option[Any] = at(runningCnt - 1 + n)
  }

  /** Batch row-pattern matching over each partition ordered by event
    * time (ref: batch MATCH_RECOGNIZE path). `skip` selects the AFTER
    * MATCH strategy (SKIP PAST LAST ROW by default; NoSkip = SKIP TO
    * NEXT ROW).
    */
  def apply[T, K: Encoder, O: Encoder](
      ds: Dataset[T],
      partitionBy: T => K,
      orderTsUs: T => Long,
      pattern: String,
      define: Map[String, T => Boolean],
      measures: (K, PatternMatch[T]) => O,
      skip: AfterMatch = AfterMatch.SkipPastLast
  ): Dataset[O] =
    CEP.batchFlatMulti(ds, partitionBy, orderTsUs, compileMulti(pattern, define, skip),
      (k: K, m: PatternMatch[T]) => Seq(measures(k, m)))

  /** ALL ROWS PER MATCH: one output row per MATCHED event (rows skipped
    * by the initial relaxed scan are not part of the match), with
    * RUNNING/FINAL counts and CLASSIFIER supplied per row.
    */
  def allRows[T, K: Encoder, O: Encoder](
      ds: Dataset[T],
      partitionBy: T => K,
      orderTsUs: T => Long,
      pattern: String,
      define: Map[String, T => Boolean],
      measures: (K, T, RowCtx) => O,
      skip: AfterMatch = AfterMatch.SkipPastLast
  ): Dataset[O] =
    CEP.batchFlatMulti(ds, partitionBy, orderTsUs, compileMulti(pattern, define, skip),
      (k: K, m: PatternMatch[T]) => {
        val rows = m.rows
        val ctxRows = rows.map { case (c, e) => (c, e: Any) }
        rows.zipWithIndex.map { case ((cls, e), i) =>
          measures(k, e, RowCtx(cls, i + 1L, rows.size.toLong, ctxRows))
        }
      })
}
