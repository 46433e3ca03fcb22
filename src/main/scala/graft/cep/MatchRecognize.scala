package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}

/** MATCH_RECOGNIZE subset (ref: StreamExecMatch.scala:68 /
  * MatchCodeGenerator.scala; SQL 2016 row pattern matching): compiles a
  * PATTERN string + DEFINE predicates onto the graft NFA with SQL
  * semantics — STRICT contiguity between variables (SQL patterns match
  * consecutive rows of the ordered partition), greedy quantifiers
  * `+ * ? {n} {n,m} {n,}` plus their reluctant `?`-suffixed forms
  * (`+? *? {n,m}?`), AFTER MATCH SKIP PAST LAST ROW.
  *
  * Supported: variable names, quantifiers as above, one-level patterns
  * (no alternation groups or PERMUTE). ONE ROW PER MATCH measures are
  * the `measures` callback over the match bindings (FINAL semantics);
  * ALL ROWS PER MATCH with RUNNING vs FINAL aggregates and CLASSIFIER()
  * is [[allRows]].
  */
object MatchRecognize {

  private val Token = """([A-Za-z_][A-Za-z0-9_]*)([+*?]|\{\d+(,\d*)?\})?(\?)?""".r

  private[cep] def compile[T](patternStr: String, define: Map[String, T => Boolean]): Pattern[T] = {
    val stages = patternStr.trim.split("\\s+").toVector.zipWithIndex.map { case (tok, i) =>
      val (name, quant, reluctant) = tok match {
        case Token(n, q, _, r) => (n, Option(q), r != null)
        case _ => throw new IllegalArgumentException(s"bad pattern token: $tok")
      }
      val pred = define.getOrElse(name,
        throw new IllegalArgumentException(s"no DEFINE for pattern variable $name"))
      val q = quant match {
        case None        => Quantifier.Once
        case Some("+")   => Quantifier.OneOrMore
        case Some("*")   => Quantifier.Times(0, Int.MaxValue)
        case Some("?")   => Quantifier.Optional
        case Some(braces) =>
          val inner = braces.stripPrefix("{").stripSuffix("}")
          inner.split(",", -1) match {
            case Array(n)     => Quantifier.Times(n.toInt, n.toInt)
            case Array(n, "") => Quantifier.Times(n.toInt, Int.MaxValue) // {n,}
            case Array(n, m)  => Quantifier.Times(n.toInt, m.toInt)
          }
      }
      Stage[T](name, pred, q,
        contiguity = if (i == 0) Contiguity.Relaxed else Contiguity.Strict,
        innerContiguity = Contiguity.Strict,
        greedy = !reluctant)
    }
    Pattern(stages, withinMs = None, afterMatch = AfterMatch.SkipPastLast)
  }

  /** Per-row measures context for ALL ROWS PER MATCH (ref:
    * StreamExecMatch RUNNING/FINAL handling; SQL:2016): `classifier` =
    * CLASSIFIER(), `runningCnt` = RUNNING count(*) — rows of the match up
    * to and including this one — and `finalCnt` = FINAL count(*).
    */
  final case class RowCtx(classifier: String, runningCnt: Long, finalCnt: Long)

  /** Batch row-pattern matching over each partition ordered by event
    * time (ref: batch MATCH_RECOGNIZE path).
    */
  def apply[T, K: Encoder, O: Encoder](
      ds: Dataset[T],
      partitionBy: T => K,
      orderTsUs: T => Long,
      pattern: String,
      define: Map[String, T => Boolean],
      measures: (K, PatternMatch[T]) => O
  ): Dataset[O] =
    CEP.batch(ds, partitionBy, orderTsUs, compile(pattern, define), measures)

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
      measures: (K, T, RowCtx) => O
  ): Dataset[O] =
    CEP.batchFlat(ds, partitionBy, orderTsUs, compile(pattern, define),
      (k: K, m: PatternMatch[T]) => {
        val rows = m.rows
        rows.zipWithIndex.map { case ((cls, e), i) =>
          measures(k, e, RowCtx(cls, i + 1L, rows.size.toLong))
        }
      })
}
