package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}

/** MATCH_RECOGNIZE subset (ref: StreamExecMatch.scala:68 /
  * MatchCodeGenerator.scala; SQL 2016 row pattern matching): compiles a
  * PATTERN string + DEFINE predicates onto the graft NFA with SQL
  * semantics — STRICT contiguity between variables (SQL patterns match
  * consecutive rows of the ordered partition), greedy quantifiers
  * `+ * ? {n} {n,m}`, AFTER MATCH SKIP PAST LAST ROW.
  *
  * Supported: variable names, the four quantifiers, one-level patterns
  * (no alternation groups or PERMUTE). MEASURES are expressed as the
  * `measures` callback over the match bindings (RUNNING/FINAL collapse
  * to FINAL in batch/append semantics).
  */
object MatchRecognize {

  private val Token = """([A-Za-z_][A-Za-z0-9_]*)([+*?]|\{\d+(,\d+)?\})?""".r

  private[cep] def compile[T](patternStr: String, define: Map[String, T => Boolean]): Pattern[T] = {
    val stages = patternStr.trim.split("\\s+").toVector.zipWithIndex.map { case (tok, i) =>
      val (name, quant) = tok match {
        case Token(n, q, _) => (n, Option(q))
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
          inner.split(",") match {
            case Array(n)    => Quantifier.Times(n.toInt, n.toInt)
            case Array(n, m) => Quantifier.Times(n.toInt, m.toInt)
          }
      }
      Stage[T](name, pred, q,
        contiguity = if (i == 0) Contiguity.Relaxed else Contiguity.Strict,
        innerContiguity = Contiguity.Strict)
    }
    Pattern(stages, withinMs = None, afterMatch = AfterMatch.SkipPastLast)
  }

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
}
