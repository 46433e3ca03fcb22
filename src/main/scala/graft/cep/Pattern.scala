package graft.cep

import scala.concurrent.duration.Duration

/** CEP pattern definition (ref: flink-cep Pattern.java:156-480 — the
  * begin/next/followedBy/notNext/notFollowedBy/where/or/times/oneOrMore/
  * optional/consecutive/within builder surface, and aftermatch/ skip
  * strategies).
  *
  * Supported subset (documented gaps, SURVEY.md §2.11):
  *  - quantifiers: once, optional, oneOrMore, times(n), times(from,to)
  *    — greedy, first-viable-assignment (allowCombinations /
  *    followedByAny enumeration is not supported);
  *  - contiguity: strict (`next`), relaxed (`followedBy`), plus
  *    `consecutive()` internal contiguity for loops;
  *  - negation: `notNext`, `notFollowedBy` (guard between positive
  *    stages; trailing notFollowedBy requires `within`);
  *  - `within` windowing and NO_SKIP / SKIP_PAST_LAST after-match.
  */
object Quantifier {
  sealed trait Q { def min: Int; def max: Int }
  case object Once extends Q { val min = 1; val max = 1 }
  case object Optional extends Q { val min = 0; val max = 1 }
  case object OneOrMore extends Q { val min = 1; val max = Int.MaxValue }
  final case class Times(min: Int, max: Int) extends Q
}

sealed trait Contiguity
object Contiguity {
  /** `next` — the matching event must be the immediate successor. */
  case object Strict extends Contiguity
  /** `followedBy` — non-matching events may intervene. */
  case object Relaxed extends Contiguity
}

sealed trait AfterMatch
object AfterMatch {
  /** every start index may produce a match (ref: AfterMatchSkipStrategy.noSkip) */
  case object NoSkip extends AfterMatch
  /** restart after the last consumed event (ref: skipPastLastEvent) */
  case object SkipPastLast extends AfterMatch
}

/** One pattern stage. `negated` stages are guards: the pattern fails if
  * the guard matches in the gap its contiguity defines.
  */
final case class Stage[T](
    name: String,
    where: T => Boolean,
    quantifier: Quantifier.Q = Quantifier.Once,
    contiguity: Contiguity = Contiguity.Relaxed,
    /** contiguity INSIDE a loop quantifier (consecutive() ⇒ Strict) */
    innerContiguity: Contiguity = Contiguity.Relaxed,
    negated: Boolean = false
) {
  def or(p: T => Boolean): Stage[T] = copy(where = e => where(e) || p(e))
}

final case class Pattern[T](
    stages: Vector[Stage[T]],
    withinMs: Option[Long] = None,
    afterMatch: AfterMatch = AfterMatch.NoSkip
) {
  private def updLast(f: Stage[T] => Stage[T]): Pattern[T] =
    copy(stages = stages.init :+ f(stages.last))

  def where(p: T => Boolean): Pattern[T] =
    updLast(s => s.copy(where = e => s.where(e) && p(e)))
  def or(p: T => Boolean): Pattern[T] = updLast(_.or(p))

  def next(name: String): Pattern[T] =
    copy(stages = stages :+ Stage[T](name, _ => true, contiguity = Contiguity.Strict))
  def followedBy(name: String): Pattern[T] =
    copy(stages = stages :+ Stage[T](name, _ => true, contiguity = Contiguity.Relaxed))
  def notNext(name: String): Pattern[T] =
    copy(stages = stages :+ Stage[T](name, _ => true, contiguity = Contiguity.Strict, negated = true))
  def notFollowedBy(name: String): Pattern[T] =
    copy(stages = stages :+ Stage[T](name, _ => true, contiguity = Contiguity.Relaxed, negated = true))

  def optional: Pattern[T] = updLast(_.copy(quantifier = Quantifier.Optional))
  def oneOrMore: Pattern[T] = updLast(_.copy(quantifier = Quantifier.OneOrMore))
  def times(n: Int): Pattern[T] = updLast(_.copy(quantifier = Quantifier.Times(n, n)))
  def times(from: Int, to: Int): Pattern[T] = updLast(_.copy(quantifier = Quantifier.Times(from, to)))
  /** strict contiguity inside the preceding loop quantifier */
  def consecutive: Pattern[T] = updLast(_.copy(innerContiguity = Contiguity.Strict))

  def within(d: Duration): Pattern[T] = copy(withinMs = Some(d.toMillis))
  def afterMatchSkipPastLast: Pattern[T] = copy(afterMatch = AfterMatch.SkipPastLast)
}

object Pattern {
  def begin[T](name: String): Pattern[T] =
    Pattern(Vector(Stage[T](name, _ => true, contiguity = Contiguity.Relaxed)))
}

/** A completed match: stage name → matched events in order. */
final case class PatternMatch[T](bindings: Map[String, Seq[T]], startIdx: Int, endIdx: Int)
