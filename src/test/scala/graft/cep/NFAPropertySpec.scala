package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.concurrent.duration._

/** Property test: the NFA's relaxed two-stage matching must agree with
  * an independently-written brute-force reference on random event
  * sequences (the reference enumerates start indices and scans — no
  * shared code with the NFA's recursive matcher).
  */
class NFAPropertySpec extends AnyFunSuite {

  /** deterministic sampling loop (scalatestplus bridge is not in the
    * offline cache — drive scalacheck's Gen directly) */
  private def forAll(gen: Gen[IndexedSeq[(Long, String)]])(body: IndexedSeq[(Long, String)] => Unit): Unit =
    (0 until 300).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private type E = (Long, String)
  private def ts(e: E): Long = e._1

  private val eventsGen: Gen[IndexedSeq[E]] =
    Gen.listOf(Gen.oneOf("A", "B", "X")).map(_.zipWithIndex.map {
      case (l, i) => (i.toLong * 10, l)
    }.toIndexedSeq)

  /** Brute force: for each index holding A, the match is the first B at
    * or after the next index within the window; NoSkip semantics.
    */
  private def bruteForce(events: IndexedSeq[E], withinMs: Option[Long]): Seq[(Int, Int)] =
    events.indices.flatMap { i =>
      if (events(i)._2 != "A") None
      else {
        val deadline = withinMs.map(ts(events(i)) + _).getOrElse(Long.MaxValue)
        ((i + 1) until events.length)
          .find(j => events(j)._2 == "B" && ts(events(j)) <= deadline)
          .map(j => (i, j))
      }
    }

  test("A followedBy B agrees with brute force (no window)") {
    val p = Pattern.begin[E]("a").where(_._2 == "A").followedBy("b").where(_._2 == "B")
    forAll(eventsGen) { events =>
      val nfa = NFA.findMatches(events, ts, p).map(m => (m.startIdx, m.endIdx))
      assert(nfa === bruteForce(events, None))
    }
  }

  test("A followedBy B agrees with brute force (25ms window)") {
    val p = Pattern.begin[E]("a").where(_._2 == "A").followedBy("b").where(_._2 == "B")
      .within(25.millis)
    forAll(eventsGen) { events =>
      val nfa = NFA.findMatches(events, ts, p).map(m => (m.startIdx, m.endIdx))
      assert(nfa === bruteForce(events, Some(25L)))
    }
  }

  test("A followedByAny B enumerates exactly the all-pairs brute force (25ms window)") {
    val p = Pattern.begin[E]("a").where(_._2 == "A").followedByAny("b").where(_._2 == "B")
      .within(25.millis)
    forAll(eventsGen) { events =>
      val nfa = NFA.findAllMatches(events, ts, p)
        .map(m => (m.indices("a").head, m.indices("b").head))
      // independent model: EVERY (A, later B within window) pair
      val ref = for {
        i <- events.indices if events(i)._2 == "A"
        j <- (i + 1) until events.length
        if events(j)._2 == "B" && ts(events(j)) <= ts(events(i)) + 25L
      } yield (i, j)
      assert(nfa.sorted === ref.sorted)
    }
  }

  test("strict A next B agrees with adjacency brute force") {
    val p = Pattern.begin[E]("a").where(_._2 == "A").next("b").where(_._2 == "B")
    forAll(eventsGen) { events =>
      val nfa = NFA.findMatches(events, ts, p).map(m => (m.startIdx, m.endIdx))
      val ref = events.indices.dropRight(1)
        .filter(i => events(i)._2 == "A" && events(i + 1)._2 == "B")
        .map(i => (i, i + 1))
      assert(nfa === ref)
    }
  }

  test("findWithTimeouts partitions NoSkip starts: match XOR partial XOR unexpired") {
    // under end-of-time horizon every A-start is EITHER a full match
    // start OR exactly one partial's start; under a finite horizon the
    // partial set shrinks to the expired starts and is monotone in the
    // horizon. Partial bindings must be the {a}-prefix exactly.
    val p = Pattern.begin[E]("a").where(_._2 == "A")
      .followedBy("b").where(_._2 == "B").within(50.millis) // ts unit ms, window 50
    forAll(eventsGen) { events =>
      val (full, part) = NFA.findWithTimeouts(events, ts, p)
      val fullStarts = full.map(_.startIdx).toSet
      val partStarts = part.map(_.startIdx)
      val aStarts = events.indices.filter(events(_)._2 == "A").toSet
      assert(partStarts.distinct == partStarts, "duplicate partials per start")
      assert(fullStarts.intersect(partStarts.toSet).isEmpty)
      assert(fullStarts ++ partStarts == aStarts,
        s"every A start must match or time out at end of input")
      assert(part.forall(_.bindings.keySet == Set("a")))
      // horizon monotonicity + expiry gating
      val horizons = Seq(0L, 40L, 80L, 200L, Long.MaxValue)
      val sets = horizons.map(h =>
        NFA.findWithTimeouts(events, ts, p, horizonTs = h)._2.map(_.startIdx).toSet)
      sets.sliding(2).foreach { case Seq(lo, hi) => assert(lo.subsetOf(hi)); case _ => }
      // a partial appears at horizon h iff its deadline passed
      horizons.zip(sets).foreach { case (h, set) =>
        set.foreach(i => assert(ts(events(i)) + 50 <= h))
      }
    }
  }
}
