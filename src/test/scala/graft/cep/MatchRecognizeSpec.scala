package graft.cep

import graft.SparkSpec
import graft.streaming.Event
import java.sql.Timestamp

class MatchRecognizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, tsMs: Long, typ: String) =
    Event(id, new Timestamp(tsMs), 1L, typ, 1.0)

  test("pattern compiler: quantifiers and strict contiguity") {
    val p = MatchRecognize.compile[Event]("A B+ C? D{2}", Map(
      "A" -> (_.event_type == "a"), "B" -> (_.event_type == "b"),
      "C" -> (_.event_type == "c"), "D" -> (_.event_type == "d")))
    assert(p.stages.map(_.name) === Vector("A", "B", "C", "D"))
    assert(p.stages(1).quantifier === Quantifier.OneOrMore)
    assert(p.stages(2).quantifier === Quantifier.Optional)
    assert(p.stages(3).quantifier === Quantifier.Times(2, 2))
    assert(p.stages(1).contiguity === Contiguity.Strict)
    assert(p.stages(1).innerContiguity === Contiguity.Strict)
    assert(p.afterMatch === AfterMatch.SkipPastLast)
  }

  test("SQL semantics: consecutive rows only, greedy runs, skip past last") {
    val events = Seq(
      ev(1, 1000, "s"), ev(2, 2000, "p"), ev(3, 3000, "p"), // S P P  → one match, 2 purchases
      ev(4, 4000, "x"), // breaks
      ev(5, 5000, "s"), ev(6, 6000, "x"), // S then non-P adjacent → no match (strict)
      ev(7, 7000, "s"), ev(8, 8000, "p") // S P
    ).toDS()
    val out = MatchRecognize[Event, Long, (Long, Long)](
      events, _.user_id, _.tsUs, "S P+",
      Map("S" -> (_.event_type == "s"), "P" -> (_.event_type == "p")),
      (_, m) => (m.bindings("S").head.event_id, m.bindings("P").length.toLong))
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L), (7L, 1L)))
  }

  test("pattern compiler: {n,} open ranges and reluctant quantifiers") {
    val p = MatchRecognize.compile[Event]("A{2,} B+? C*?", Map(
      "A" -> (_.event_type == "a"), "B" -> (_.event_type == "b"),
      "C" -> (_.event_type == "c")))
    assert(p.stages(0).quantifier === Quantifier.Times(2, Int.MaxValue))
    assert(p.stages(0).greedy)
    assert(p.stages(1).quantifier === Quantifier.OneOrMore)
    assert(!p.stages(1).greedy)
    assert(p.stages(2).quantifier === Quantifier.Times(0, Int.MaxValue))
    assert(!p.stages(2).greedy)
  }

  test("ALL ROWS PER MATCH: CLASSIFIER + RUNNING vs FINAL count") {
    val events = Seq(
      ev(1, 1000, "p"), ev(2, 2000, "p"), ev(3, 3000, "b"), // P P B
      ev(4, 4000, "x"),
      ev(5, 5000, "p"), ev(6, 6000, "b") // P B
    ).toDS()
    val out = MatchRecognize.allRows[Event, Long, (Long, String, Long, Long)](
      events, _.user_id, _.tsUs, "P+ B",
      Map("P" -> (_.event_type == "p"), "B" -> (_.event_type == "b")),
      (_, e, ctx) => (e.event_id, ctx.classifier, ctx.runningCnt, ctx.finalCnt))
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "P", 1L, 3L), (2L, "P", 2L, 3L), (3L, "B", 3L, 3L),
      (5L, "P", 1L, 2L), (6L, "B", 2L, 2L)))
  }

  test("alternation group: event binds under first matching alternative, loops allowed") {
    val events = Seq(
      ev(1, 1000, "a"), ev(2, 2000, "b"), ev(3, 3000, "a"), ev(4, 4000, "p"), // (a|b)+ p
      ev(5, 5000, "x"),
      ev(6, 6000, "b"), ev(7, 7000, "p")
    ).toDS()
    val out = MatchRecognize.allRows[Event, Long, (Long, String)](
      events, _.user_id, _.tsUs, "(A|B)+ P",
      Map("A" -> (_.event_type == "a"), "B" -> (_.event_type == "b"),
        "P" -> (_.event_type == "p")),
      (_, e, ctx) => (e.event_id, ctx.classifier))
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "A"), (2L, "B"), (3L, "A"), (4L, "P"),
      (6L, "B"), (7L, "P")))
  }

  test("alternation preference: overlapping defines classify as the FIRST alternative") {
    val events = Seq(ev(1, 1000, "a"), ev(2, 2000, "p")).toDS()
    val out = MatchRecognize.allRows[Event, Long, (Long, String)](
      events, _.user_id, _.tsUs, "(X|Y) P",
      Map("X" -> (_.event_type == "a"), "Y" -> (_.event_type == "a"), // both match
        "P" -> (_.event_type == "p")),
      (_, e, ctx) => (e.event_id, ctx.classifier))
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "X"), (2L, "P")))
  }

  test("PERMUTE matches any order; candidates tried lexicographically") {
    val events = Seq(
      ev(1, 1000, "a"), ev(2, 2000, "b"), // A B
      ev(3, 3000, "x"),
      ev(4, 4000, "b"), ev(5, 5000, "a") // B A
    ).toDS()
    val out = MatchRecognize[Event, Long, (Long, Long, String)](
      events, _.user_id, _.tsUs, "PERMUTE(A,B)",
      Map("A" -> (_.event_type == "a"), "B" -> (_.event_type == "b")),
      (_, m) => {
        val rows = m.rows
        (rows.head._2.event_id, rows.last._2.event_id,
          rows.map(_._1).mkString)
      })
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, "AB"), (4L, 5L, "BA")))
  }

  test("PERMUTE tolerates whitespace before its parenthesis") {
    val events = Seq(ev(1, 1000, "a"), ev(2, 2000, "b")).toDS()
    val out = MatchRecognize[Event, Long, (Long, Long)](
      events, _.user_id, _.tsUs, "PERMUTE (A, B)",
      Map("A" -> (_.event_type == "a"), "B" -> (_.event_type == "b")),
      (_, m) => (m.rows.head._2.event_id, m.rows.last._2.event_id))
      .collect()
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("PREV/NEXT navigate the match's own rows, null off the ends") {
    val events = Seq(ev(1, 1000, "p"), ev(2, 2000, "p"), ev(3, 3000, "b")).toDS()
    val out = MatchRecognize.allRows[Event, Long, (Long, Long, Long)](
      events, _.user_id, _.tsUs, "P+ B",
      Map("P" -> (_.event_type == "p"), "B" -> (_.event_type == "b")),
      (_, e, ctx) => (e.event_id,
        ctx.prev().map(_.asInstanceOf[Event].event_id).getOrElse(-1L),
        ctx.next().map(_.asInstanceOf[Event].event_id).getOrElse(-1L)))
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, -1L, 2L), (2L, 1L, 3L), (3L, 2L, -1L)))
  }

  test("rejects unknown pattern variables") {
    assertThrows[IllegalArgumentException] {
      MatchRecognize.compile[Event]("A B", Map("A" -> (_ => true)))
    }
  }

  test("iterative DEFINE on a variable that ALSO matches in an alternation group is rejected") {
    // '(A|B) A': the plain-token A would carry the context but the
    // group-branch A would silently skip it — must fail loudly
    val ex = intercept[IllegalArgumentException] {
      MatchRecognize.compileMulti[Event]("(A|B) A",
        Map("A" -> (_ => true), "B" -> (_ => true)),
        AfterMatch.SkipPastLast,
        Map("A" -> ((_: Event, _: MatchContext[Event]) => true)))
    }
    assert(ex.getMessage.contains("alternation group"), ex.getMessage)
  }
}
