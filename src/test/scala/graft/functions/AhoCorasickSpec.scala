package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form Aho–Corasick automaton checks: textbook all-occurrence
  * semantics (overlaps, nested patterns, shared prefixes), the failure
  * cases regex-per-pattern implementations get wrong.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def counts(text: String, pats: String*): Seq[Long] =
    AhoCorasick.build(pats).countAll(text).toSeq

  test("single pattern: non-overlapping and overlapping occurrences") {
    assert(counts("abcabcabc", "abc") === Seq(3L))
    // self-overlapping pattern: every start position counts
    assert(counts("aaaa", "aa") === Seq(3L))
  }

  test("nested patterns both fire at the same end positions") {
    assert(counts("a table is a tab", "tab", "table") === Seq(2L, 1L))
  }

  test("shared prefixes route through the trie without loss") {
    assert(counts("she sells shells", "she", "shell", "he", "hells") ===
      Seq(2L, 1L, 2L, 1L))
  }

  test("failure links find matches spanning a failed longer pattern") {
    // after reading "ushe" the automaton must fall back and report both
    assert(counts("ushers", "she", "he", "hers", "his") === Seq(1L, 1L, 1L, 0L))
  }

  test("empty text and absent patterns give zeros; unicode is exact") {
    assert(counts("", "x") === Seq(0L))
    assert(counts("nothing here", "zebra") === Seq(0L))
    assert(counts("héllo héllo", "héllo", "llo") === Seq(2L, 2L))
  }

  test("MultiPatternCount expression agrees with m separate regexp-count scans") {
    val spark = graft.GraftSession.get("ac-spec")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pats = Seq("ab", "aba", "ba", "zz")
    val df = Seq("ababab", "zzz", "", "ba ab aba").toDF("text").localCheckpoint()
    val viaAc = df.select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        MultiPatternCount(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")), pats))
        .as("c"))
      .collect().map(_.getSeq[Long](0))
    // reference: overlapping occurrences by position scan per pattern
    val expected = df.collect().map(_.getString(0)).map { t =>
      pats.map(p => (0 to t.length - p.length)
        .count(i => p.nonEmpty && t.regionMatches(i, p, 0, p.length)).toLong)
    }
    assert(viaAc.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
  }
}
