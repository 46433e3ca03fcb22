package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MULTI_PATTERN_COUNT(text): per-pattern occurrence counts over a
  * bounded dictionary in ONE pass — the Aho–Corasick automaton
  * (Aho & Corasick 1975, "Efficient String Matching: An Aid to
  * Bibliographic Search"), the classic engine behind bad-word /
  * flagged-term content filters (e.g. the C4 pipeline's banned-word
  * list) and dictionary-based PII scans.
  *
  * Why an automaton and not m `regexp_count` columns: m separate
  * passes re-read the text m times and cost O(m·n) scans; the
  * automaton costs O(n + matches) TOTAL regardless of dictionary
  * size, so a 10k-term blocklist over 100 TB is the same single scan
  * as a 6-term one. The trie + failure links build once per executor
  * (@transient lazy — the [[SignLshBuckets]] bounded-model posture;
  * blocklists are KBs). Counts include OVERLAPPING occurrences and
  * nested patterns ("tab" inside every "table") — the textbook AC
  * semantics, replayed exactly by a position-scan oracle.
  *
  * Returns array<long>, one count per pattern in declaration order.
  * CodegenFallback: cost is per-document, dominated by the scan loop.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_count: patterns must be non-empty strings")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_pattern_count"

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.countAll(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object AhoCorasick {

  /** Immutable matcher: goto transitions per node (sorted-key binary
    * search — dictionaries are small, nodes denser than a hash map),
    * and per node the PRE-AGGREGATED pattern ids along its
    * dictionary-suffix chain, so the scan loop never chases links.
    */
  final class Automaton private[AhoCorasick] (
      keys: Array[Array[Char]],
      next: Array[Array[Int]],
      fail: Array[Int],
      out: Array[Array[Int]],
      nPatterns: Int) {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val i = java.util.Arrays.binarySearch(keys(s), c)
        if (i >= 0) return next(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** All-occurrence counts (overlaps and nested patterns included). */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        s = step(s, text.charAt(i))
        val o = out(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  def build(patterns: Seq[String]): Automaton = {
    import scala.collection.mutable
    val goto = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = goto(s).getOrElseUpdate(c, {
          goto += mutable.TreeMap.empty[Char, Int]
          ends += Nil
          goto.length - 1
        })
      }
      ends(s) = pi :: ends(s)
    }
    val n = goto.length
    val fail = new Array[Int](n)
    val out = Array.tabulate(n)(i => ends(i).reverse.toArray)
    // BFS failure links; aggregate output sets down the suffix chain
    val queue = mutable.Queue.empty[Int]
    goto(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      if (out(fail(u)).nonEmpty) out(u) = out(u) ++ out(fail(u))
      goto(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(v) = goto(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    new Automaton(
      goto.map(_.keysIterator.toArray).toArray,
      goto.map(_.valuesIterator.toArray).toArray,
      fail, out, patterns.length)
  }
}
