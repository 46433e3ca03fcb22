package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word against a BOUNDED unigram-LM piece
  * vocabulary (the SentencePiece decoding step, Kudo 2018): best[j] =
  * min over piece lengths 1..maxLen of best[j−len] + cost(word[j−len..j)),
  * costs in integer micro-nats. The vocabulary is a collected bounded
  * model (top-K pieces + all single characters — the kmeans-centroid
  * collect posture), so this is scan-stage work with a broadcast model:
  * no shuffle, no state.
  *
  * Determinism contract (mirrored EXACTLY by the DuckDB oracle's
  * recursive-CTE DP, see PipelineQueries.unigramViterbiSql):
  *  - candidate scan runs length maxLen → 1 updating only on STRICTLY
  *    smaller cost, so cost ties resolve to the LONGEST piece;
  *  - a piece absent from the vocabulary costs Big = 10^15 micro-nats
  *    (the DP still proceeds and still emits a segmentation — never an
  *    empty fallback the oracle can't reproduce);
  *  - positions are Unicode CODE POINTS (both engines' substr
  *    semantics), not UTF-16 units.
  */
case class UnigramViterbi(child: Expression, pieces: Array[String], costs: Array[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  private val Big = 1000000000000000L // 10^15 micro-nats
  private val MaxLen = 4

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    // code-point array: segment positions match SQL substr semantics
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def sub(from: Int, until: Int): String =
      new String(cps, from, until - from)
    val best = Array.fill(n + 1)(Long.MaxValue / 4)
    val choice = new Array[Int](n + 1)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      var len = MaxLen
      while (len >= 1) {
        val k = j - len
        if (k >= 0) {
          val c = table.get(sub(k, j))
          val pc = if (c == null) Big else c.longValue()
          val cand = best(k) + pc
          if (cand < best(j)) { best(j) = cand; choice(j) = k }
        }
        len -= 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = n
    while (pos > 0) {
      val k = choice(pos)
      out += UTF8String.fromString(sub(k, pos))
      pos = k
    }
    new GenericArrayData(out.reverse.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}
