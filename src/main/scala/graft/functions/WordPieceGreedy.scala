package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style GREEDY longest-match-first segmentation (the BERT
  * tokenizer's decoding rule, Wu 2016 §4.1) against the same bounded
  * piece vocabulary as [[UnigramViterbi]]: from each position take the
  * LONGEST vocabulary piece that matches (max length maxLen), falling
  * back to the single character when nothing matches (characters are
  * always in the trained vocabulary by construction; the fallback
  * keeps the expression total anyway).
  *
  * Greedy is the O(n·maxLen) zero-lookahead counterpart of Viterbi —
  * the classic cost/quality trade the SentencePiece paper measures.
  * Pairing both over one vocabulary turns that delta into a corpus
  * diagnostic. Deterministic by construction (longest match, no
  * scores), mirrored by a single forward recursive CTE in the oracle.
  */
case class WordPieceGreedy(child: Expression, pieces: Array[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_greedy"

  private val MaxLen = 4

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      var len = math.min(MaxLen, n - i)
      var found = 1
      var done = false
      while (len >= 1 && !done) {
        if (set.contains(new String(cps, i, len))) { found = len; done = true }
        len -= 1
      }
      out += UTF8String.fromString(new String(cps, i, found))
      i += found
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceGreedy =
    copy(child = newChild)
}
