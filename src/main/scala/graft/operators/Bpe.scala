package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich 2016) — the full
  * greedy merge loop, not just one round of pair counting
  * ([[graft.queries.PipelineQueries.docBpe]] is the single-round
  * ranking). The reference covers tokenizer-style iterative refinement
  * through its DataSet iteration operators (flink-java
  * BulkIterationBase); here the loop is driven Spark-side with staged
  * vocabulary frames, the same discipline as [[Iterations]] and the
  * k-means trainers.
  *
  * Scale shape: the corpus collapses to its WORD-FREQUENCY table first
  * (one token-keyed shuffle, vocabulary-sized output), and every merge
  * round runs over that staged vocabulary — pair counting is an
  * explode + hash agg over ~|vocab| rows, the argmax compiles to
  * TakeOrderedAndProject, and the merge application is one broadcast
  * of a single-row frame into a codegen'd `regexp_replace`. At 100 TB
  * the corpus is touched exactly once; rounds cost |vocab|, the same
  * asymptotic the reference tokenizer trainers (and HuggingFace's)
  * have.
  *
  * Symbol-string representation: a word is kept as its symbols joined
  * by TWO spaces and wrapped in single spaces (`' h  e  y  </w> '`).
  * A merge of pair (a, b) is the literal pattern `' a  b '` replaced
  * by `' ab '`: each match consumes one boundary space from the
  * neighboring two-space separators, so after replacement every
  * separator is back to two spaces and chained occurrences
  * (`' a  b  a  b '` → `' ab  ab '`) merge in one left-to-right
  * non-overlapping pass — exactly the greedy semantics of the
  * reference implementation, with no post-normalization pass. Words
  * are restricted to `[a-z0-9]+` so symbols (plus the `</w>`
  * end-of-word marker) never contain regex metacharacters and the
  * pattern needs no escaping in either engine's regex dialect.
  */
object Bpe {

  /** Run `rounds` greedy merges; returns one row per round:
    * (step, pair, cnt) — the learned merge table, ordered by step.
    * Ties in pair count break on the pair string ascending, making the
    * whole training run deterministic and cross-engine replayable.
    */
  def trainMerges(docs: DataFrame, rounds: Int, textCol: String = "text"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val ws0 = words.select(
      concat(lit(" "),
        array_join(concat(expr("regexp_extract_all(word, '.', 0)"),
          array(lit("</w>"))), "  "),
        lit(" ")).as("ws"),
      col("cnt"))
    var cur = Funnel.stageLazy(ws0)
    val merges = Seq.newBuilder[DataFrame]
    for (r <- 0 until rounds) {
      val syms = cur.select(split(trim(col("ws")), " +").as("s"), col("cnt"))
      val top = Funnel.stageLazy(syms
        .select(col("cnt"), explode(TextAnalysis.shinglesOf(col("s"), 2)).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .select(lit(r.toLong).as("step"), col("pair"), col("c").cast("long").as("cnt")))
      merges += top
      if (r < rounds - 1) {
        val p1 = split(col("pair"), " ").getItem(0)
        val p2 = split(col("pair"), " ").getItem(1)
        cur = Funnel.stageLazy(cur.crossJoin(broadcast(top.select("pair")))
          .select(regexp_replace(col("ws"),
            concat(lit(" "), p1, lit("  "), p2, lit(" ")),
            concat(lit(" "), p1, p2, lit(" "))).as("ws"), col("cnt")))
      }
    }
    merges.result().reduce(_ unionByName _).orderBy("step")
  }
}
