package graft.operators

import graft.SparkSpec

/** Hand-computed check for the BPE merge loop ([[Bpe.trainMerges]]):
  * the DuckDB oracle proves cross-engine agreement on the real corpus;
  * this proves the MERGE MECHANICS — greedy left-to-right
  * non-overlapping application and learned symbols feeding later
  * rounds.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges chain: learned symbols re-enter later winning pairs") {
    // 10 docs of the single word "aaaab" -> symbols a a a a b </w>
    // round 0: (a,a) counted 3x per word = 30, wins; greedy merge of
    //   ' a  a  a  a  b ' takes the two non-overlapping leftmost
    //   matches -> ' aa  aa  b ' (NOT ' aaa  a ... ')
    // round 1: (aa,aa)=10, (aa,b)=10, (b,</w>)=10 — tie breaks on the
    //   pair string: 'aa aa' < 'aa b' < 'b </w>', so the CHAINED pair
    //   of two learned symbols wins
    // round 2: word is ' aaaa  b  </w> ': 'aaaa b' < 'b </w>' wins
    val docs = (0 until 10).map(i => (i.toLong, "aaaab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, rounds = 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(merges == Seq((0L, "a a", 30L), (1L, "aa aa", 10L), (2L, "aaaa b", 10L)))
  }

  test("non-alnum tokens are excluded from the vocabulary") {
    val docs = Seq((0L, "xy xy a+b a+b a+b")).toDF("doc_id", "text")
    // only "xy" survives the [a-z0-9]+ filter despite a+b's higher count
    val m = Bpe.trainMerges(docs, rounds = 1).as[(Long, String, Long)].collect()
    assert(m.toSeq == Seq((0L, "x y", 2L)))
  }
}
