package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Hand-computed checks for corpus-level scoring queries, run against a
  * tiny purpose-built documents.parquet fixture (the DuckDB oracle
  * proves engine agreement; these prove the MATH).
  */
class QueryFixtureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-fixture").toString
    Seq(
      (0L, "a a b", "en", "src0", 5L),
      (1L, "a c", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("unigram logprob matches the hand computation") {
    // corpus: tokens a a b a c -> p(a)=3/5, p(b)=1/5, p(c)=1/5
    val r = PipelineQueries.docUnigramLogprob(spark, dir)
      .as[(Long, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    def nlp(p: Double) = -math.log(BigDecimal(p).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val d0 = BigDecimal((2 * nlp(3.0 / 5) + nlp(1.0 / 5)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = BigDecimal((nlp(3.0 / 5) + nlp(1.0 / 5)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(0L)._1 - d0) < 1e-9, s"doc0: ${r(0L)._1} vs $d0")
    assert(math.abs(r(1L)._1 - d1) < 1e-9, s"doc1: ${r(1L)._1} vs $d1")
  }

  test("PMI matches the hand computation on a bigram above the count floor") {
    // Need cb >= 5: build a fixture where "x y" occurs 6 times
    val d = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    val rows = (0 until 6).map(i => (i.toLong, "x y", "en", "src0", 3L)) :+
      ((6L, "x z", "en", "src0", 3L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = PipelineQueries.docPmiBigrams(spark, d)
      .as[(String, Long, Double)].collect()
    // tokens: x×7, y×6, z×1 (tu=14); bigrams: "x y"×6, "x z"×1 (tb=7)
    val expected = BigDecimal(math.log((6.0 / 7) / ((7.0 / 14) * (6.0 / 14))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xy = out.find(_._1 == "x y").get
    assert(xy._2 == 6L)
    assert(math.abs(xy._3 - expected) < 1e-9, s"pmi ${xy._3} vs $expected")
    assert(!out.exists(_._1 == "x z")) // below the count floor
  }

  test("streamDeltaMinhash: probe-before-append — matches point only to strictly earlier batches") {
    // identical docs landing in batches 0/1/2 (batch = doc_id mod 3):
    // 4 matches 3; 5 matches min(3,4) = 3; 3 (first arrival) and the
    // unrelated 7 match nothing
    val d = java.nio.file.Files.createTempDirectory("graft-sdm").toString
    val t1 = "alpha beta gamma delta epsilon zeta"
    Seq((3L, t1, "en", "src0", 9L), (4L, t1, "en", "src0", 9L),
        (5L, t1, "en", "src0", 9L),
        (7L, "wholly unrelated vocabulary nothing shared here", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = graft.queries.StreamingQueries.streamDeltaMinhash(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((4L, 3L, 1.0), (5L, 3L, 1.0)), s"got $r")
  }

  test("jsDrift closed form: identical sources diverge 0, disjoint halves hit the analytic value") {
    // two sources with IDENTICAL token distributions -> each equals the
    // corpus -> exactly 0 bits
    val same = Seq(
      (0L, "a a b c", "en", "s1", 4L), (1L, "a a b c", "en", "s2", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = PipelineQueries.jsDrift(same)
      .select("source", "js_bits").as[(String, Double)].collect().toMap
    assert(r1("s1") == 0.0 && r1("s2") == 0.0)
    // disjoint vocabularies, equal token mass: JS(p, corpus) per source
    // = 0.5·ln(4/3) + 0.25·ln(2/3) + 0.25·ln2 nats = 0.311278 bits
    val disjoint = Seq(
      (0L, "a b c d", "en", "s1", 4L), (1L, "e f g h", "en", "s2", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expect = (0.5 * math.log(4.0 / 3.0) + 0.25 * math.log(2.0 / 3.0)
      + 0.25 * math.log(2.0)) / math.log(2.0)
    val r2 = PipelineQueries.jsDrift(disjoint)
      .select("source", "js_bits").as[(String, Double)].collect().toMap
    assert(math.abs(r2("s1") - expect) < 1e-6 && math.abs(r2("s2") - expect) < 1e-6,
      s"got $r2, want ~$expect")
  }
}
