package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Closed-form checks for the LM-diagnostic additions: Good–Turing
  * frequency-of-frequencies (hand-counted bigram tail), RAKE keyword
  * extraction (hand-scored degree/freq on a two-phrase document), and
  * Granger lead-lag (a constructed series where yesterday's clicks ARE
  * today's purchases must reject; constant series must emit NULL, not
  * a fake statistic).
  */
class LmDiagnosticsSpec extends SparkSpec {

  import graft.queries.{AnalyticsQueries, PipelineQueries}

  private def writeDocs(dst: String, texts: Seq[String]): String = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "test", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    dst
  }

  test("good-turing: hand-counted bigram tail") {
    // "a b a b c b": bigrams (a b)x2, (b a), (b c), (c b) -> N=5 tokens?
    // counts: {a b: 2, b a: 1, b c: 1, c b: 1} -> N = 5, N1 = 3, N2 = 1
    val dir = writeDocs("/tmp/graft-lm-gt", Seq("a b a b c b"))
    val rows = PipelineQueries.docGoodTuring(spark, dir).collect()
      .map(r => r.getAs[Long]("r") -> r).toMap
    assert(rows(1L).getAs[Long]("n_r") === 3L)
    assert(rows(2L).getAs[Long]("n_r") === 1L)
    // r* at r=1: 2 * N2 / N1 = 2/3; unseen mass = N1/N = 3/5
    assert(math.abs(rows(1L).getAs[Double]("r_star") - 2.0 / 3.0) < 1e-12)
    assert(rows(1L).getAs[Double]("obs_share") === 0.6)
    // r=2 has no r=3 successor: r* = 0 recorded, not faked
    assert(rows(2L).getAs[Double]("r_star") === 0.0)
  }

  test("rake: degree/freq scoring on a two-phrase document") {
    // stopword 'of' splits: [deep learning] [deep models]
    // deep: deg 4 frq 2 -> 2.0; learning/models: deg 2 frq 1 -> 2.0
    // both phrases score 4.0 -> tie broken by phrase text
    val dir = writeDocs("/tmp/graft-lm-rake", Seq("deep learning of deep models"))
    val out = PipelineQueries.docRake(spark, dir).collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("phrase") === "deep learning")
    assert(out(0).getAs[Long]("rank") === 1L)
    assert(out(0).getAs[Double]("score") === 4.0)
    assert(out(1).getAs[String]("phrase") === "deep models")
    assert(out(1).getAs[Double]("score") === 4.0)
  }

  private def writeEvents(dst: String, rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((uid, day, typ), i) =>
      (i.toLong, Timestamp.valueOf(s"$day 12:00:00"), uid, typ, 0.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  test("granger: clicks that perfectly lead purchases reject in that direction") {
    // x (clicks) on day i: x_i events; purchases on day i+1: x_i events
    // (one wobble so RSS_u > 0 and F is finite)
    val xs = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5)
    val rows = (for {
      (x, i) <- xs.zipWithIndex
      day = f"2024-01-${i + 1}%02d"
      nextDay = f"2024-01-${i + 2}%02d"
      r <- Seq.fill(x)((1L, day, "click")) ++
        Seq.fill(x + (if (i == 4) 1 else 0))((1L, nextDay, "purchase"))
    } yield r)
    val dir = writeEvents("/tmp/graft-lm-granger", rows)
    val out = AnalyticsQueries.evtGranger(spark, dir).collect()
      .map(r => r.getAs[String]("direction") -> r).toMap
    val fwd = out("click->purchase")
    assert(fwd.getAs[Boolean]("reject"),
      s"leading direction must reject, f=${fwd.getAs[Double]("f_stat")}")
    val back = out("purchase->click")
    assert(fwd.getAs[Double]("f_stat") > back.getAs[Double]("f_stat"))
  }

  test("self-bleu: identical docs score 1, disjoint docs score 0") {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "twin", 30L),
      (2L, "alpha beta gamma delta epsilon", "en", "twin", 30L),
      (3L, "one two three four five six", "en", "disj", 27L),
      (4L, "seven eight nine ten eleven twelve", "en", "disj", 34L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet("/tmp/graft-lm-sbleu/documents.parquet")
    val out = PipelineQueries.docSelfBleu(spark, "/tmp/graft-lm-sbleu").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("twin").getAs[Double]("self_bleu") === 1.0)
    assert(out("twin").getAs[Double]("p4") === 1.0)
    assert(out("disj").getAs[Double]("self_bleu") === 0.0)
    assert(out("disj").getAs[Double]("p1") === 0.0)
  }

  test("unigram-lm: pieces reconstruct words and frequent subwords win") {
    // "abcd" x 4 + "ab" x 2 + "cd" x 2: 'abcd' and its halves dominate
    val dir = writeDocs("/tmp/graft-lm-uni",
      Seq("abcd abcd abcd abcd ab ab cd cd"))
    val vocab = PipelineQueries.docUnigramLm(spark, dir).collect()
    assert(vocab.nonEmpty)
    // top piece by count must be a real frequent subword
    assert(Set("abcd", "ab", "cd").contains(vocab.head.getAs[String]("piece")))
    val segs = PipelineQueries.docUnigramSegment(spark, dir).collect()
    // coverage invariant: the segmentation concatenates back to the word
    segs.foreach { r =>
      assert(r.getAs[String]("seg").replace(" ", "") === r.getAs[String]("word"))
    }
    // 'abcd' (freq 4) must segment as the single piece, not char soup
    val abcd = segs.find(_.getAs[String]("word") == "abcd").get
    assert(abcd.getAs[Long]("n_pieces") === 1L)
  }

  test("wordpiece: greedy reconstructs words and flags viterbi agreement") {
    val dir = writeDocs("/tmp/graft-lm-wp",
      Seq("abcd abcd abcd abcd ab ab cd cd"))
    val out = PipelineQueries.docWordPiece(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("seg").replace(" ", "") === r.getAs[String]("word"))
    }
    // 'abcd' in vocab: greedy takes it in one piece and agrees with viterbi
    val abcd = out.find(_.getAs[String]("word") == "abcd").get
    assert(abcd.getAs[Long]("n_pieces") === 1L)
    assert(abcd.getAs[Boolean]("matches_viterbi"))
  }

  test("script profile: dominant script and mixed flag on constructed docs") {
    val dir = writeDocs("/tmp/graft-lm-script", Seq(
      "hello plain english text",
      "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 \u0442\u0435\u0441\u0442",
      "\u4e2d\u6587\u6587\u672c\u6d4b\u8bd5\u6837\u4f8b\u5185\u5bb9",
      "mostly english \u0442\u0435\u043a\u0441\u0442 here"))
    val out = AnalyticsQueries.docScript(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("dominant") === "latin")
    assert(!out(0L).getAs[Boolean]("mixed"))
    assert(out(1L).getAs[String]("dominant") === "cyrillic")
    assert(out(2L).getAs[String]("dominant") === "cjk")
    assert(out(3L).getAs[String]("dominant") === "latin")
    assert(out(3L).getAs[Boolean]("mixed"),
      "5 cyrillic chars out of ~23 scripted must trip the 10% mixed flag")
  }

  test("pr-auc: perfect scorer gives AP = 1") {
    // en docs stopword-rich, others stopword-free: score separates classes
    val dir = "/tmp/graft-lm-prauc"
    import spark.implicits._
    Seq(
      (1L, "the of and to in is the of", "en", "s", 10L),
      (2L, "the a of and is in the a", "en", "s", 10L),
      (3L, "xxx yyy zzz www", "de", "s", 10L),
      (4L, "qqq rrr sss ttt", "fr", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = AnalyticsQueries.docPrAuc(spark, dir).collect().head
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    assert(math.abs(r.getAs[Double]("ap") - 1.0) < 1e-9)
  }

  test("cmh: a perfect within-stratum association rejects with the exact chi2") {
    // 40 users, one stratum: odd ids (treated) purchase-heavy, even not.
    // 2x2: a=20, n1=20, m1=20, N=40 -> E=10, V=160000/62400,
    // chi2 = (10-0.5)^2 / V = 90.25 * 62400 / 160000 = 35.1975
    val rows = for {
      uid <- 0L until 40L
      ev <- if (uid % 2 == 1) Seq.fill(5)("purchase") ++ Seq.fill(5)("view")
            else Seq.fill(1)("purchase") ++ Seq.fill(9)("view")
    } yield (uid, "2024-01-01", ev)
    val dir = writeEvents("/tmp/graft-lm-cmh", rows)
    val r = AnalyticsQueries.evtCmh(spark, dir).collect().head
    assert(r.getAs[Long]("n_strata") === 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 35.1975) < 1e-4)
    assert(r.getAs[Boolean]("reject"))
    assert(r.isNullAt(r.fieldIndex("or_mh")), "b = 0 makes OR_MH infinite -> NULL")
  }

  test("license and code detection on constructed docs") {
    val dir = writeDocs("/tmp/graft-lm-lic", Seq(
      "licensed under the Apache License version 2",
      "released under the MIT License terms",
      "this file is covered by the GNU General Public License and the MIT License",
      "copyright 2024 all rights reserved",
      "plain prose about nothing in particular",
      "def f(x): return g(x); import os; class A: var b = {1: 2};"))
    val lic = PipelineQueries.docLicense(spark, dir).collect()
      .map(r => r.getAs[String]("license") -> r.getAs[Long]("n_docs")).toMap
    assert(lic("apache") === 1L && lic("mit") === 1L)
    assert(lic("gpl") === 1L, "dual-marked doc must land on the restrictive side")
    assert(lic("proprietary") === 1L && lic("none") === 2L)
    val code = PipelineQueries.docCodeDetect(spark, dir).collect().head
    assert(code.getAs[Long]("n_docs") === 6L)
    assert(code.getAs[Long]("n_code") === 1L)
  }

  test("granger: constant series emit NULL, not a fake F") {
    val rows = for {
      i <- 0 until 6
      r <- Seq((1L, f"2024-01-${i + 1}%02d", "click"), (1L, f"2024-01-${i + 1}%02d", "purchase"))
    } yield r
    val dir = writeEvents("/tmp/graft-lm-granger-const", rows)
    val out = AnalyticsQueries.evtGranger(spark, dir).collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.isNullAt(r.fieldIndex("f_stat"))))
  }
}
