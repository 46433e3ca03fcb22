package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("normalize + fingerprint are case/whitespace insensitive") {
    val df = Seq("Hello  World", "  hello world ", "hello worlds").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("token counts") {
    val r = Seq("one two  three").toDF("text").select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.subwordCount(col("text"))).head()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 3L)
    val sub = Seq("can't stop-2x!").toDF("text")
      .select(TextAnalysis.subwordCount(col("text"))).head().getLong(0)
    // can + ' + t, stop + - + 2 + x, ! => 8
    assert(sub === 8L)
  }

  test("langId picks stopword-majority language with CJK short-circuit") {
    val cases = Seq(
      "the cat and the dog of a house" -> "en",
      "der hund und die katze ist ein tier" -> "de",
      "el perro y la casa de los gatos es una" -> "es",
      "le chien et les chats des maisons est une" -> "fr",
      "中文文本" -> "zh",
      "xyzzy qwerty" -> "en") // no signal: preference order says en
    cases.foreach { case (t, want) =>
      val got = Seq(t).toDF("text").select(TextAnalysis.langId(col("text"))).as[String].head()
      assert(got === want, s"langId('$t')")
    }
  }

  test("winnowFingerprint: identical docs share all fingerprints; shifted docs share most") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = "w0 " + a // one-token prefix shift
    val df = Seq(a, a, b).toDF("text")
      .select(TextAnalysis.winnowFingerprint(col("text")).as("fp"))
    val fps = df.as[Seq[Long]].collect()
    assert(fps(0) === fps(1))
    val shared = fps(0).toSet & fps(2).toSet
    assert(shared.size.toDouble / fps(0).size >= 0.5, "shifted doc should share most fingerprints")
  }

  test("shingles: sliding k-token windows, empty under k tokens") {
    val got = Seq("a b c d", "a b", "  A  b ").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)  // 2 tokens < k
    assert(got(2) === Seq.empty)  // normalization first: "a b" is 2 tokens
  }

  test("ngramOverlap: counts distinct shared shingles, excludes eval docs from train side") {
    val docs = Seq(
      (0L, "x y z x y z x y z"),        // eval: shingles {x y z, y z x, z x y}
      (1L, "x y z x y z q"),            // shares 3 distinct shingles with doc 0
      (2L, "x y z only"),               // shares 1
      (10L, "totally different words here")).toDF("doc_id", "text")
    val out = Decontamination.ngramOverlap(
        train = docs.filter($"doc_id" =!= 0L), eval = docs.filter($"doc_id" === 0L),
        idCol = "doc_id", textCol = "text", k = 3, minShared = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 3L)))
  }

  test("chunkStarts: full coverage with stride overlap, short tail kept") {
    def starts(n: Int) = Seq((1 to n).map(i => s"t$i").mkString(" ")).toDF("text")
      .select(TextAnalysis.chunkStarts(col("text"), 8, 6).as("s"))
      .as[Seq[Int]].head()
    assert(starts(5) === Seq(1))            // under chunkSize: one chunk
    assert(starts(8) === Seq(1))            // exactly chunkSize
    assert(starts(9) === Seq(1, 7))         // 1..8 then 7..9 (tail of 3)
    assert(starts(14) === Seq(1, 7))        // 7..14 fills the second chunk
    assert(starts(20) === Seq(1, 7, 13))    // 13..20 full
    // invariant: last chunk reaches the end, consecutive chunks overlap
    for (n <- 1 to 40) {
      val st = starts(n)
      assert(st.head === 1 && st.last + 8 - 1 >= n, s"n=$n uncovered: $st")
      st.zip(st.tail).foreach { case (a, b) => assert(b === a + 6) }
    }
  }

  test("quality bucket boundaries") {
    val short = "only three words"
    val noStop = (1 to 25).map(i => s"tok$i").mkString(" ")
    val ok = "the " + (1 to 25).map(i => s"tok$i").mkString(" ")
    val got = Seq(short, noStop, ok).toDF("text")
      .select(TextAnalysis.qualityMetrics(col("text")).find(_._1 == "quality_bucket").get._2)
      .as[String].collect()
    assert(got.toSeq === Seq("short", "no_stopwords", "ok"))
  }

  test("extractHtml: element content dropped, tags stripped, entities decoded once") {
    val df = Seq(
      "<p>Hello <b>world</b></p>",
      // raw '<' inside script must not survive or break tag stripping
      "<script>var a = 1 < 2;</script>keep<style>p{}</style>",
      "A &amp;amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39;",
      "<SCRIPT src=x>nope</SCRIPT>ok"
    ).toDF("h")
    val out = df.select(TextAnalysis.extractHtml(col("h"))).as[String].collect()
    assert(out(0) === "Hello world")
    assert(out(1) === "keep")
    // &amp;amp; is the ESCAPED literal "&amp;" — decoding must not run twice
    assert(out(2) === "A &amp; B <x> \"q\" 's'")
    assert(out(3) === "ok")
  }
}
