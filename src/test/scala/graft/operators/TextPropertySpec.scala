package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized properties for the text kernels: every operator is
  * cross-checked against an INDEPENDENT Scala reference implementation
  * over generated documents covering the edges fixtures and oracles
  * share blind spots on — empty text, single tokens, heavy whitespace,
  * punctuation/digit runs, all-duplicate docs. One Spark job per
  * property (all cases collected in a single DataFrame pass).
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private val N = 80
  private val rnd = new scala.util.Random(20260813L)

  private def randDoc(): String = {
    val vocab = Vector("the", "Data", "spark42", "x", "ROW", "a1b2", "!!", "v2.7",
      "agg", "zz", "Läufer", "key;", "0", "windowing")
    val n = rnd.nextInt(30)
    val seps = Vector(" ", "  ", "\t", " \n ", "   ")
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
      .mkString(seps(rnd.nextInt(seps.size))) match {
      case s if rnd.nextInt(4) == 0 => "  " + s + " "
      case s => s
    }
  }

  private lazy val docs: Seq[(Long, String)] =
    (0L until N).map(i => (i, randDoc())) :+ (N.toLong, "") :+ (N + 1L, "  \t ")

  // independent reference: lowercase, collapse whitespace, trim, split
  private def refTokens(text: String): Vector[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toVector

  test("tokens matches the reference tokenizer on random + degenerate docs") {
    val got = docs.toDF("id", "text")
      .select(col("id"), TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    for ((id, text) <- docs)
      assert(got(id) == refTokens(text), s"doc $id: <$text>")
  }

  test("shingles(k) equals the naive sliding window for k in 2..4") {
    for (k <- 2 to 4) {
      val got = docs.toDF("id", "text")
        .select(col("id"), TextAnalysis.shingles(col("text"), k).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      for ((id, text) <- docs) {
        val toks = refTokens(text)
        val want =
          if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toVector
          else Vector.empty[String]
        assert(got(id) == want, s"k=$k doc $id: <$text>")
      }
    }
  }

  test("dedupFold is idempotent and matches the reference fold") {
    def refFold(text: String): String =
      text.toLowerCase.replaceAll("[0-9]", "0").replaceAll("[^a-z0 ]", " ")
        .replaceAll("\\s+", " ").trim
    val got = docs.toDF("id", "text")
      .select(col("id"),
        TextAnalysis.dedupFold(col("text")).as("f1"),
        TextAnalysis.dedupFold(TextAnalysis.dedupFold(col("text"))).as("f2"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    for ((id, text) <- docs) {
      val (f1, f2) = got(id)
      assert(f1 == refFold(text), s"doc $id: <$text>")
      assert(f1 == f2, s"not idempotent on doc $id: <$text>")
    }
  }

  test("repetitionMetrics top_word_frac equals max token frequency / n") {
    val withText = docs.filter(_._2.trim.nonEmpty)
    val got = withText.toDF("id", "text")
      .select(col("id") +:
        Curation.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    for ((id, text) <- withText) {
      val toks = refTokens(text)
      val (nTok, topFrac) = got(id)
      assert(nTok == toks.length)
      val want = toks.groupBy(identity).values.map(_.size).max.toDouble / toks.length
      assert(math.abs(topFrac - BigDecimal(want).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"doc $id: <$text>")
    }
  }

  test("cdcChunks partitions every document: chunk sizes sum to n, boundary rule exact") {
    def tokHashMod8(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 8
    }
    val withText = docs.filter(_._2.trim.nonEmpty)
    val chunks = Curation.cdcChunks(withText.toDF("doc_id", "text"), divisor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    for ((id, text) <- withText) {
      val toks = refTokens(text)
      // reference chunking: boundary AFTER token i iff hash ≡ 0 (mod 8)
      val refChunks = {
        val out = Vector.newBuilder[Vector[String]]
        var cur = Vector.newBuilder[String]
        var any = false
        for (t <- toks) {
          cur += t; any = true
          if (tokHashMod8(t) == 0L) { out += cur.result(); cur = Vector.newBuilder; any = false }
        }
        if (any) out += cur.result()
        out.result()
      }
      val got = chunks(id).sortBy(_._2)
      assert(got.map(_._3).sum == toks.length, s"doc $id sizes")
      assert(got.length == refChunks.length, s"doc $id chunk count")
      for ((row, want) <- got.zip(refChunks)) {
        assert(row._3 == want.length, s"doc $id chunk ${row._2} size")
        val md = java.security.MessageDigest.getInstance("MD5")
        val fp = md.digest(want.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(row._4 == fp, s"doc $id chunk ${row._2} fingerprint")
      }
    }
  }

  test("winnowFingerprint is a subset of the shingle hash set and never empty") {
    val withText = docs.filter(_._2.trim.nonEmpty)
    val got = withText.toDF("id", "text")
      .select(col("id"),
        TextAnalysis.winnowFingerprint(col("text"), k = 3, w = 4).as("wf"),
        transform(TextAnalysis.shingles(col("text"), 3), g => xxhash64(g)).as("all3"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet))).toMap
    for ((id, text) <- withText) {
      val (wf, all3) = got(id)
      assert(wf.nonEmpty, s"doc $id: empty fingerprint")
      val toks = refTokens(text)
      if (toks.length >= 3)
        assert(wf.subsetOf(all3), s"doc $id: fingerprint outside gram set")
    }
  }
}
