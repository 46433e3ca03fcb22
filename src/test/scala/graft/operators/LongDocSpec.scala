package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-document stress guard: every text fixture doc is ~100 tokens,
  * which is exactly the regime that masks per-document kernels that are
  * quadratic in document length (an O(tokens²) kernel is invisible at
  * 10² tokens and ruinous at 10⁵ — 50k tokens ⇒ 1.25 B comparisons PER
  * DOC). Real corpora have 10³–10⁵-token documents, so each text-family
  * operator must complete on a 50k-token document within a bound that a
  * quadratic kernel cannot meet (the pre-fix cdcChunks took minutes on
  * this fixture; the linear form takes ~a second). This suite fails if
  * anyone reintroduces a quadratic-in-record-size term.
  */
class LongDocSpec extends SparkSpec {

  // ~30k distinct tokens out of 50k: large distinct count is what makes
  // per-distinct rescans (O(distinct · n)) blow up, large n is what
  // makes per-position prefix scans (O(n²)) blow up — stress both.
  private val N = 50000
  private def mkText(salt: Long): String =
    (0 until N).map(i => "t" + ((i * 2654435761L + salt) % 40000)).mkString(" ")

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq((1L, mkText(0)), (2L, mkText(7)), (3L, mkText(0)))
      .toDF("doc_id", "text").cache()
  }

  /** Run `body`, assert it finishes inside `seconds` (generous next to
    * the linear cost, hopeless for a quadratic one).
    */
  private def bounded[T](label: String, seconds: Int)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val dt = (System.nanoTime() - t0) / 1e9
    assert(dt < seconds, f"$label took $dt%.1f s on a $N-token doc (bound $seconds s) — quadratic kernel?")
    r
  }

  test("token counting is linear in document length") {
    val n = bounded("tokens", 30) {
      docs.select(TextAnalysis.tokenCount(col("text")).as("n")).collect()
    }
    assert(n.forall(_.getLong(0) == N))
  }

  test("repetitionMetrics is linear: 50k tokens, ~30k distinct, bounded time") {
    val rows = bounded("repetitionMetrics", 60) {
      docs.select(col("doc_id") +:
          Curation.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id").collect()
    }
    assert(rows.length == 3)
    val r = rows.head
    assert(r.getLong(1) == N) // n_tokens
    // 40k vocab over 50k draws: distinct_frac well below 1, above 0.5
    val distinctFrac = r.getDouble(2)
    assert(distinctFrac > 0.5 && distinctFrac < 1.0)
    // top word appears a handful of times out of 50k
    val topFrac = r.getDouble(3)
    assert(topFrac > 0.0 && topFrac < 0.01)
  }

  test("repetitionMetrics top_word_frac matches the per-distinct rescan on a small doc") {
    import spark.implicits._
    val small = Seq((1L, "a b a c a b d"), (2L, "x x x y")).toDF("doc_id", "text")
    val got = small
      .select(col("doc_id") +:
        Curation.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    // doc 1: 7 tokens, top word 'a' ×3; doc 2: 4 tokens, top word 'x' ×3
    assert(math.abs(got(0).getDouble(3) - 3.0 / 7) < 1e-6)
    assert(math.abs(got(1).getDouble(3) - 3.0 / 4) < 1e-6)
  }

  test("cdcChunks is linear and covers every token exactly once") {
    val chunks = bounded("cdcChunks", 60) {
      Curation.cdcChunks(docs, divisor = 8).collect()
    }
    // expected chunk length = divisor ⇒ ~N/8 chunks per doc
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    for ((_, rows) <- byDoc) {
      assert(rows.map(_.getLong(2)).sum == N, "chunks must partition the token stream")
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L, "chunk ids must be dense 0..k-1")
    }
    // identical text ⇒ identical chunk fingerprints (content-defined)
    val fp1 = byDoc(1L).map(r => (r.getLong(1), r.getString(3))).toMap
    val fp3 = byDoc(3L).map(r => (r.getLong(1), r.getString(3))).toMap
    assert(fp1 == fp3)
  }

  test("cdcChunks boundaries are edit-robust: a prefix edit shifts one chunk, not all") {
    import spark.implicits._
    val base = mkText(3)
    val edited = "zzz " + base // insert one token at the front
    val two = Seq((10L, base), (11L, edited)).toDF("doc_id", "text")
    val fps = Curation.cdcChunks(two, divisor = 8).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(3)).toSet).toMap
    val shared = fps(10L).intersect(fps(11L)).size
    // all chunks after the first boundary are identical content ⇒ shared
    assert(shared >= fps(10L).size - 1, s"only $shared of ${fps(10L).size} chunks survived a 1-token prefix edit")
  }

  test("chunkDedup is linear over long docs and dedups the repeated doc") {
    val out = bounded("chunkDedup", 60) {
      Curation.chunkDedup(docs, chunkTokens = 64).orderBy("id").collect()
    }
    assert(out.length == 3)
    // doc 3 repeats doc 1's text exactly: every one of its chunks is owned
    // by doc 1, so nothing survives
    assert(out(2).getLong(2) == 0L, "repeat doc must lose all chunks")
    // the token sequence has period 40000, so doc 1's tail chunks repeat
    // its own head chunks — it keeps most but not all of them
    assert(out(0).getLong(2) > 0L && out(0).getLong(2) <= out(0).getLong(1))
  }

  test("shingles and fingerprint are linear over long docs") {
    bounded("shingles+fingerprint", 30) {
      docs.select(
        size(TextAnalysis.shingles(col("text"), 3)).as("ns"),
        TextAnalysis.fingerprint(col("text")).as("fp")).collect()
    }
  }

  test("dupCoverage is linear: interval union in the array domain, no per-position rescan") {
    // docs 1 and 3 are identical 50k-token texts: EVERY window is
    // duplicated, so the coverage union runs over ~50k positions per
    // doc — the regime where a per-position rescan (O(n²)) dies and
    // the single indexed transform stays cheap
    val rows = bounded("dupCoverage", 60) {
      Curation.dupCoverage(docs, k = 8).orderBy("id").collect()
    }
    assert(rows.length == 3)
    val r1 = rows.head
    assert(r1.getLong(1) == N && r1.getLong(2) == N,
      s"identical docs must be fully covered: ${r1.mkString(",")}")
  }

  test("dupNgramFraction is linear over long docs; identical docs fully duplicated") {
    val rows = bounded("dupNgramFraction", 60) {
      Curation.dupNgramFraction(docs, k = 8).orderBy("id").collect()
    }
    assert(rows.length == 3)
    assert(rows.head.getDouble(3) == 1.0, "identical docs: every shingle duplicated")
  }

  test("winnowPairs' staged selection is linear; identical 50k-token docs pair at containment 1.0") {
    // the staged toks → grams → mins pipeline must stay O(k·w·n); the
    // single-expression form (winnowFingerprint's documented caveat)
    // would re-run the normalize+shingle+hash tree O(k·w) times per row
    // note: mkText's token values cycle with period 40000, so ALL salts
    // produce rotations of the same periodic sequence — every doc pair
    // here is a true near-duplicate and must appear
    val pairs = bounded("winnowPairs", 60) {
      Dedup.winnowPairs(docs).orderBy("da", "db").collect()
    }
    assert(pairs.length == 3, s"all rotated-cycle pairs expected: ${pairs.mkString(";")}")
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L).get
    assert(exact.getDouble(3) == 1.0, "identical docs must share every selected fingerprint")
  }
}
