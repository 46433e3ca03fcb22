package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Seeded randomized cross-checks for the custom native Catalyst
  * expressions — the hand-written per-row loops that replace Spark
  * built-ins in the dedup/similarity hot paths. Each is compared
  * against an independent reference implementation of its documented
  * contract over random inputs (duplicates, empty arrays, zero
  * vectors included), so a future edit to a loop bound or hash seed
  * cannot silently change results.
  */
class NativeExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(77L)
  private val P = 2147483647L // MinHash modulus (Mersenne 2^31-1)

  private def xx(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  private def randTokens(): Seq[String] = {
    val vocab = Vector("a", "bb", "ccc", "Dd", "e5", "!!", "longer-token", "ü")
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
  }

  private lazy val tokenDocs: Seq[(Long, Seq[String])] =
    (0L until 50L).map(i => (i, randTokens())) :+ (50L, Seq.empty[String])

  test("MinHashSig equals the (a·h+b) mod P minima reference") {
    val numPerms = 16; val seed = 42L
    // same draw order as the expression: all a's, then all b's
    val r = new scala.util.Random(seed)
    val ca = Array.fill(numPerms)(1L + r.nextInt((P - 1).toInt).toLong)
    val cb = Array.fill(numPerms)(r.nextInt(P.toInt).toLong)
    def ref(toks: Seq[String]): Seq[Long] = {
      val sig = Array.fill(numPerms)(Long.MaxValue)
      for (t <- toks) {
        val h0 = xx(t) % P
        val x = if (h0 < 0) h0 + P else h0
        for (i <- 0 until numPerms)
          sig(i) = math.min(sig(i), (ca(i) * x + cb(i)) % P)
      }
      sig.toSeq
    }
    val got = tokenDocs.toDF("id", "toks")
      .select(col("id"), ColumnBridge.column(
        MinHashSig(ColumnBridge.expression(col("toks")), numPerms, seed)).as("sig"))
      .collect().map(r0 => r0.getLong(0) -> r0.getSeq[Long](1)).toMap
    for ((id, toks) <- tokenDocs)
      assert(got(id) == ref(toks), s"doc $id: $toks")
  }

  test("TokenHashes equals sorted full-width xxhash64 of the tokens") {
    val got = tokenDocs.toDF("id", "toks")
      .select(col("id"), ColumnBridge.column(
        TokenHashes(ColumnBridge.expression(col("toks")))).as("th"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, toks) <- tokenDocs)
      assert(got(id) == toks.map(xx).sorted, s"doc $id: $toks")
  }

  test("SortedIntersectCount equals set-intersection size on sorted distinct arrays") {
    val pairs = (0L until 40L).map { i =>
      val a = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted
      (i, a, b)
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), ColumnBridge.column(SortedIntersectCount(
        ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, a, b) <- pairs)
      assert(got(id) == a.toSet.intersect(b.toSet).size, s"case $id")
  }

  test("SimHash64 equals the per-bit majority-vote reference") {
    def ref(toks: Seq[String]): Long = {
      val w = new Array[Int](64)
      for (t <- toks; k <- 0 until 64)
        if (((xx(t) >>> k) & 1L) == 1L) w(k) += 1 else w(k) -= 1
      (0 until 64).foldLeft(0L)((acc, k) => if (w(k) > 0) acc | (1L << k) else acc)
    }
    val got = tokenDocs.toDF("id", "toks")
      .select(col("id"), ColumnBridge.column(
        SimHash64(ColumnBridge.expression(col("toks")))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, toks) <- tokenDocs)
      assert(got(id) == ref(toks), s"doc $id: $toks")
  }

  test("SignLshBuckets equals the sign-of-dot-product reference (zero vector included)") {
    val bands = 4; val rows = 8; val dim = 16; val seed = 42L
    val planes = (0 until bands).toArray
      .flatMap(b => SignLshBuckets.planes(rows, dim, seed + 7919L * b))
    def ref(v: Seq[Float]): Seq[Long] =
      (0 until bands).map { b =>
        (0 until rows).foldLeft(0L) { (bucket, j) =>
          val p = planes(b * rows + j)
          var dot = 0.0
          for (d <- 0 until math.min(v.length, dim)) dot += v(d).toDouble * p(d).toDouble
          if (dot > 0) bucket | (1L << j) else bucket
        }
      }
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian().toFloat))) :+
      (30L, Seq.fill(dim)(0.0f))
    val got = vecs.toDF("id", "v")
      .select(col("id"), ColumnBridge.column(SignLshBuckets(
        ColumnBridge.expression(col("v")), bands, rows, dim, seed)).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, v) <- vecs)
      assert(got(id) == ref(v), s"vec $id")
  }

  test("BandFirstMatch equals the first-equal-index reference") {
    val pairs = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(8)
      val a = Seq.fill(n)(rnd.nextInt(4).toLong)
      val b = Seq.fill(n)(rnd.nextInt(4).toLong)
      (i, a, b)
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), ColumnBridge.column(BandFirstMatch(
        ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, a, b) <- pairs) {
      val want = a.zip(b).indexWhere { case (x, y) => x == y }
      assert(got(id) == want, s"case $id: $a vs $b")
    }
  }

  test("StrDist matches published literature values and metric axioms") {
    import graft.functions.StrDist
    def u(s: String) = UTF8String.fromString(s)
    // published Jaro/Jaro–Winkler values (Winkler 1990's own examples)
    assert(math.abs(StrDist.jaro("martha", "marhta") - 0.9444444444444445) < 1e-12)
    assert(math.abs(StrDist.jaroWinkler(u("martha"), u("marhta")) - 0.9611111111111111) < 1e-12)
    assert(math.abs(StrDist.jaro("dixon", "dicksonx") - 0.7666666666666666) < 1e-12)
    assert(math.abs(StrDist.jaroWinkler(u("dixon"), u("dicksonx")) - 0.8133333333333332) < 1e-12)
    assert(math.abs(StrDist.jaroWinkler(u("duane"), u("dwayne")) - 0.84) < 1e-12)
    // boost gate: below 0.7 the prefix boost must NOT apply
    assert(StrDist.jaroWinkler(u("aXXXX"), u("aYYYY")) == StrDist.jaro("aXXXX", "aYYYY"))
    // empty-string convention (DuckDB core): either empty -> 0, even both
    assert(StrDist.jaro("", "") == 0.0 && StrDist.jaro("a", "") == 0.0)
    // TRUE Damerau-Levenshtein: ca->abc is 2 (OSA would say 3)
    assert(StrDist.damerau(u("ca"), u("abc")) == 2)
    assert(StrDist.damerau(u("abcd"), u("acbd")) == 1)
    assert(StrDist.damerau(u("ab"), u("ba")) == 1)
    assert(StrDist.damerau(u("kitten"), u("sitting")) == 3)
    assert(StrDist.hamming(u("abc"), u("abd")) == 1)
    // axioms over random strings: identity, symmetry, dl <= lev
    val alpha = "abcde"
    def rs() = Seq.fill(rnd.nextInt(8))(alpha(rnd.nextInt(alpha.length))).mkString
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    for (_ <- 0 until 200) {
      val (s, t) = (rs(), rs())
      assert(StrDist.damerau(u(s), u(s)) == 0)
      assert(StrDist.damerau(u(s), u(t)) == StrDist.damerau(u(t), u(s)))
      assert(StrDist.damerau(u(s), u(t)) <= lev(s, t), s"dl > lev for $s/$t")
      assert(math.abs(StrDist.jaroWinkler(u(s), u(t))
        - StrDist.jaroWinkler(u(t), u(s))) < 1e-12)
    }
  }

  test("NfcNormalize / StripAccents equal the java.text.Normalizer reference") {
    val pieces = Vector("caf\u00e9", "cafe\u0301", "d\u00e9j\u00e0", "\u00fc", "u\u0308", "plain",
      "\u00f1", "n\u0303", "", "mixed \u00e9e\u0301")
    val cases = (0L until 40L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(4))(pieces(rnd.nextInt(pieces.size))).mkString(" "))
    }
    def refNfc(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    def refStrip(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{Mn}+", "")
    val got = cases.toDF("id", "s")
      .select(col("id"),
        ColumnBridge.column(NfcNormalize(ColumnBridge.expression(col("s")))).as("n"),
        ColumnBridge.column(StripAccents(ColumnBridge.expression(col("s")))).as("a"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    for ((id, s) <- cases) {
      assert(got(id)._1 == refNfc(s), s"nfc case $id: ${s.map(_.toInt)}")
      assert(got(id)._2 == refStrip(s), s"strip case $id: ${s.map(_.toInt)}")
      // idempotence + composition sanity: NFC twice = once; strip kills marks
      assert(refNfc(refNfc(s)) == refNfc(s))
      assert(!refStrip(s).exists(c => Character.getType(c) == Character.NON_SPACING_MARK))
    }
  }
}
