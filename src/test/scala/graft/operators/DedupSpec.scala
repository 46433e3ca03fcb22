package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    "the quick brown fox jumps over the lazy dog in the morning light today",
    "completely different words about database engines and query optimization plans here",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")

  /** docs: for each base text, an exact copy (normalized-equal), a near
    * copy (one token changed), and an unrelated permutation.
    */
  private lazy val docs = {
    val rows = base.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.split(" ")
      val near = (toks.dropRight(1) :+ "changed").mkString(" ")
      Seq(
        (i * 10L, t),
        (i * 10L + 1, "  " + t.toUpperCase + "  "), // exact after normalization
        (i * 10L + 2, near))
    }
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups normalization-equal texts") {
    val groups = Dedup.exact(docs).collect()
    val dupGroups = groups.filter(_.getAs[Long]("cnt") > 1)
    assert(dupGroups.length === base.length)
    assert(dupGroups.forall(_.getAs[Long]("cnt") === 2))
    // keeper is the min id of each pair (i*10)
    assert(dupGroups.map(_.getAs[Long]("keeper")).sorted.toSeq === Seq(0L, 10L, 20L))
  }

  test("jaccardPairs finds near and exact duplicates, not unrelated pairs") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Double]("jacc")))
    // exact pairs at jacc 1.0
    assert(pairs.filter(_._3 == 1.0).map(p => (p._1, p._2)).toSet ===
      Set((0L, 1L), (10L, 11L), (20L, 21L)))
    // near pairs present with jacc in (0.5, 1)
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 2L && j > 0.5 && j < 1.0 })
    // no cross-base pairs
    assert(!pairs.exists { case (a, b, _) => a / 10 != b / 10 })
  }

  test("minHashPairs recall vs brute-force Jaccard ground truth") {
    val truth = Dedup.jaccardPairs(docs, threshold = 0.85)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val found = Dedup.minHashPairs(docs, bands = 8, rows = 8, verifyThreshold = 0.85)
      .select("da", "db").as[(Long, Long)].collect().toSet
    // verification step guarantees precision; banding should catch all
    // high-similarity pairs here (P[miss | j>=0.9] < 2%)
    assert(found.subsetOf(truth))
    assert(found === truth, s"missed: ${truth -- found}")
  }

  test("minHashClusters assigns component-min keepers; singletons keep themselves") {
    // at threshold 0.8 each base's exact + near copies form one component
    val keepers = Dedup.minHashClusters(docs, verifyThreshold = 0.8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keeper")).toMap
    assert(keepers.size === docs.count())
    for (base <- Seq(0L, 10L, 20L); off <- Seq(0L, 1L, 2L))
      assert(keepers(base + off) === base, s"doc ${base + off}")
    // at threshold 0.95 only the normalization-equal copy clusters; the
    // near copy (one token changed, j ≈ 0.85) becomes a singleton
    val strict = Dedup.minHashClusters(docs, verifyThreshold = 0.95)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keeper")).toMap
    for (base <- Seq(0L, 10L, 20L)) {
      assert(strict(base) === base)
      assert(strict(base + 1) === base)
      assert(strict(base + 2) === base + 2)
    }
  }

  test("minHashPairs hot-bucket cap drops degenerate buckets, keeps others") {
    // an aggressive cap of 1 drops every bucket that holds a pair → no output
    val capped = Dedup.minHashPairs(docs, bands = 8, rows = 8,
      verifyThreshold = 0.85, maxBucket = Some(1))
    assert(capped.count() === 0)
    // a cap above the largest cluster changes nothing
    val roomy = Dedup.minHashPairs(docs, bands = 8, rows = 8,
      verifyThreshold = 0.85, maxBucket = Some(100))
      .select("da", "db").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minHashPairs(docs, bands = 8, rows = 8,
      verifyThreshold = 0.85, maxBucket = None)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(roomy === uncapped)
  }

  test("minHashPairsPortable equals brute-force Jaccard pairs at its threshold") {
    // 16x4 banding at j >= 0.9 has miss prob ~4e-8 — on this fixture the
    // portable pipeline must return EXACTLY the brute-force pair set
    val out = Dedup.minHashPairsPortable(docs)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val texts = docs.as[(Long, String)].collect()
    def sets = texts.map { case (id, t) =>
      id -> t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSet
    }
    val truth = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.9
    } yield (a, b)).toSet
    assert(out == truth, s"portable=$out truth=$truth")
  }

  test("simHashPairsPortable: exact dups at hamming 0, unrelated pairs absent") {
    val out = Dedup.simHashPairsPortable(docs)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // normalization-equal copies collide at hamming 0
    for (i <- base.indices) assert(out((i * 10L, i * 10L + 1)) == 0L)
    // cross-base pairs (different content) never appear
    assert(out.keys.forall { case (a, b) => a / 10 == b / 10 })
  }

  test("minHash signature is deterministic and length numPerms") {
    val sig = docs.select(Dedup.minHashSignature(col("text"), numPerms = 16).as("sig"))
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(sig.length === 16)
    val sig2 = docs.select(Dedup.minHashSignature(col("text"), numPerms = 16).as("sig"))
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(sig === sig2)
  }

  test("jaccardPairs maxDf drops near-universal tokens self-consistently") {
    val texts = Seq(
      (0L, "zz apple banana cherry date"),
      (1L, "zz apple banana cherry fig"),
      (2L, "zz totally unrelated words here"),
      (3L, "zz another distinct document body"))
    val withHot = texts.toDF("doc_id", "text")
    val stripped = texts.map { case (i, t) => (i, t.replace("zz ", "")) }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame, cap: Option[Long]) =
      Dedup.jaccardPairs(df, threshold = 0.5, maxDf = cap).collect()
        .map(r => ((r.getAs[Long]("da"), r.getAs[Long]("db")), r.getAs[Double]("jacc"))).toMap
    // df("zz") = 4 > 3 → dropped from index AND sizes: capped result over
    // the hot-token corpus equals the uncapped result with "zz" removed
    assert(pairs(withHot, Some(3L)) === pairs(stripped, None))
    // sanity: uncapped, "zz" inflates the (0,1) similarity
    assert(pairs(withHot, None)((0L, 1L)) > pairs(withHot, Some(3L))((0L, 1L)))
  }

  test("simHashPairs: exact dups at hamming 0, unrelated pairs absent") {
    val pairs = Dedup.simHashPairs(docs, maxHamming = 3)
      .collect()
      .map(r => ((r.getAs[Long]("da"), r.getAs[Long]("db")), r.getAs[Long]("hamming")))
      .toMap
    assert(pairs((0L, 1L)) === 0L)
    assert(pairs((10L, 11L)) === 0L)
    // unrelated pairs (different base) must not appear within the radius
    assert(!pairs.keys.exists { case (a, b) => a / 10 != b / 10 })
  }

  test("deltaDedup classifies arrivals: exact copy, near variant, genuinely new") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "ALPHA beta   gamma delta epsilon"), // exact after normalization
      (11L, "one two three four five seven"), // 5/7 jaccard near
      (12L, "completely unrelated words here")).toDF("doc_id", "text")
    val out = Dedup.deltaDedup(base, delta, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(10L) == ("exact", 1L))
    assert(out(11L) == ("near", 2L))
    assert(out(12L) == ("new", 12L))
  }

  test("simHashPairs: radii beyond the pigeonhole guarantee fail fast") {
    // 4-chunk banding is exact only for hamming <= 3 — a wider radius
    // would silently drop valid pairs, so it must be rejected outright
    intercept[IllegalArgumentException](Dedup.simHashPairs(docs, maxHamming = 16))
    intercept[IllegalArgumentException](Dedup.simHashPairsPortable(docs, maxHamming = 4))
  }

  test("deltaMinHashKeepers: arrivals match their originals via the staged index, new docs absent") {
    val baseDf = docs // ids 0..32
    val delta = Seq(
      (100L, "  " + base(0).toUpperCase + "  "), // re-crawl of doc 0 (and its copy 1)
      (101L, base(2)), // re-crawl of doc 20/21
      (102L, "entirely novel content with no counterpart anywhere in the base corpus at all")
    ).toDF("doc_id", "text")
    val r = Dedup.deltaMinHashKeepers(baseDf, delta)
      .orderBy("id").as[(Long, Long, Double)].collect()
    // doc 100 matches base docs 0 AND 1 (both normalize equal) -> keeper = min = 0
    assert(r.map(x => (x._1, x._2)).toSeq === Seq((100L, 0L), (101L, 20L)),
      s"unexpected matches: ${r.mkString(",")}")
    assert(r.forall(_._3 == 1.0), "exact re-crawls must verify at jacc 1.0")
  }

  test("deltaMinHashKeepers maxBucket: hot base buckets are pruned before the probe; default stays un-capped") {
    // a hot family: many base docs with IDENTICAL text share every band
    // key, so each of their 16 keys collects `fam` postings — above a
    // cap of fam-1 every one is pruned and the re-crawl finds nothing;
    // un-capped (the registry/oracle default) it matches keeper = min id
    val fam = 6
    val hotBase = (0 until fam).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val arrival = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.deltaMinHashKeepers(hotBase, arrival)
      .as[(Long, Long, Double)].collect()
    assert(uncapped.toSeq === Seq((100L, 0L, 1.0)))
    val capped = Dedup.deltaMinHashKeepers(hotBase, arrival, maxBucket = Some(fam - 1))
    assert(capped.count() === 0L,
      "a bucket above the cap must be pruned from the probe entirely")
    // a cap ABOVE the bucket size changes nothing
    val roomy = Dedup.deltaMinHashKeepers(hotBase, arrival, maxBucket = Some(fam))
      .as[(Long, Long, Double)].collect()
    assert(roomy.toSeq === uncapped.toSeq)
  }

  test("winnowPairs: shared >= w+k-1 token run guarantees a pair; unrelated docs absent") {
    // winnowing guarantee: any run of >= w+k-1 = 7 shared tokens shares
    // at least one SELECTED fingerprint. Docs 0/1 share a 10-token run;
    // doc 2 shares nothing.
    val run = "one two three four five six seven eight nine ten"
    val d = Seq(
      (0L, s"$run alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"prefix padding words here $run suffix tail words end"),
      (2L, "wholly disjoint vocabulary nothing matches anything else at all today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, minShared = 1L)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"planted shared run not detected: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"spurious pair with doc 2: $pairs")
    // exact copy: containment 1.0 against itself-shaped twin
    val exact = Seq((0L, run), (1L, run)).toDF("doc_id", "text")
    val e = Dedup.winnowPairs(exact, minShared = 1L)
      .select("da", "db", "containment").as[(Long, Long, Double)].collect()
    assert(e.toSeq == Seq((0L, 1L, 1.0)), s"exact twin: ${e.mkString(",")}")
  }

  test("editDistancePairs: deletion-index candidates equal the brute-force pair set") {
    // insert / delete / substitute / transposed-as-2-subs + planted noise
    val vocab = Seq("kitten", "kittens", "mitten", "kitte", "sitting",
      "spark", "shark", "sprk", "banana", "bananas", "query", "queries")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (maxDist <- Seq(1, 2)) {
      val got = Dedup.editDistancePairs(vocab.toDF("term"), maxDist)
        .as[(String, String, Long)].collect().toSet
      val want = (for {
        a <- vocab; b <- vocab if a < b
        d = lev(a, b) if d <= maxDist
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"maxDist=$maxDist: got ${got.size}, want ${want.size}")
    }
  }

  test("substrDupSpans matches the brute-force duplicated-window islands") {
    import spark.implicits._
    val L = 8
    // shared phrase "the quick brown fox" (> L) across docs 1/2; doc 3
    // repeats a phrase WITHIN itself; doc 4 unique; doc 5 shorter than L
    val docs = Seq(
      (1L, "AAAA the quick brown fox jumped BBBB xyzzy"),
      (2L, "CC the quick brown fox jumped DDDDDD"),
      (3L, "hello worlds! pad hello worlds! qq"),
      (4L, "completely unique text with no repeats at all"),
      (5L, "tiny")).toDF("doc_id", "text")
    val got = Dedup.substrDupSpans(docs, minLen = L)
      .as[(Long, Long, Long)].collect().toSet
    // brute force: every L-window with corpus df >= 2, merged to islands
    val rows = docs.as[(Long, String)].collect()
    val all = rows.filter(_._2.length >= L)
      .flatMap { case (id, t) => (0 to t.length - L).map(i => (id, i, t.substring(i, i + L))) }
    val df2 = all.groupBy(_._3).filter(_._2.length >= 2).keySet
    val want = rows.map(_._1).flatMap { id =>
      val ps = all.filter(e => e._1 == id && df2(e._3)).map(_._2).sorted
      val spans = ps.foldLeft(Vector.empty[(Long, Long)]) { (acc, p) =>
        acc.lastOption match {
          case Some((s, e)) if p <= e => acc.init :+ (s, math.max(e, p + L).toLong)
          case _                      => acc :+ (p.toLong, (p + L).toLong)
        }
      }
      spans.map { case (s, e) => (id, s, e) }
    }.toSet
    assert(got == want)
    assert(got.exists(_._1 == 3L), "within-doc repeat must be detected")
    assert(!got.exists(s => s._1 == 4L || s._1 == 5L))
  }

  test("substrDupSpansFast (rolling hash) produces the md5 path's spans exactly") {
    import spark.implicits._
    // randomized corpus with planted repeats: shared sentences across
    // docs, a within-doc repeat, plus unique noise
    val rnd = new scala.util.Random(7)
    def noise(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val shared = "the shared boilerplate sentence that repeats verbatim"
    val docs = (1L to 12L).map { id =>
      val parts = Seq(noise(30), if (id % 3 == 0) shared else noise(20),
        noise(25), if (id % 4 == 0) shared else noise(15),
        if (id == 7L) "inner repeat inner repeat inner repeat" else noise(10))
      (id, parts.mkString(" "))
    }.toDF("doc_id", "text")
    for (l <- Seq(8, 12, 40)) {
      val md5Spans = Dedup.substrDupSpans(docs, minLen = l)
        .as[(Long, Long, Long)].collect().toSet
      val fastSpans = Dedup.substrDupSpansFast(docs, minLen = l)
        .as[(Long, Long, Long)].collect().toSet
      assert(fastSpans == md5Spans, s"minLen=$l: rolling-hash spans diverged")
      assert(md5Spans.nonEmpty, s"minLen=$l: fixture planted no duplicates")
    }
  }

  test("substrDupSpansFast matches md5 spans on non-BMP text (code points, not code units)") {
    import spark.implicits._
    // Supplementary-plane characters occupy two UTF-16 code units but
    // ONE code point; the rolling-hash path must index like Spark SQL
    // substring (code points) or spans shift and strip offsets corrupt.
    val emoji = "😀😁" // 😀😁 — 2 code points, 4 code units
    val shared = s"dup${emoji}licated segment $emoji here"
    val docs = Seq(
      (1L, s"$emoji prefix $shared suffix one"),
      (2L, s"other ${emoji}pre $shared tail"),
      (3L, s"no repeats $emoji at all in this"),
    ).toDF("doc_id", "text")
    for (l <- Seq(6, 10)) {
      val md5Spans = Dedup.substrDupSpans(docs, minLen = l)
        .as[(Long, Long, Long)].collect().toSet
      val fastSpans = Dedup.substrDupSpansFast(docs, minLen = l)
        .as[(Long, Long, Long)].collect().toSet
      assert(fastSpans == md5Spans, s"minLen=$l: non-BMP spans diverged")
      assert(md5Spans.nonEmpty, s"minLen=$l: fixture planted no duplicates")
    }
    // strip must excise the duplicate cleanly even with emoji around it
    val stripped = Dedup.substrStrip(docs, minLen = 10)
      .select("doc_id", "kept").as[(Long, String)].collect().toMap
    assert(!stripped(1L).contains("licated segment"))
    assert(stripped(3L) == s"no repeats $emoji at all in this")
  }

  test("RollingWindowHashes: hash equality tracks substring equality") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val texts = Seq("abcabcabc", "xyabcde", "abc", "ab", "").toDF("t")
    val l = 3
    val got = texts.select(col("t"), ColumnBridge.column(
        graft.functions.RollingWindowHashes(ColumnBridge.expression(col("t")), l)).as("h"))
      .as[(String, Seq[Long])].collect()
    for ((t, hs) <- got) {
      assert(hs.length == math.max(0, t.length - l + 1), s"'$t': wrong window count")
      val wins = (0 until hs.length).map(i => t.substring(i, i + l))
      for (i <- hs.indices; j <- hs.indices)
        assert((hs(i) == hs(j)) == (wins(i) == wins(j)),
          s"'$t': hash/substring equality mismatch at ($i,$j)")
    }
  }

  test("substrStrip removes exactly the duplicated regions") {
    import spark.implicits._
    val L = 8
    val docs = Seq(
      (1L, "AAAA the quick brown fox jumped BBBB"),
      (2L, "CC the quick brown fox jumped DDDDDD"),
      (3L, "no repeats whatsoever in here")).toDF("doc_id", "text")
    val spans = Dedup.substrDupSpans(docs, minLen = L)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val got = Dedup.substrStrip(docs, minLen = L)
      .as[(Long, String, String)].collect()
    for ((id, text, kept) <- got) {
      val want = spans.getOrElse(id, Array.empty).sortBy(_._2)
        .foldLeft(("", 0L)) { case ((acc, cur), (_, s, e)) =>
          (acc + text.substring(cur.toInt, s.toInt), e)
        } match { case (acc, cur) => acc + text.substring(cur.toInt) }
      assert(kept == want, s"doc $id")
    }
    assert(got.find(_._1 == 3L).get._3 == "no repeats whatsoever in here")
  }

  test("editDistancePairs: maxDf cap drops promiscuous short-variant buckets only") {
    // 1-char terms all collide through the "" variant; cap 2 kills that
    // bucket while the long-term pair survives through its own variants
    val vocab = Seq("a", "b", "c", "d", "longword", "longwords")
    val got = Dedup.editDistancePairs(vocab.toDF("term"), maxDist = 1, maxDf = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("longword", "longwords", 1L)))
    assert(!got.exists(p => p._1.length == 1 && p._2.length == 1))
  }

  test("prefixJaccardPairs equals brute-force jaccardPairs on a seeded random corpus") {
    // 60 docs drawn from a 40-word vocabulary with planted near-dups:
    // enough collision structure that candidates, prunes, and verifies
    // all fire
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val rows = (0 until 30).flatMap { i =>
      val toks = rnd.shuffle(vocab).take(8 + rnd.nextInt(6))
      val near = (toks.dropRight(1) :+ s"w${rnd.nextInt(40)}").distinct
      Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, near.mkString(" ")))
    }
    val corpus = rows.toDF("doc_id", "text")
    for (tau <- Seq(0.5, 0.8)) {
      val truth = Dedup.jaccardPairs(corpus, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      val got = Dedup.prefixJaccardPairs(corpus, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      assert(got === truth, s"tau=$tau: prefix-filtered != brute force")
    }
  }

  test("prefixJaccardPairs: prefixes are the rarest tokens and actually prune") {
    // a stop-word shared by ALL docs must never become a candidate key:
    // docs pairwise share ONLY 'the'; at tau=0.5 prefixes exclude it
    // (it sorts last by df) and no candidate pair survives
    val corpus = (0 until 20)
      .map(i => (i.toLong, s"the unique$i only$i token$i here$i body$i"))
      .toDF("doc_id", "text")
    assert(Dedup.prefixJaccardPairs(corpus, threshold = 0.5).count() == 0L)
    // brute force agrees (jaccard 1/11 < 0.5) — but the point is the
    // prefix join never built the 190-pair hot-token bucket
  }

  test("fellegiSunter EM separates agree-everywhere from disagree-everywhere patterns") {
    val pat = Seq((1L, 1L, 1L, 100L), (0L, 0L, 0L, 900L), (1L, 1L, 0L, 10L), (0L, 1L, 0L, 20L))
      .toDF("g1", "g2", "g3", "n")
    val out = Dedup.fellegiSunter(pat, iters = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getDouble(4), r.getString(6)))).toMap
    assert(out((1L, 1L, 1L))._1 > 0.95 && out((1L, 1L, 1L))._2 == "match",
      s"all-agree should be a confident match: ${out((1L, 1L, 1L))}")
    assert(out((0L, 0L, 0L))._1 < 0.05 && out((0L, 0L, 0L))._2 == "nonmatch",
      s"all-disagree should be a confident nonmatch: ${out((0L, 0L, 0L))}")
  }

  test("fellegiSunter degenerate: a single pattern still yields a defined, clamped fit") {
    val pat = Seq((1L, 1L, 1L, 50L)).toDF("g1", "g2", "g3", "n")
    val out = Dedup.fellegiSunter(pat, iters = 5).collect()
    assert(out.length == 1)
    val r = out.head
    // nothing to separate: the fit must stay finite (clamps prevent
    // ln(0)/div-zero), the posterior defined, and a decision emitted
    assert(!r.isNullAt(4) && !r.getDouble(4).isNaN, s"posterior must be defined: $r")
    assert(!r.isNullAt(5) && !r.getDouble(5).isInfinite, s"lnlr must be finite: $r")
    assert(Set("match", "review", "nonmatch")(r.getString(6)))
  }

  test("snmCandidates degenerate: all-identical keys pair only within the window") {
    val recs = (1L to 40L).map(i => (i, "blockpfx-same")).toDF("id", "key")
    val got = Dedup.snmCandidates(recs, w = 3, maxDist = 0).collect()
    // each of the first n-1 rows pairs with its next 1-2 neighbors:
    // (n-1) + (n-2) pairs, every dist 0 — the hot-key blast radius stays
    // linear in the window, never quadratic in the tie group
    assert(got.length == 39 + 38, s"expected ${39 + 38} window pairs, got ${got.length}")
    assert(got.forall(_.getLong(2) == 0L))
  }

  test("snmCandidates pairs only within the sliding window, gated by edit distance") {
    // four keys share the 8-char block prefix "blockpfx" and sort a..d;
    // w=3 compares each with the next 2 — (a,d) is 3 apart and must NOT
    // pair even though dist(a,d) is small; zzz-far is another block
    val recs = Seq(
      (1L, "blockpfx-a"), (2L, "blockpfx-b"), (3L, "blockpfx-c"), (4L, "blockpfx-d"),
      (5L, "zzzzzzzzzz-far")
    ).toDF("id", "key")
    val got = Dedup.snmCandidates(recs, w = 3, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)),
      s"got $got")
  }
}
