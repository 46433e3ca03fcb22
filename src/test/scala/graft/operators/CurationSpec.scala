package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("c4Clean: line retention rules and page-level drops, hand-checked") {
    val docs = Seq(
      // 3 good lines -> kept page
      (1L, "this is a fine sentence.\nanother good line here!\nthird one also fine?"),
      // terminal-punctuation and word-count rules drop lines -> too few kept
      (2L, "no terminal punctuation\ntoo short.\nthis one is long enough."),
      // javascript / brace lines dropped; page itself has a brace -> dropped
      (3L, "enable javascript to view.\nfunction f() { return.\ngood line over here."),
      // lorem ipsum kills the page even with good lines
      (4L, "lorem ipsum dolor sit amet.\nperfectly good line here.\nanother good line too.\nthird good line stays.")
    ).toDF("doc_id", "text")
    val r = Curation.c4Clean(docs).orderBy("id")
      .select("id", "n_lines", "n_kept", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(r === Array((1L, 3L, 3L, true), (2L, 3L, 1L, false),
      (3L, 3L, 1L, false), (4L, 4L, 4L, false)))
  }

  test("gopherFlags: each statistic hand-computed on a tiny doc") {
    val docs = Seq((1L, "the cat and the hat...\n- a list item\nplain line #")).toDF("doc_id", "text")
    val r = Curation.gopherFlags(docs, minWords = 5, minStopwords = 2).head()
    assert(r.getAs[Long]("n_words") === 12L)
    // words: the cat and the hat... - a list item plain line #
    // lengths 3+3+3+3+6 + 1 + 1+4+4 + 5+4+1 = 38
    assert(r.getAs[Double]("mean_len") === math.rint(38.0 / 12 * 1e6) / 1e6)
    assert(r.getAs[Double]("symbol_ratio") === math.rint(2.0 / 12 * 1e6) / 1e6)
    assert(r.getAs[Double]("bullet_frac") === 0.333333)
    assert(r.getAs[Double]("ellipsis_frac") === 0.333333)
    // "-" and "#" carry no alphabetic char: 10/12
    assert(r.getAs[Double]("alpha_frac") === 0.833333)
    assert(r.getAs[Long]("n_stop") === 3L) // the, and, a
    assert(r.getAs[Boolean]("pass_words") && r.getAs[Boolean]("pass_stop"))
    assert(!r.getAs[Boolean]("pass_ellipsis")) // 1/3 > 0.3
    assert(!r.getAs[Boolean]("keep"))
  }

  test("repetitionMetrics: hand-computed fractions") {
    val df = Seq((1L, "a a b"), (2L, "x y z"), (3L, "p p p p")).toDF("id", "text")
    val m = Curation.repetitionMetrics(col("text"))
    val r = df.select(col("id") +: m.map { case (n, c) => c.as(n) }: _*)
      .orderBy("id").collect()
    def near(a: Double, b: Double): Boolean = math.abs(a - b) <= 1e-6
    // "a a b": 3 toks, 2 distinct, top word "a" ×2, grams [a a, a b] all distinct
    assert(r(0).getLong(1) == 3L)
    assert(near(r(0).getDouble(2), 2.0 / 3))
    assert(near(r(0).getDouble(3), 2.0 / 3))
    assert(r(0).getDouble(4) == 0.0)
    // "x y z": fully distinct
    assert(r(1).getDouble(2) == 1.0 && near(r(1).getDouble(3), 1.0 / 3))
    // "p p p p": grams [p p, p p, p p] → dup frac 2/3
    assert(near(r(2).getDouble(4), 2.0 / 3))
  }

  test("corpusBudget keeps the maximal priority prefix within the token budget") {
    // 40 docs of varying token counts; compare against the single-window
    // reference computed driver-side from the same md5 priorities
    val docs = (1L to 40L)
      .map(i => (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "))).toDF("doc_id", "text")
    val budget = 60L
    val got = Curation.corpusBudget(docs, budget).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: order by (md5(id), id), running sum, cut at budget
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def pri(i: Long): String =
      md5.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = (1L to 40L).map(i => (i, (i % 7) + 1)).sortBy { case (i, _) => (pri(i), i) }
    val ref = ordered.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (i, n)) => (i, n, cum + n) }
      .tail.takeWhile(_._3 <= budget).sortBy(_._1)
    assert(got.toSeq == ref)
    // the NEXT doc in priority order would overflow (prefix is maximal)
    val lastCum = ref.map(_._3).max
    val nextN = ordered.drop(ref.length).headOption.map(_._2)
    nextN.foreach(n => assert(lastCum + n > budget))
  }

  test("corpusBudgetByStratum enforces each stratum's budget independently") {
    val docs = (1L to 30L)
      .map(i => (i, if (i % 3 == 0) "a" else "b", Seq.fill((i % 5).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val got = Curation.corpusBudgetByStratum(docs,
        budgets = Map("a" -> 10L), stratumCol = "lang", defaultBudget = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byStratum = got.groupBy(_._1)
    // within-stratum totals respect each budget
    assert(byStratum("a").map(_._3).sum <= 10L)
    assert(byStratum("b").map(_._3).sum <= 5L)
    // cum_tokens is a within-stratum running total: max equals the sum
    for ((_, rows) <- byStratum)
      assert(rows.map(_._4).max == rows.map(_._3).sum)
    // deterministic: same input → same kept set
    val again = Curation.corpusBudgetByStratum(docs,
        budgets = Map("a" -> 10L), stratumCol = "lang", defaultBudget = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(_._2).toSeq == again.sortBy(_._2).toSeq)
  }

  test("corpusBudget: zero budget keeps nothing, huge budget keeps everything") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    assert(Curation.corpusBudget(docs, 0L).count() == 0L)
    val all = Curation.corpusBudget(docs, 1000L).collect()
    assert(all.length == 2 && all.map(_.getLong(1)).sum == 3L)
  }

  test("dedupFold merges case/digit/punctuation variants, keeps real differences") {
    val df = Seq(
      (1L, "Release v2.14 (final)!"),
      (2L, "release V9.03 -- FINAL"),
      (3L, "a genuinely different document")).toDF("id", "text")
    val folded = df.select(col("id"), TextAnalysis.dedupFold(col("text")).as("f"))
      .orderBy("id").collect().map(_.getString(1))
    assert(folded(0) == "release v0 00 final")
    assert(folded(0) == folded(1), "variants must fold to the same text")
    assert(folded(2) != folded(0))
  }

  test("scrubPii redacts emails, IPs, phones and is idempotent") {
    val df = Seq(
      "mail a.b+c@foo-bar.org and x@y.io here",
      "server 192.168.0.1 dialed 555-0142",
      "clean text no pii").toDF("text")
    val out = df.select(Curation.scrubPii(col("text")).as("s")).as[String].collect()
    assert(out(0) == "mail <EMAIL> and <EMAIL> here")
    assert(out(1) == "server <IP> dialed <PHONE>")
    assert(out(2) == "clean text no pii")
    val twice = df.select(Curation.scrubPii(Curation.scrubPii(col("text"))).as("s"))
      .as[String].collect()
    assert(twice.sameElements(out))
  }

  test("piiColumns counts each category once per hit") {
    val df = Seq("a@b.co c@d.org 10.0.0.1 555-1234 999-123").toDF("text")
    val cols = Curation.piiColumns(col("text"))
    val r = df.select(cols.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(r.getAs[Long]("n_email") == 2L)
    assert(r.getAs[Long]("n_ip") == 1L)
    assert(r.getAs[Long]("n_phone") == 1L) // 999-123 is not NNN-NNNN
  }

  test("domainCap keeps at most cap per domain, deterministically") {
    val docs = (1L to 100L).map(i => (i, s"d${i % 3}")).toDF("doc_id", "src")
    val capped = Curation.domainCap(docs, "src", "doc_id", cap = 5)
    val byDomain = capped.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDomain.values.forall(_ == 5L))
    // rank contiguous 1..5 and stable under repartitioning
    val again = Curation.domainCap(docs.repartition(7), "src", "doc_id", cap = 5)
    assert(capped.orderBy("domain", "rn").collect()
      .sameElements(again.orderBy("domain", "rn").collect()))
    val small = Curation.domainCap(docs.filter(col("doc_id") <= 4), "src", "doc_id", cap = 5)
    assert(small.count() == 4) // cap above group size keeps everything
  }

  test("epochMix repeats each row weight(stratum) times with 1-based epochs") {
    val docs = Seq((1L, "hi"), (2L, "lo"), (3L, "xx")).toDF("doc_id", "tier")
    val mixed = Curation.epochMix(docs, "tier", Map("hi" -> 3, "lo" -> 1))
    val counts = mixed.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 1L, 3L -> 1L)) // default weight 1
    val epochs = mixed.filter(col("doc_id") === 1).select("epoch").as[Long].collect().sorted
    assert(epochs.sameElements(Array(1L, 2L, 3L)))
  }

  test("epochMix weight 0 drops the stratum (sequence must not count down)") {
    val docs = Seq((1L, "keep"), (2L, "drop")).toDF("doc_id", "tier")
    val mixed = Curation.epochMix(docs, "tier", Map("keep" -> 2, "drop" -> 0))
    val ids = mixed.select("doc_id").as[Long].collect()
    assert(ids.forall(_ == 1L) && ids.length == 2)
  }

  test("chunkDedup drops repeated chunks, keeps first owner, reassembles in order") {
    // doc 1 owns both chunks; doc 2 repeats doc 1's first chunk exactly
    // and contributes one fresh chunk; doc 3 is entirely doc 1's text.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d w x y z"),
      (3L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = Curation.chunkDedup(docs, chunkTokens = 4).orderBy("id").collect()
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2L) // doc 1 keeps all
    assert(r(1).getLong(1) == 2L && r(1).getLong(2) == 1L) // doc 2 loses "a b c d"
    assert(r(2).getLong(1) == 2L && r(2).getLong(2) == 0L) // doc 3 loses everything
    // doc 2's surviving text is exactly its second chunk
    val fpWxyz = docs.sparkSession.sql("SELECT md5('w x y z')").collect()(0).getString(0)
    assert(r(1).getString(3) == fpWxyz)
    // fully-dropped doc hashes the empty string
    val fpEmpty = docs.sparkSession.sql("SELECT md5('')").collect()(0).getString(0)
    assert(r(2).getString(3) == fpEmpty)
  }

  test("chunkDedup: short tail chunk participates like any other") {
    val docs = Seq((1L, "a b c d e"), (2L, "e")).toDF("doc_id", "text")
    // doc 1 → chunks ["a b c d", "e"]; doc 2 → ["e"] which doc 1 owns
    val r = Curation.chunkDedup(docs, chunkTokens = 4).orderBy("id").collect()
    assert(r(0).getLong(2) == 2L)
    assert(r(1).getLong(2) == 0L)
  }

  test("chunkDedup property: kept chunks are exactly the global first-owners") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    // random docs over a tiny vocab force plenty of chunk collisions
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 4
    val df = docs.toDF("doc_id", "text")
    val result = Curation.chunkDedup(df, chunkTokens = k)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // brute force: enumerate chunks, first (doc, idx) per distinct text wins
    val chunks = docs.flatMap { case (id, text) =>
      text.split(" ").grouped(k).zipWithIndex.map { case (c, ci) => (id, ci, c.mkString(" ")) }
    }
    val firstOwner = chunks.groupBy(_._3).map { case (t, cs) =>
      t -> cs.map(c => (c._1, c._2)).min
    }
    val expectKept = chunks.filter(c => firstOwner(c._3) == ((c._1, c._2)))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    docs.foreach { case (id, text) =>
      val nChunks = (text.split(" ").length + k - 1) / k
      assert(result(id)._2 == nChunks.toLong, s"doc $id n_chunks")
      assert(result(id)._3 == expectKept.getOrElse(id, 0L), s"doc $id n_kept")
    }
    // every distinct chunk text is kept exactly once corpus-wide
    assert(result.values.map(_._3).sum == firstOwner.size.toLong)
  }

  test("hashSplit: covers all rows, roughly proportional, stable under growth") {
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val split = Curation.hashSplit(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1700 && counts("train") < 1900)
    assert(counts.getOrElse("val", 0L) > 50 && counts.getOrElse("test", 0L) > 50)
    // growth stability: assignments of the first 1000 ids are unchanged
    // when the corpus doubles — the property random-split lacks
    val small = Curation.hashSplit(docs.filter(col("doc_id") < 1000), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val bigFirst = split.filter(col("doc_id") < 1000)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small == bigFirst)
  }

  test("cdcChunks: edits shift only the containing chunk (fixed-size chunking cannot)") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val edited = "inserted " + text // one token prepended
    val docs = Seq((1L, text), (2L, edited)).toDF("doc_id", "text")
    val chunks = Curation.cdcChunks(docs, divisor = 8)
      .select("id", "chunk_fp").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // all chunks after the first boundary are content-identical: the
    // edited doc shares every original chunk except the one containing
    // the insertion point
    val shared = chunks(1L) & chunks(2L)
    assert(shared.size >= chunks(1L).size - 1, s"CDC lost alignment: ${chunks(1L).size} vs shared ${shared.size}")
    // sanity: token totals conserved
    val totals = Curation.cdcChunks(docs, divisor = 8)
      .groupBy("id").agg(sum("n_chunk_tokens").as("n")).as[(Long, Long)].collect().toMap
    assert(totals(1L) == 60L && totals(2L) == 61L)
  }

  test("centroidScores: identical vectors score 1.0 against their centroid") {
    val e = Seq(
      (1L, 0, Seq(1f, 0f, 0f)),
      (2L, 0, Seq(1f, 0f, 0f)),
      (3L, 1, Seq(0f, 3f, 4f))).toDF("vec_id", "label", "embedding")
    val r = Curation.centroidScores(e).orderBy("id")
      .select("cos_centroid").as[Double].collect()
    assert(r(0) == 1.0 && r(1) == 1.0 && r(2) == 1.0)
  }

  test("centroidScores: orthogonal members score symmetrically") {
    val e = Seq(
      (1L, 0, Seq(1f, 0f)),
      (2L, 0, Seq(0f, 1f))).toDF("vec_id", "label", "embedding")
    // centroid (0.5, 0.5): cos = 0.5 / (1 * sqrt(0.5)) = 0.7071
    val r = Curation.centroidScores(e).select("cos_centroid").as[Double].collect()
    assert(r.forall(v => math.abs(v - 0.7071) < 1e-9))
  }

  test("dupNgramFraction: shared spans counted, unique docs score 0, short docs absent") {
    val boiler = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa"), // shares exactly the 9-token boilerplate
      (3L, "one two three four five six seven eight nine ten"), // fully unique
      (4L, "too short")).toDF("doc_id", "text")
    val r = Curation.dupNgramFraction(docs, k = 8)
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 3L), "short doc must emit no shingles")
    // the 9-token boilerplate contributes exactly two shared 8-grams
    assert(r(0)._3 === 2L && r(1)._3 === 2L)
    assert(r(2)._3 === 0L && r(2)._4 === 0.0)
    // doc1: 14 tokens -> 7 shingles; frac = 2/7
    assert(math.abs(r(0)._4 - math.rint(2.0 / 7 * 1e6) / 1e6) < 1e-9)
  }

  test("dupCoverage: interval union merges overlaps and splits across gaps") {
    val run = "a b c d e f g h" // one 8-token window
    val docs = Seq(
      // the run at pos 0 and pos 11 (gap > 8): two disjoint spans = 16 tokens
      (1L, s"$run x1 y1 z1 $run"),
      // 9 tokens fully shared with doc 3: dup windows at pos 0 and 1
      // OVERLAP -> union is 9 tokens, coverage 1.0
      (2L, "p q r s t u v w x"),
      (3L, "p q r s t u v w x o1 o2 o3 o4 o5 o6 o7 o8"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9") // no duplicated window
    ).toDF("doc_id", "text")
    val r = Curation.dupCoverage(docs, k = 8)
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    assert(r(0)._1 === 1L && r(0)._2 === 19L && r(0)._3 === 16L)
    assert(r(1)._1 === 2L && r(1)._3 === 9L && r(1)._4 === 1.0)
    assert(r(2)._1 === 3L && r(2)._3 === 9L) // shared prefix only
    assert(r(3)._1 === 4L && r(3)._3 === 0L && r(3)._4 === 0.0)
  }

  test("corpusBudgetByStratum with budgets-as-data equals the Map form; absent strata drop") {
    val docs = (1L to 30L).map { i =>
      (i, if (i % 3 == 0) "a" else "b", ("tok " * (i % 5 + 1).toInt).trim)
    }.toDF("doc_id", "stratum", "text")
    val asMap = Curation.corpusBudgetByStratum(docs, Map("a" -> 12L, "b" -> 7L), "stratum")
      .orderBy("stratum", "id").collect().toSeq
    val budgets = Seq(("a", 12L), ("b", 7L)).toDF("stratum", "budget")
    val asData = Curation.corpusBudgetByStratum(docs, budgets, "stratum", "doc_id", "text")
      .orderBy("stratum", "id").collect().toSeq
    assert(asMap == asData, "the two budget forms must agree row-for-row")
    val onlyA = Curation.corpusBudgetByStratum(docs,
        Seq(("a", 12L)).toDF("stratum", "budget"), "stratum", "doc_id", "text")
      .select("stratum").distinct().as[String].collect().toSeq
    assert(onlyA == Seq("a"), "strata absent from the budget table must drop")
  }

  test("qualityModelColumns matches an independent per-token recomputation") {
    val buckets = 128
    val w = Curation.demoWeightsMilli(buckets)
    val texts = Seq((1L, "the quick brown fox"), (2L, "alpha beta gamma delta epsilon"))
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
      (java.lang.Long.parseLong(hex, 16) % buckets).toInt
    }
    val expected = texts.map { case (id, t) =>
      val toks = t.split(" ")
      val logit = BigDecimal(toks.map(tk => w(bucket(tk))).sum / (1000.0 * toks.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> logit
    }.toMap
    val cols = Curation.qualityModelColumns(col("toks"), w, buckets)
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected, s"logits diverge: got $got expected $expected")
  }

  test("waterfill: saturated prefix, uniform level, sums to budget; full-budget edge") {
    val caps = Seq(("a", 100L), ("b", 1000L), ("c", 5000L), ("d", 5000L)).toDF("stratum", "cap")
    val r = Curation.waterfill(caps, budget = 4100L)
      .orderBy("stratum").as[(String, Long, Boolean, Double)].collect()
    // level θ = (4100 - 1100) / 2 = 1500: a and b saturate, c/d get 1500 each
    assert(r.map(x => (x._1, x._3, x._4)).toSeq ===
      Seq(("a", true, 100.0), ("b", true, 1000.0), ("c", false, 1500.0), ("d", false, 1500.0)))
    assert(r.map(_._4).sum === 4100.0)
    // budget >= total caps: everything saturates, allocs are the caps
    val full = Curation.waterfill(caps, budget = 20000L)
      .orderBy("stratum").as[(String, Long, Boolean, Double)].collect()
    assert(full.forall(_._3) && full.map(_._4).toSeq === Seq(100.0, 1000.0, 5000.0, 5000.0))
  }

  test("stripBoilerplate removes cross-doc repeated lines, keeps order, handles emptied docs") {
    val docs = Seq(
      (1L, "copyright acme\nunique one\nfooter nav"),
      (2L, "copyright acme\nunique two\nfooter nav"),
      (3L, "copyright acme\nfooter nav"), // all lines boilerplate → emptied
      (4L, "only original content here")
    ).toDF("doc_id", "text")
    val r = Curation.stripBoilerplate(docs, minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    assert(r.toSeq === Seq(
      (1L, 3L, 1L, "unique one"),
      (2L, 3L, 1L, "unique two"),
      (3L, 2L, 0L, ""),
      (4L, 1L, 1L, "only original content here")))
  }

  test("stripBoilerplate: within-doc repetition alone does not trip the distinct-doc threshold") {
    val docs = Seq((1L, "echo\necho\necho"), (2L, "other stuff")).toDF("doc_id", "text")
    val r = Curation.stripBoilerplate(docs, minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    assert(r.head === ((1L, 3L, 3L, "echo\necho\necho")))
  }

  test("trainQualityModel learns signed weights separating the labeled classes") {
    // class-symmetric construction: the shared token's gradient cancels
    val docs = Seq(
      (1L, "good good fine", "pos"), (2L, "good nice fine", "pos"),
      (3L, "bad bad fine", "neg"), (4L, "bad worse fine", "neg")
    ).toDF("doc_id", "text", "source")
    val w = Curation.trainQualityModel(docs, label = col("source") === "pos",
        buckets = 64, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    // class-exclusive tokens pull their buckets apart; the shared token
    // ("fine", equal mass both classes) stays at zero gradient
    assert(w(bucket("good")) > 0.0)
    assert(w(bucket("bad")) < 0.0)
    assert(math.abs(w(bucket("fine"))) < 1e-6)
    // untouched buckets remain exactly zero
    val used = Seq("good", "nice", "fine", "bad", "awful", "worse").map(bucket).toSet
    assert(w.filterNot(kv => used.contains(kv._1)).values.forall(_ == 0.0))
  }

  test("fixMojibake repairs the digraph table and is idempotent; count detects") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "cafÃ© au lait"),          // Ã© → é
      (2L, "donâ€™t â€œquoteâ€¦"),    // cp1252 punctuation
      (3L, "plain ascii text"),       // untouched
      (4L, "Ã¼ber naÃ¯ve")            // Ã¯ NOT in the table → survives
    ).toDF("id", "t")
    val r = rows.select(col("id"), Curation.fixMojibake(col("t")).as("f"),
        Curation.mojibakeCount(col("t")).as("c"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(r(0)._2 === "café au lait" && r(0)._3 === 1L)
    assert(r(1)._2 === "don't \"quote…" && r(1)._3 === 3L)
    assert(r(2)._2 === "plain ascii text" && r(2)._3 === 0L)
    assert(r(3)._2 === "über naÃ¯ve" && r(3)._3 === 1L) // only Ã¼ repaired
    // idempotence: repaired text has zero remaining markers from the table
    val again = rows.select(Curation.mojibakeCount(Curation.fixMojibake(col("t"))).as("c"))
      .as[Long].collect()
    assert(again.take(3).forall(_ === 0L))
  }

  test("softDedupWeights: weight is 1/df of the fold fingerprint") {
    val docs = Seq(
      (1L, "Hello World 2024!"), (2L, "hello world 1999?"), // fold-equal
      (3L, "hello world 1999?"),                            // exact dup too
      (4L, "something else")
    ).toDF("doc_id", "text")
    val r = Curation.softDedupWeights(docs)
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(r.map(_._2).toSeq === Seq(3L, 3L, 3L, 1L))
    assert(r.map(_._3).toSeq === Seq(0.333333, 0.333333, 0.333333, 1.0))
  }

  test("doremiWeights upweights high-excess-loss domains; weights sum to ~1") {
    val losses = Seq(("easy", 2.0), ("mid", 2.5), ("hard", 4.0)).toDF("domain", "loss")
    val r = Curation.doremiWeights(losses, iters = 5, eta = 0.5)
      .as[(String, Double, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(r("hard") > r("mid") && r("mid") > r("easy"))
    assert(math.abs(r.values.sum - 1.0) < 1e-4, s"weights must average-normalize: $r")
    // zero excess everywhere → uniform mixture
    val uni = Curation.doremiWeights(
        Seq(("a", 1.0), ("b", 1.0)).toDF("domain", "loss"), iters = 3, eta = 0.5)
      .as[(String, Double, Double)].collect().map(_._3)
    assert(uni.forall(w => math.abs(w - 0.5) < 1e-6))
  }

  test("ngramNovelty attributes first occurrence to the minimum doc id") {
    val docs = Seq(
      (10L, "a b c d e"), // owns both its 4-grams
      (20L, "a b c d x"), // shares "a b c d" with doc 10 → 1 of 2 novel
      (30L, "a b")        // < k tokens → absent
    ).toDF("doc_id", "text")
    val r = Curation.ngramNovelty(docs, k = 4)
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq === Seq((10L, 2L, 2L, 1.0), (20L, 2L, 1L, 0.5)))
  }
}
