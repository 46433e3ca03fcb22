package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Deduplication operators for training-data pipelines (SURVEY.md M6):
  * exact (hash-groupBy), n-gram Jaccard via inverted index, MinHash+LSH
  * banding, and SimHash with pigeonhole banding.
  *
  * Scale design: every method is one or two hash-partitioned shuffles on
  * bounded keys (fingerprint, token, band signature) — never an all-pairs
  * cross join. Candidate generation is always bucketed (inverted index /
  * LSH band / simhash chunk) so the quadratic blowup is confined to
  * within-bucket pairs, which banding keeps small on real corpora.
  */
object Dedup {

  /** Exact dedup on the normalized-text fingerprint: one hash-agg
    * shuffle; keeper = min doc_id per group.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("cnt"))

  /** All-pairs n-gram (word-level) Jaccard ≥ threshold via an inverted
    * index: explode distinct tokens, self-join on token (bucketed
    * shuffle, not a cross join), count co-occurrences, then
    * |A∩B| / (|A|+|B|−|A∩B|). `leftFilter` restricts the probe side —
    * at 100 TB you never run unrestricted all-pairs; you shard the probe
    * side or use [[minHashPairs]] first.
    *
    * `maxDf` is the hot-key lever: a near-universal token ("the") puts
    * every document in one bucket and the within-bucket self-join goes
    * quadratic on that key. Capping document frequency drops those
    * tokens from the index AND from the per-doc set sizes, so the
    * Jaccard stays self-consistent over the reduced vocabulary — the
    * standard df-cut, cf. search-engine stopword elimination.
    */
  def jaccardPairs(
      docs: DataFrame,
      threshold: Double,
      leftFilter: Column = lit(true),
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDf: Option[Long] = None
  ): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), TextAnalysis.tokenSet(col(textCol)).as("ts"))
    val words0 = toks.select(col("id"), explode(col("ts")).as("word"))
    val (words, sizes) = maxDf match {
      case Some(cap) =>
        // the hot-token list is tiny by construction → broadcast anti-join
        val hot = words0.groupBy("word").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("word")
        val kept = words0.join(broadcast(hot), Seq("word"), "left_anti")
        (kept, kept.groupBy("id").agg(count(lit(1)).as("sz")))
      case None =>
        (words0, toks.select(col("id"), size(col("ts")).as("sz")))
    }
    val inter = words.filter(leftFilter).withColumnRenamed("id", "da")
      .join(words.withColumnRenamed("id", "db"), "word")
      .filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "da").withColumnRenamed("sz", "sa"), "da")
      .join(sizes.withColumnRenamed("id", "db").withColumnRenamed("sz", "sb"), "db")
      .withColumn("jacc", col("i") / (col("sa") + col("sb") - col("i")))
      .filter(col("jacc") >= threshold)
      .select(col("da"), col("db"), col("jacc"))
  }

  /** MinHash signature: numPerms universal-hash permutations
    * h_i(x) = (a_i·x + b_i) mod p over xxhash64 token hashes, min per
    * permutation. Native expression (graft.functions.MinHashSig) — one
    * primitive loop per document inside the scan stage, no shuffle.
    */
  def minHashSignature(textCol: Column, numPerms: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(TextAnalysis.tokenSet(textCol)), numPerms, seed))

  /** MinHash+LSH near-dup candidate pairs, verified with true Jaccard.
    * bands·rows = numPerms; a pair collides if any band of `rows`
    * signature slots matches exactly (P[collide] = 1−(1−j^r)^b). Shuffles:
    * one on (band, signature-slice) for candidates, one token-explode
    * join to verify — both bucketed.
    */
  def minHashPairs(
      docs: DataFrame,
      bands: Int = 8,
      rows: Int = 8,
      verifyThreshold: Double = 0.85,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    // Phase 1 — candidates: explode band signatures and self-join on
    // (band, key) carrying ONLY doc ids. On self-similar corpora the
    // band join fans out heavily; keeping the joined rows to two longs
    // (instead of dragging token arrays through the shuffle) is the
    // difference between MBs and GBs of exchange at scale.
    val sigs = docs.select(
      col(idCol).as("id"),
      minHashSignature(col(textCol), bands * rows).as("sig"))
    val banded = sigs.select(
      col("id"),
      explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"), concat_ws(",", slice(col("sig"), j * rows + 1, rows)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val cands = banded.as("x")
      .join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"))
      .dropDuplicates("da", "db")
    // Phase 2 — verify: attach the two token sets to each surviving
    // pair (docs side is join-key partitioned; Catalyst broadcasts it
    // when small) and compute exact Jaccard.
    val toks = docs.select(col(idCol).as("id"), TextAnalysis.tokenSet(col(textCol)).as("ts"))
    cands
      .join(toks.select(col("id").as("da"), col("ts").as("ta")), "da")
      .join(toks.select(col("id").as("db"), col("ts").as("tb")), "db")
      // size-ratio prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so
      // pairs failing the ratio can never clear the threshold — prunes
      // before the O(|A|+|B|) intersect.
      .filter(
        least(size(col("ta")), size(col("tb"))).cast("double") /
          greatest(size(col("ta")), size(col("tb"))) >= verifyThreshold)
      .withColumn("jacc",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .filter(col("jacc") >= verifyThreshold)
      .select("da", "db", "jacc")
  }

  /** SimHash near-dup groups via pigeonhole banding: split the 64-bit
    * simhash into 4 × 16-bit chunks; hamming ≤ 3 ⇒ at least one chunk
    * identical, so grouping by (chunk-index, chunk-value) finds all such
    * pairs with one bucketed shuffle. Verification = bit_count(XOR).
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simHash64(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"),
      explode(array((0 until 4).map { j =>
        struct(lit(j).as("ci"), shiftright(col("sh"), j * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))
      }: _*)).as("c"))
      .select(col("id"), col("sh"), col("c.ci"), col("c.cv"))
    chunked.as("x").join(chunked.as("y"), Seq("ci", "cv"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
      // filter BEFORE the dedup shuffle: hamming is computed map-side,
      // so far pairs never enter the exchange
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("da", "db")
  }

  /** 64-bit SimHash (see [[simHashPairs]]): per bit position k, sum ±1
    * over token hashes and take the sign. Native expression
    * (graft.functions.SimHash64) — one primitive loop per document.
    */
  def simHash64(textCol: Column): Column =
    ColumnBridge.column(graft.functions.SimHash64(
      ColumnBridge.expression(TextAnalysis.tokenSet(textCol))))
}
