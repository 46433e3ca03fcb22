package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md M6): normalization, fingerprinting, token statistics,
  * quality scoring, language identification. All pure Column expressions
  * (higher-order functions, codegen'd built-ins) — a single narrow
  * projection per document, no UDFs, no shuffles; at 100 TB these run
  * embarrassingly parallel inside the scan stage.
  */
object TextAnalysis {

  /** Lowercase, collapse whitespace runs, trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content-defined document fingerprint: md5 of the normalized text.
    * Identical fingerprint ⇒ exact (normalization-insensitive) duplicate.
    */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Aggressive dedup folding (CCNet/Wenzek 2020 §3 normalization,
    * public literature): lowercase, every digit → 0, punctuation →
    * space, whitespace collapsed. Exact dedup over the FOLDED text
    * merges trivial variants (casing, version numbers, dates, edition
    * punctuation) that byte-exact fingerprints miss — the standard
    * pre-fingerprint step for web-corpus dedup. Pure scan-stage
    * regexes, and every step is shared arithmetic an oracle replays.
    */
  def dedupFold(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(text), "[0-9]", "0"),
        "[^a-z0 ]", " "),
      "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalizeText(text), " ")

  /** Distinct token set (the unit for Jaccard / MinHash). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, and punctuation each
    * count as a token (a cheap proxy for byte-pair tokenizer cost).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "es", "una"),
    "fr" -> Seq("le", "les", "et", "des", "est", "une"))

  /** Count of tokens belonging to `set` (exact word match on normalized
    * tokens). Integer counts — engine-exact, unlike float ratios.
    */
  def stopwordCount(text: Column, set: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(set.map(lit(_)): _*))).cast("long")

  def stopwordCount(text: Column, lang: String): Column =
    stopwordCount(text, stopwords(lang))

  /** N-gram-heuristic language ID (SURVEY.md M6 "language-ID"): CJK
    * codepoint presence short-circuits to zh; otherwise argmax of
    * per-language stopword hits with a fixed preference order
    * (en > de > es > fr) on ties.
    */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, "en"); val de = stopwordCount(text, "de")
    val es = stopwordCount(text, "es"); val fr = stopwordCount(text, "fr")
    when(size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0))) > 0, "zh")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Quality metrics as a flat struct: char/token counts, punctuation
    * count, stopword count, mean token length (exact rational — same
    * integer division on both engines), and a coarse quality bucket.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokenCount(text)
    val punct = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("long")
    val stops = stopwordCount(text, "en")
    Seq(
      "n_tokens" -> toks,
      "n_punct" -> punct,
      "n_stop" -> stops,
      "mean_tok_len" -> (length(regexp_replace(normalizeText(text), " ", "")) / toks),
      "stop_ratio" -> (stops.cast("double") / toks),
      "quality_bucket" ->
        when(toks < 20, "short")
          .when(stops === 0, "no_stopwords")
          .otherwise("ok"))
  }

  /** Markup→text extraction — the crawl-to-corpus first step (the WET /
    * Trafilatura stage of a web pipeline, reduced to its regex core):
    * drop `<script>`/`<style>` ELEMENTS with their content (code and
    * CSS must not leak into training text), strip every remaining tag,
    * decode the five predefined character entities (`&amp;` LAST so
    * `&amp;lt;` cannot double-decode), collapse whitespace. Pure
    * scan-stage regex/replace chain — per-row work, zero shuffle, and
    * every pattern avoids backreferences so RE2-family engines (the
    * DuckDB oracle) replay it exactly.
    */
  def extractHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** k-token shingles of the normalized text (consecutive token windows
    * joined by single spaces); empty array when the doc has fewer than k
    * tokens. Pure higher-order functions — evaluated inside the scan
    * stage, no shuffle.
    *
    * Built as a chain of k−1 `zip_with`s against shifted slices of the
    * token array: each HOF evaluates its ARGUMENT arrays once per row,
    * so the whole shingle set costs O(k·n) per document. The obvious
    * `transform(sequence(...), i => slice(toks, i, k))` form instead
    * re-evaluates the `toks` expression (normalize + split over the
    * full text) for EVERY element of the sequence — O(n²) per document,
    * invisible on ~100-token fixtures and ruinous at 10⁴⁺ tokens (see
    * LongDocSpec). Never reference a non-attribute array expression
    * inside a lambda body.
    */
  def shingles(text: Column, k: Int): Column = shinglesOf(tokens(text), k)

  /** [[shingles]] over an already-computed token-array column. Pass an
    * ATTRIBUTE (a projected column), not a nested expression, when
    * composing further HOF stages on top: every `toks` reference below
    * is re-evaluated per row, which is O(1) for an attribute but
    * re-runs the whole upstream tree for a composite expression — the
    * stacked-HOF multiplication that made the first winnowPairs draft
    * 20× slower than its staged form (see [[Dedup.winnowPairs]]).
    */
  def shinglesOf(toks: Column, k: Int): Column =
    // native one-pass kernel (r13 opt) — value-identical to the former
    // k−1 × zip_with(concat) chain, which paid an interpreted lambda per
    // element per level and materialized k−1 progressively longer
    // intermediate string arrays per document
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.ShingleJoin(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks), k))

  /** 1-based token start offsets for overlapping chunks of `chunkSize`
    * tokens advancing by `stride` (< chunkSize ⇒ overlap). Chunks cover
    * every token; the last chunk may be shorter (HF-tokenizer
    * `return_overflowing_tokens` convention). A doc with ≤ chunkSize
    * tokens yields the single start [1].
    */
  def chunkStarts(text: Column, chunkSize: Int, stride: Int): Column = {
    val n = size(tokens(text))
    // upper bound n-chunkSize+stride: the smallest stride-multiple start
    // >= n-chunkSize+1 is generated (tail covered), the next one is not
    sequence(lit(1), greatest(n - chunkSize + stride, lit(1)), lit(stride))
  }

  /** Winnowing-style rolling fingerprint (ref: SURVEY.md M6 "document
    * fingerprinting (rolling hash)"): hash every k-token shingle, then
    * keep the minimum hash of each sliding window of `w` shingles.
    * The default `hash` is xxhash64 (production: one codegen'd
    * primitive pass, engine-specific → ScalaTest-covered); pass a
    * portable md5-derived hash (see [[Dedup.winnowPairs]]) to get a
    * construction DuckDB replays bit-for-bit.
    *
    * CONVENIENCE form for single-expression use (specs, ad-hoc
    * columns): the mins chain below references the grams expression w
    * times and grams references the text ~2k times, so the whole
    * normalize→shingle→hash tree is re-evaluated O(k·w) times per row.
    * Harmless for one fingerprint column; a PIPELINE must stage each
    * level as a projected attribute instead — [[Dedup.winnowPairs]] is
    * the staged form (measured 20.9 → ~1 s at sf0.1 from exactly this
    * restructure).
    */
  def winnowFingerprint(text: Column, k: Int = 3, w: Int = 4,
      hash: Column => Column = xxhash64(_)): Column = {
    val toks = tokens(text)
    val n = size(toks)
    // per-shingle hashes without referencing `toks` inside a lambda —
    // same O(k·n) zip-chain rationale as [[shingles]]; a doc shorter
    // than k yields the single hash of its whole token list
    val grams = when(n >= k, transform(shingles(text, k), g => hash(g)))
      .otherwise(array(hash(concat_ws(" ", toks))))
    val m = size(grams)
    // sliding-window minima as a least-chain of shifted slices (same
    // once-per-row evaluation argument); trailing zip_with null padding
    // is harmless because least() ignores nulls and the slice drops it
    val mins = (1 until w).foldLeft(grams) { (acc, j) =>
      zip_with(acc, slice(grams, lit(j + 1), greatest(m - j, lit(0))),
        (a, b) => least(a, b))
    }
    array_distinct(
      when(m >= w, slice(mins, lit(1), m - (w - 1)))
        .otherwise(array(array_min(grams))))
  }
}
