package graft.functions

import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Public Column API for the reference's scalar-function gap list
  * (SURVEY.md §2.9: HASH_CODE, IS_DIGIT, IS_ALPHA, IS_DECIMAL,
  * SIMILAR TO, SPLIT_INDEX — FlinkSqlOperatorTable.java /
  * SqlFunctionUtils.java) plus the M6 vector kernels. Where Spark
  * built-ins compose cleanly (regex predicates), we compose them —
  * RLike is codegen'd; custom Catalyst expressions are reserved for what
  * built-ins can't express efficiently.
  */
object GraftFunctions {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Java String.hashCode (ref: HASH_CODE). */
  def hash_code(c: Column): Column = col(JavaHashCode(expr(c)))

  /** Cosine similarity over array<float> embeddings (M6). */
  def cosine_sim(a: Column, b: Column): Column = col(CosineSimFloat(expr(a), expr(b)))

  /** Dot product over array<float> embeddings (M6). */
  def dot_f(a: Column, b: Column): Column = col(DotProductFloat(expr(a), expr(b)))

  /** Unicode NFC canonical composition (text-cleaning step 0). */
  def nfc_normalize(c: Column): Column = col(NfcNormalize(expr(c)))

  /** Accent strip: NFD + combining-mark removal. */
  def strip_accents(c: Column): Column = col(StripAccents(expr(c)))

  /** Jaro–Winkler similarity (record linkage). */
  def jaro_winkler(a: Column, b: Column): Column = col(JaroWinkler(expr(a), expr(b)))

  /** True Damerau–Levenshtein distance. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    col(DamerauLevenshtein(expr(a), expr(b)))

  /** Hamming distance over equal-length strings. */
  def hamming_str(a: Column, b: Column): Column = col(HammingStr(expr(a), expr(b)))

  /** Sequential left-to-right dot product over array<double> columns —
    * the exact fold DuckDB's list_dot_product performs, so oracle
    * comparisons are bit-identical (each product rounded to double,
    * then added in order; no FMA contraction). Native codegen'd kernel
    * ([[DotDoubleExact]]); value-identical to the previous
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation, which paid
    * ~4·dim interpreted lambda evals per pair.
    */
  def dot_double(a: Column, b: Column): Column = col(DotDoubleExact(expr(a), expr(b)))

  /** Cosine over array<double> columns via [[dot_double]] with the
    * explicit dot / sqrt(‖a‖²·‖b‖²) formula (mirrored term-for-term by
    * oracles).
    */
  def cosine_double(a: Column, b: Column): Column =
    dot_double(a, b) / sqrt(dot_double(a, a) * dot_double(b, b))

  /** `conv(substring(md5(x), 1, nHex), 16, 10)::long` as one codegen'd
    * digest ([[Md5PrefixLong]]) — the portable hash idiom of the sketch /
    * sampling / hash-split layers, value-identical for nHex ≤ 15.
    */
  def md5_prefix(c: Column, nHex: Int): Column = col(Md5PrefixLong(expr(c), nHex))

  /** IS_DIGIT(str) (ref: SqlFunctionUtils.isDigit): all chars in [0-9],
    * non-empty.
    */
  def is_digit(c: Column): Column = c.rlike("^[0-9]+$")

  /** IS_ALPHA(str) (ref: SqlFunctionUtils.isAlpha). */
  def is_alpha(c: Column): Column = c.rlike("^[a-zA-Z]+$")

  /** IS_DECIMAL(str) (ref: SqlFunctionUtils.isDecimal): parseable as a
    * decimal number.
    */
  def is_decimal(c: Column): Column = c.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$")

  /** ANSI SQL `SIMILAR TO` (ref: FlinkSqlOperatorTable SIMILAR TO):
    * full-string match where `%` = any sequence, `_` = any char; the
    * remaining regex-like syntax (|, *, +, [..], (..)) passes through.
    */
  def similar_to(c: Column, pattern: String): Column =
    c.rlike("^(?:" + similarToRegex(pattern) + ")$")

  private[graft] def similarToRegex(pattern: String): String = {
    val sb = new StringBuilder
    var inClass = false
    pattern.foreach {
      case '%' if !inClass => sb.append(".*")
      case '_' if !inClass => sb.append('.')
      case '[' => inClass = true; sb.append('[')
      case ']' => inClass = false; sb.append(']')
      case '.' if !inClass => sb.append("\\.")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** SPLIT_INDEX(str, sep, index) (ref: SqlFunctionUtils.splitIndex) —
    * 0-based; null when out of range (element_at is 1-based).
    */
  def split_index(c: Column, sep: String, index: Int): Column =
    // try_element_at: out-of-range yields NULL (Flink semantics) instead
    // of the ANSI-mode error element_at raises in Spark 4.
    try_element_at(split(c, java.util.regex.Pattern.quote(sep)), lit(index + 1))

  /** SINGLE_VALUE aggregate (ref: FlinkSqlOperatorTable SINGLE_VALUE —
    * the scalar-subquery enforcement agg): the group's one value, or a
    * runtime error if the group has more than one row. Composed from
    * codegen'd built-ins (count guard + first), so it plans as a normal
    * two-phase aggregate.
    */
  def single_value(c: Column): Column =
    when(count(lit(1)) > 1,
      raise_error(lit("SINGLE_VALUE: group contains more than one row")))
      .otherwise(first(c))

  /** SQL-side registration so `spark.sql("SELECT hash_code(x) ...")`
    * resolves; idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("hash_code", es => JavaHashCode(es.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimFloat(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_f", es => DotProductFloat(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("strip_accents", es => StripAccents(es.head), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler", es => JaroWinkler(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("damerau_levenshtein",
      es => DamerauLevenshtein(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming_str", es => HammingStr(es.head, es(1)), "built-in")
  }
}
