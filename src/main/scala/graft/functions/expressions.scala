package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the reference's function-parity gap
  * list (SURVEY.md §2.9) and the vector kernels behind similarity search
  * (SURVEY.md M6). All implement `doGenCode` so they stay inside
  * whole-stage codegen — no UDF/serialization boundary in the hot path.
  */

/** HASH_CODE(str): Java String.hashCode semantics (ref:
  * flink-table-runtime-blink SqlFunctionUtils.hashCode / HASH_CODE in
  * FlinkSqlOperatorTable.java). Operates on the UTF-16 view, matching
  * `String.hashCode` exactly.
  */
case class JavaHashCode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hash_code"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaHashCode =
    copy(child = newChild)
}

/** COSINE_SIM(a, b) over array<float>: double-accumulated cosine
  * similarity, the kernel for brute-force and LSH-bucketed ANN (SURVEY.md
  * M6 similarity search). A tight primitive loop over the two ArrayData —
  * no per-element boxing, no zip_with intermediate arrays — and
  * codegen'd, so a 100 TB scan stays in one WholeStageCodegen span.
  * Accumulation is left-to-right in double (float values widened
  * exactly), matching DuckDB's `list_cosine_similarity(a::DOUBLE[], ...)`
  * for oracle comparison.
  */
/** DOT_DOUBLE(a, b) — the ORACLE-EXACT sequential dot product: the fused
  * native form of `aggregate(zip_with(a, b, (x, y) => x*y), 0.0,
  * (acc, x) => acc + x)` (see [[GraftFunctions.dot_double]]), which is
  * the exact fold DuckDB's `list_dot_product` performs. Value-identical
  * IEEE chain: each product rounded to double, then added left-to-right
  * (no FMA, no reassociation) — but one primitive loop per pair instead
  * of an interpreted lambda per element per row (zip_with + aggregate
  * are CodegenFallback higher-order functions, ~4·dim interpreted
  * expression evals and two intermediate arrays per pair). This is the
  * inner loop of every ANN scoring leg, so the HOF overhead multiplies
  * by O(candidates·dim).
  *
  * Edge semantics mirror the HOF chain exactly: unequal lengths → the
  * zip_with pad makes a null product and `acc + null` poisons the fold →
  * NULL; a null element → NULL; two empty arrays → the init 0.0. When
  * both element types are FLOAT the zip_with lambda multiplies IN FLOAT
  * (then widens on accumulate) — reproduced here; mixed float/double
  * multiplies in double after widening, as Spark's arithmetic coercion
  * does.
  */
case class DotDoubleExact(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"
  // can yield NULL even for non-null inputs (length mismatch / null
  // element — the zip_with-pad semantics), so nullability must not be
  // derived from the children
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_double needs array<double>/array<float> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null // zip_with pad → null product → poisoned fold
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (lFloat && rFloat) acc += x.getFloat(i) * y.getFloat(i) // float multiply, then widen
      else {
        val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
      }
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, idx: String, float: Boolean): String =
        if (float) s"$arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      val prod =
        if (lFloat && rFloat) s"(double) (${get(a, i, true)} * ${get(b, i, true)})"
        else s"((double) ${get(a, i, lFloat)}) * ((double) ${get(b, i, rFloat)})"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $prod;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDoubleExact =
    copy(left = newLeft, right = newRight)
}

case class CosineSimFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimFloat =
    copy(left = l, right = r)
}

/** All banded sign-LSH bucket ids of an embedding in ONE pass:
  * bucket[b] bit j = sign(v · plane_{b,j}) > 0, planes drawn from the
  * seeded RNG (seed + 7919·b per band — Charikar 2002 sign-LSH, same
  * construction as graft.operators.Similarity.planes). Replaces
  * bands × rowsPerBand separate dot_f(embedding, typedlit(plane))
  * expressions whose generated code — 128 unrolled 64-float literal
  * traversals at the near-dup defaults — took multiple seconds of
  * first-run janino/JIT compilation and re-read the embedding 128
  * times per row. Double accumulation in the same sequential order as
  * DotProductFloat ⇒ bit-identical buckets to the per-plane
  * formulation. CodegenFallback is fine: cost is per-embedding.
  */
case class SignLshBuckets(child: Expression, bands: Int, rowsPerBand: Int, dim: Int, seed: Long)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  // [bands*rowsPerBand][dim], band-major — one JVM-wide build per plan
  @transient private lazy val planes: Array[Array[Float]] =
    (0 until bands).toArray.flatMap(b => SignLshBuckets.planes(rowsPerBand, dim, seed + 7919L * b))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = planes(b * rowsPerBand + j)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getFloat(d).toDouble * p(d).toDouble; d += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {
  /** Deterministic Gaussian hyperplanes; draw order (plane-major, then
    * dimension) must stay fixed — bucket ids are part of query results.
    */
  def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }
}

/** DOT_F(a, b) over array<float>: double-accumulated dot product (IVF /
  * pre-normalized embedding path — cosine on unit vectors is a dot).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductFloat =
    copy(left = l, right = r)
}

/** Static kernels behind [[NfcNormalize]] / [[StripAccents]] — object
  * methods compile to static forwarders, so generated code calls them
  * directly (`graft.functions.TextNorm.nfc(...)`).
  */
object TextNorm {
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Canonical decomposition, then drop combining marks — the
    * unaccent convention DuckDB's `strip_accents` (utf8proc) applies,
    * verified equal over the Latin-1 diacritic range the corpus
    * injection uses.
    */
  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(marks.matcher(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD))
      .replaceAll(""))
}

/** Static kernels behind the string-distance expressions. Conventions
  * pinned to DuckDB's core implementations (probed, and spec-pinned to
  * the published literature values) so oracles replay bit-for-bit:
  * Jaro of an empty string is 0 (even for two empties), the Winkler
  * prefix boost (p = 0.1, prefix ≤ 4) applies only when J > 0.7, and
  * damerau_levenshtein is the TRUE Damerau–Levenshtein
  * (Lowrance–Wagner 1975, unrestricted transpositions — OSA would give
  * 3 for ca→abc, this gives 2).
  */
object StrDist {
  def jaro(s: String, t: String): Double = {
    if (s.isEmpty || t.isEmpty) return 0.0
    if (s == t) return 1.0
    val sl = s.length; val tl = t.length
    val window = math.max(math.max(sl, tl) / 2 - 1, 0)
    val sM = new Array[Boolean](sl); val tM = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window); val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s.charAt(i) == t.charAt(j)) { sM(i) = true; tM(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var trans = 0
    i = 0
    while (i < sl) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val half = trans / 2
    (m.toDouble / sl + m.toDouble / tl + (m - half).toDouble / m) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString; val t = b.toString
    val j = jaro(s, t)
    if (j <= 0.7) j
    else {
      var l = 0
      val n = math.min(4, math.min(s.length, t.length))
      while (l < n && s.charAt(l) == t.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  /** True Damerau–Levenshtein (unrestricted transpositions). */
  def damerau(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString; val t = b.toString
    val m = s.length; val n = t.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = scala.collection.mutable.Map.empty[Char, Int]
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k = da.getOrElse(t.charAt(j - 1), 0)
        val l = db
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1, d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
        j += 1
      }
      da(s.charAt(i - 1)) = i
      i += 1
    }
    d(m + 1)(n + 1)
  }

  /** Hamming distance over equal-length strings. Callers must guard
    * lengths — [[HammingStr]] returns NULL on unequal lengths (DuckDB's
    * `hamming` ERRORS there; null is the closest expression-safe
    * behavior, and a silent fabricated distance would hide the domain
    * violation from the oracle).
    */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString; val t = b.toString
    var c = 0; var i = 0
    val n = math.min(s.length, t.length)
    while (i < n) { if (s.charAt(i) != t.charAt(i)) c += 1; i += 1 }
    c
  }
}

/** JARO_WINKLER(a, b): the record-linkage similarity (Jaro 1989,
  * Winkler 1990) — the fuzzy-matching staple next to levenshtein in
  * every entity-resolution pipeline.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StrDist.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrDist.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

/** DAMERAU_LEVENSHTEIN(a, b): true Damerau–Levenshtein distance —
  * levenshtein plus unrestricted transpositions, the edit model under
  * most real-world typos.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StrDist.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrDist.damerau($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

/** HAMMING_STR(a, b): positional mismatch count; NULL when lengths
  * differ (the function's mathematical domain — DuckDB's `hamming`
  * errors there, so a silent value would diverge from any oracle).
  */
case class HammingStr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_str"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val x = a.asInstanceOf[UTF8String]; val y = b.asInstanceOf[UTF8String]
      if (x.numChars() != y.numChars()) null else StrDist.hamming(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |if ($a.numChars() != $b.numChars()) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.functions.StrDist.hamming($a, $b);
       |}
     """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingStr =
    copy(left = l, right = r)
}

/** NFC_NORMALIZE(str): Unicode canonical composition — the first step
  * of any web-scale text-cleaning pipeline (mojibake-adjacent decomposed
  * sequences fold to their precomposed forms so downstream exact-match
  * dedup keys agree). Both engines implement the Unicode standard
  * (java.text.Normalizer here, utf8proc in DuckDB), so outputs are
  * bit-identical by spec.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** STRIP_ACCENTS(str): NFD + combining-mark removal (the unaccent
  * fold), for accent-insensitive dedup keys and retrieval terms.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
