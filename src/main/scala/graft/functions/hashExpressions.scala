package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch kernels for the dedup operators (SURVEY.md M6): MinHash
  * signatures and SimHash computed in ONE tight JVM pass over the token
  * array. The higher-order-function formulation (transform + 64×
  * aggregate) costs an interpreted lambda invocation per token per
  * permutation/bit — these expressions replace ~64·|tokens| lambda calls
  * per document with a primitive loop, the difference between minutes
  * and seconds at corpus scale. CodegenFallback is fine here: the cost
  * is per-document (coarse), not per-primitive-column.
  */
private[graft] object SketchHashing {
  /** Mersenne prime 2^31−1: keeps a·x+b inside 63 bits (overflow-free). */
  val P = 2147483647L

  def tokenHash(s: UTF8String): Long = {
    val h = XxHash64Function.hash(s, StringType, 42L) % P
    if (h < 0) h + P else h
  }

  def coeffs(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(numPerms)(1L + rnd.nextInt((P - 1).toInt).toLong)
    val b = Array.fill(numPerms)(rnd.nextInt(P.toInt).toLong)
    (a, b)
  }
}

/** MinHash signature over array<string> tokens:
  * sig[i] = min_tokens((a_i·h(token) + b_i) mod P).
  */
case class MinHashSig(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (ca, cb) = SketchHashing.coeffs(numPerms, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val x = SketchHashing.tokenHash(arr.getUTF8String(t))
      var i = 0
      while (i < numPerms) {
        val v = (ca(i) * x + cb(i)) % SketchHashing.P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** array<string> → SORTED array<long> of full-width xxhash64 token
  * hashes. Verify-phase representation for the dedup family: set
  * intersection over sorted longs ([[SortedIntersectCount]]) replaces
  * array_intersect over strings — no UTF8 comparisons, no hash-set
  * allocation per pair, and the 64-bit space keeps the collision
  * probability (two distinct tokens hashing equal, which would perturb
  * an intersection count) at ~|vocab|²/2⁶⁵ — immaterial even at 100 TB
  * vocabulary sizes.
  */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var t = 0
    while (t < n) {
      out(t) = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
      t += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED array<long> inputs (e.g. [[TokenHashes]]):
  * one two-pointer merge pass, zero allocation. This is the per-pair hot
  * loop of near-dup verification — at millions of candidate pairs the
  * difference vs array_intersect on strings is ~an order of magnitude.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** First index (0-based) at which two equal-length long arrays hold the
  * same value, or -1. The LSH candidate join filters on
  * `band_first_match(keysA, keysB) = band` — the arrays are the
  * per-band bucket keys, so each colliding pair is emitted from exactly
  * one band, map-side, inside the join stage — which removes the
  * candidate-dedup exchange entirely (a pair at Jaccard ≥ 0.9 otherwise
  * re-appears in E ≈ 5–10 colliding bands and either gets re-verified
  * per band or has to be shuffled for dropDuplicates). Comparing the
  * key arrays (one long per band) instead of the raw signatures keeps
  * the exploded join rows ~4× smaller and makes the emission criterion
  * IDENTICAL to the join criterion — a hash-collision bucket merge
  * emits the (false) pair exactly once and verify rejects it; no pair
  * can be lost. Early exit: the scan never passes the probing band.
  */
case class BandFirstMatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "band_first_match"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return java.lang.Integer.valueOf(i)
      i += 1
    }
    java.lang.Integer.valueOf(-1)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandFirstMatch =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over array<string> tokens: bit k = sign of
  * Σ_tokens (±1 by bit k of h(token)).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val w = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) w(k) += 1 else w(k) -= 1
        k += 1
      }
      t += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (w(k) > 0) out |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Karp–Rabin rolling hashes of every length-`windowLen` CHARACTER
  * window of a string, in one O(n) pass (Karp & Rabin 1987) — the
  * production kernel for exact-substring duplicate marking
  * ([[graft.operators.Dedup.substrDupSpansFast]]). The md5 formulation
  * recomputes a digest over L characters at every position — O(n·L)
  * char work per document; the rolling form updates in O(1) per
  * position (h' = h·B + c_in − c_out·B^L, wrap-around mod 2^64), a ~L×
  * scan-stage saving that matters when L is the paper's 50 tokens.
  * Windows are CHARACTER-indexed to stay position-compatible with the
  * md5/`substring` variant the oracle replays. Equality-only use: the
  * downstream df ≥ 2 marking never orders hashes, and a 64-bit space
  * keeps corpus-level collision odds immaterial.
  */
case class RollingWindowHashes(child: Expression, windowLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(windowLen >= 1, s"windowLen must be >= 1, got $windowLen")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hashes"

  private val B = 1000003L // prime base; arithmetic wraps mod 2^64

  @transient private lazy val bPowL: Long = {
    var p = 1L; var i = 0
    while (i < windowLen) { p *= B; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    // Iterate by CODE POINT, not UTF-16 code unit: the md5/`substring`
    // variant this must match verbatim counts code points (Spark SQL
    // substring/length semantics), and supplementary-plane characters
    // (emoji) occupy two code units but one code point.
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < windowLen) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - windowLen + 1)
    var h = 0L
    var i = 0
    while (i < windowLen) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = windowLen
    while (i < n) {
      h = h * B + cps(i) - bPowL * cps(i - windowLen)
      out(i - windowLen + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}
