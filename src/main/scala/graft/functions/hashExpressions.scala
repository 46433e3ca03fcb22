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

/** The md5-token-hash the PORTABLE (cross-engine-oracled) dedup family
  * shares: value = first 15 hex chars of md5(token) as a 60-bit integer,
  * i.e. `conv(substring(md5(t), 1, 15), 16, 10)::long`. One digest over
  * the token's UTF-8 bytes, no hex-string materialization, no base-16
  * string parse — the first 8 digest bytes read as an unsigned big-endian
  * long carry the first 16 hex chars, so `>>> 4` drops the 16th.
  */
private[graft] object PortableMd5 {
  def hash60(s: UTF8String): Long = prefix(s, 15)

  /** First `nHex` hex chars of md5(s) as an unsigned long — the native
    * value of `conv(substring(md5(s), 1, nHex), 16, 10)::long` for any
    * nHex ≤ 16: the first 8 digest bytes read big-endian carry the
    * first 16 hex chars; shifting right by 4·(16−nHex) keeps exactly
    * the leading nHex nibbles. Public (not private[graft]) at the JVM
    * level so whole-stage-codegen'd callers can invoke it statically.
    */
  def prefix(s: UTF8String, nHex: Int): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    val v = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v >>> (4 * (16 - nHex))
  }
}

/** The scalar `conv(substring(md5(x), 1, nHex), 16, 10)::long` idiom —
  * the portable hash every sketch (HLL/CMS/Bloom/KMV/theta), sampler,
  * hash-splitter and feature-hasher shares — as ONE digest with real
  * codegen: no 32-char hex string materialization, no substring copy,
  * no NumberConverter base-16 parse, and the expression stays inside
  * the surrounding WholeStageCodegen span (the built-in chain already
  * codegens, so a CodegenFallback kernel here would TRADE wins; this
  * one only removes work). Value-identical for nHex ≤ 15 (the value is
  * < 2^60, inside long range exactly like the conv chain's cast).
  */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression {
  // No input-type require: bridge-built children can report placeholder
  // types pre-binding (a ColumnNode wrapper reads as resolved/NullType
  // before analysis), and a genuinely wrong child type fails loudly as a
  // ClassCastException at first evaluation — same posture as the other
  // kernels in this file.
  require(nHex >= 1 && nHex <= 15, s"nHex must be in [1, 15], got $nHex")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(PortableMd5.prefix(input.asInstanceOf[UTF8String], nHex))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableMd5.prefix($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

/** PORTABLE MinHash signature — the fused native form of the oracled
  * construction `array_min(transform(hs, x => pmod(x*a_i + b_i, P)))`
  * over `hs = transform(tokens, t => pmod(md5_60(t), P))`, one slot per
  * permutation. Value-identical to the higher-order-function chain the
  * DuckDB oracles replay (md5 60-bit token hash mod P, then per-perm
  * universal-hash minima), but ONE digest + one primitive loop per token
  * instead of an interpreted lambda per token per permutation — the
  * md5/array_min chain evaluates ~numPerms·|tokens| interpreted
  * expression nodes per document and allocates numPerms intermediate
  * arrays; this is the portable twin of [[MinHashSig]].
  *
  * Null/empty contract mirrors the SQL form EXACTLY: `array_min` over an
  * empty or null hs yields NULL per slot, and the downstream
  * `array(s0..s63)` wraps those into a non-null array of nulls — so this
  * expression never returns null; a null or empty token array returns an
  * array of `perms.length` null slots.
  */
case class PortableMinHashSig(child: Expression, perms: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "portable_minhash_sig"

  @transient private lazy val ca: Array[Long] = perms.map(_._1).toArray
  @transient private lazy val cb: Array[Long] = perms.map(_._2).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val numPerms = perms.length
    if (v == null) return new GenericArrayData(Array.fill[Any](numPerms)(null))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numPerms)(null))
    val sig = Array.fill(numPerms)(Long.MaxValue)
    // null token elements are SKIPPED, matching the SQL chain exactly:
    // transform keeps them null and array_min ignores nulls; all-null
    // tokens leave every slot null (array_min over only-nulls = NULL)
    var nonNull = 0
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        nonNull += 1
        val x = PortableMd5.hash60(arr.getUTF8String(t)) % p
        var i = 0
        while (i < numPerms) {
          val s = (ca(i) * x + cb(i)) % p
          if (s < sig(i)) sig(i) = s
          i += 1
        }
      }
      t += 1
    }
    if (nonNull == 0) return new GenericArrayData(Array.fill[Any](numPerms)(null))
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
}

/** PORTABLE 60-bit SimHash — the fused native form of the oracled
  * construction: per bit j ∈ [0, 60), vote = Σ_tokens (2·bit_j(md5_60(t)) − 1),
  * fingerprint bit j set iff vote > 0. Value-identical to the
  * `aggregate(hs, …)` × 60 chain ([[graft.operators.Dedup.simHashPairsPortable]])
  * but one digest + one primitive loop per token instead of 60
  * interpreted folds per document. Null/empty token arrays yield
  * fingerprint 0L, matching the SQL form (aggregate over empty = init 0,
  * vote 0 → bit clear; null hs → vote null → `when(null > 0)` falls to
  * otherwise(0)).
  */
case class PortableSimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "portable_simhash60"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return java.lang.Long.valueOf(0L)
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val w = new Array[Int](60)
    var t = 0
    while (t < n) {
      // a null element poisons the SQL aggregate's fold to null for
      // EVERY bit (acc + null = null from that point on), and
      // when(null > 0) falls through to the bit-clear branch — so one
      // null token means fingerprint 0L, exactly as the HOF chain does
      if (arr.isNullAt(t)) return java.lang.Long.valueOf(0L)
      val h = PortableMd5.hash60(arr.getUTF8String(t))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (w(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash60 =
    copy(child = newChild)
}

/** k-token shingles of a token array as space-joined strings — the
  * fused native form of [[graft.operators.TextAnalysis.shinglesOf]]'s
  * k−1 `zip_with(concat)` passes (each an interpreted lambda per element
  * building progressively longer intermediate strings). Value-identical:
  * out(i) = tokens(i) ⧺ " " ⧺ … ⧺ tokens(i+k−1) for i ≤ n−k, empty
  * array when the input is null or shorter than k (matching
  * `when(size(toks) >= k, …).otherwise(array())` with size(null)=null
  * falling through to the empty branch). A null token element yields a
  * null shingle wherever it participates (concat's null propagation).
  */
case class ShingleJoin(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_join"

  @transient private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var nullSeen = false
      val win = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        if (arr.isNullAt(i + j)) nullSeen = true
        else win(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = if (nullSeen) null else UTF8String.concatWs(sep, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleJoin =
    copy(child = newChild)
}

/** array<string> → array<long> of the portable 60-bit md5 hash of each
  * element ([[PortableMd5.hash60]] — `conv(substring(md5(x),1,15),16,10)`),
  * one digest per element with no hex/string round-trip; null elements
  * stay null. The per-element native form of the `transform(...,
  * conv(substring(md5(g),1,15),16,10))` idiom the portable sketch and
  * winnowing layers share.
  */
case class Md5Hash60Array(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_hash60_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else java.lang.Long.valueOf(PortableMd5.hash60(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Array =
    copy(child = newChild)
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
