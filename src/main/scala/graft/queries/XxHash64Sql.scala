package graft.queries

/** DuckDB-SQL implementation of xxHash64 (seed 42) — the hash behind
  * Spark's `xxhash64` and therefore behind the PRODUCTION MinHash /
  * SimHash dedup queries (`graft.functions.MinHashSig` / `SimHash64`,
  * ref: the reference's dedup operators use engine-native hashing the
  * same way; SURVEY.md M6). Until now those two queries were the only
  * registry rows without a DuckDB oracle ("no_oracle": DuckDB has no
  * xxhash64). This generator closes that gap by emitting the hash
  * itself as SQL, so the oracle replays token hashing → signatures →
  * banding → verification bit-for-bit.
  *
  * Shape: one recursive CTE consumes 32-byte stripes (the only
  * unbounded loop in xxHash64 — tokens shorter than 32 bytes, the
  * overwhelming case, skip it entirely), then a fixed chain of staged
  * CTEs applies the ≤3 8-byte rounds, the ≤1 4-byte round, the ≤3
  * single-byte rounds, and the avalanche. Every intermediate is
  * materialized as a CTE COLUMN, never inlined: DuckDB binds lateral
  * aliases by textual expansion, and a chained-CASE formulation blows
  * its 128-level binder recursion limit.
  *
  * Arithmetic is exact mod-2^64: 64×64-bit multiplies split the
  * constant into 32-bit limbs (INT128 would overflow on two general
  * 64-bit operands); rotations use plain INT128 (x·2^r < 2^95).
  *
  * Validated against `org.apache.spark.sql.functions.xxhash64` on 316
  * adversarial tokens (empty, 1..128 bytes, multi-byte UTF-8, every
  * tail-length class) — bit-identical.
  */
object XxHash64Sql {

  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)
  private val Seed = 42L
  private val M64 = "18446744073709551616"

  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  /** (a · lit) mod 2^64 via 32-bit limbs of the constant. */
  private def smul(a: String, lit: Long): String = {
    val bh = lit >>> 32
    val bl = lit & 0xFFFFFFFFL
    val al = s"((($a) & 4294967295::UBIGINT)::HUGEINT)"
    val ah = s"((($a) >> 32)::HUGEINT)"
    s"((($al * $bl + (($al * $bh + $ah * $bl) % 4294967296) * 4294967296) % $M64)::UBIGINT)"
  }

  private def add(a: String, b: String): String =
    s"(((($a)::HUGEINT + ($b)::HUGEINT) % $M64)::UBIGINT)"

  private def rotl(x: String, r: Int): String =
    s"((((($x)::HUGEINT * ${1L << r}) % $M64)::UBIGINT) | (($x) >> ${64 - r}))"

  private def xor(a: String, b: String): String = s"xor(($a), ($b))"

  private def readN(off: String, bytes: Int): String = {
    val parts = (bytes - 1) to 0 by -1 map { k =>
      s"substr(hx, (2*(($off)+$k)+1)::INTEGER, 2)"
    }
    s"(('0x' || ${parts.mkString(" || ")})::UBIGINT)"
  }

  /** round(acc, k) = rotl(acc + k·P2, 31) · P1 */
  private def lane(acc: String, k: String): String =
    smul(rotl(add(acc, smul(k, P2)), 31), P1)

  /** CTE chain from a distinct-token table `xxt(tok)` to
    * `xxhash(tok, xu UBIGINT, xh BIGINT)` — xh is exactly Spark's
    * `xxhash64(tok)`. Splice into a `WITH RECURSIVE` clause list.
    */
  def cte: String = {
    val keep = "tok, hx, n"
    val v1 = u(Seed + P1 + P2)
    val v2 = u(Seed + P2)
    val v3 = u(Seed)
    val v4 = u(Seed - P1)
    val h0Small = u(Seed + P5)
    val recReads = (0 until 4).map(j => s"${readN(s"i+${8 * j}", 8)} AS r$j").mkString(", ")
    val lanes = (0 until 4).map(j => lane(s"v${j + 1}", s"r$j") + s" AS v${j + 1}").mkString(", ")
    val m0 = add(add(rotl("v1", 1), rotl("v2", 7)), add(rotl("v3", 12), rotl("v4", 18)))
    val ks = (0 until 4).map(j => smul(rotl(smul(s"v${j + 1}", P2), 31), P1) + s" AS k${j + 1}").mkString(", ")
    def mr(h: String, k: String) = add(smul(xor(h, k), P1), u(P4))

    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out += s"xxb AS (SELECT tok, hex(encode(tok)) AS hx, octet_length(encode(tok))::BIGINT AS n FROM xxt)"
    out += s"""xxs AS (
  SELECT $keep, 0::BIGINT AS i,
    $v1::UBIGINT AS v1, $v2::UBIGINT AS v2, $v3::UBIGINT AS v3, $v4::UBIGINT AS v4
  FROM xxb WHERE n >= 32
  UNION ALL
  SELECT $keep, i + 32, $lanes
  FROM (SELECT $keep, i, v1, v2, v3, v4, $recReads FROM xxs WHERE i <= n - 32))"""
    out += s"""xxsf AS (
  SELECT $keep, i AS o0, $m0 AS m0, $ks
  FROM (SELECT *, row_number() OVER (PARTITION BY tok ORDER BY i DESC) AS rn FROM xxs)
  WHERE rn = 1)"""
    var h = "m0"
    for (j <- 1 to 4) {
      val src = if (j == 1) "xxsf" else s"xxm${j - 1}"
      out += s"xxm$j AS (SELECT $keep, o0, k1, k2, k3, k4, ${mr(h, s"k$j")} AS m$j FROM $src)"
      h = s"m$j"
    }
    out += s"""xxh0 AS (
  SELECT $keep, o0, m4 AS h0 FROM xxm4
  UNION ALL
  SELECT $keep, 0::BIGINT AS o0, $h0Small::UBIGINT AS h0 FROM xxb WHERE n < 32)"""
    out += s"xxt0 AS (SELECT $keep, o0 AS o, ${add("h0", "n::UBIGINT")} AS t FROM xxh0)"
    var prev = "xxt0"
    for (j <- 0 until 3) {
      out += s"xxr8$j AS (SELECT $keep, o, t, CASE WHEN o + 8 <= n THEN ${readN("o", 8)} ELSE 0::UBIGINT END AS r FROM $prev)"
      out += s"xxk8$j AS (SELECT $keep, o, t, ${smul(rotl(smul("r", P2), 31), P1)} AS k FROM xxr8$j)"
      out += s"""xxc8$j AS (SELECT $keep,
  CASE WHEN o + 8 <= n THEN ${add(smul(rotl(xor("t", "k"), 27), P1), u(P4))} ELSE t END AS t,
  CASE WHEN o + 8 <= n THEN o + 8 ELSE o END AS o FROM xxk8$j)"""
      prev = s"xxc8$j"
    }
    out += s"xxr4 AS (SELECT $keep, o, t, CASE WHEN o + 4 <= n THEN (((${readN("o", 4)})::HUGEINT * ${u(P1)}) % $M64)::UBIGINT ELSE 0::UBIGINT END AS k FROM $prev)"
    out += s"""xxc4 AS (SELECT $keep,
  CASE WHEN o + 4 <= n THEN ${add(smul(rotl(xor("t", "k"), 23), P2), u(P3))} ELSE t END AS t,
  CASE WHEN o + 4 <= n THEN o + 4 ELSE o END AS o FROM xxr4)"""
    prev = "xxc4"
    for (j <- 0 until 3) {
      out += s"xxr1$j AS (SELECT $keep, o, t, CASE WHEN o < n THEN (((${readN("o", 1)})::HUGEINT * ${u(P5)}) % $M64)::UBIGINT ELSE 0::UBIGINT END AS k FROM $prev)"
      out += s"""xxc1$j AS (SELECT $keep,
  CASE WHEN o < n THEN ${smul(rotl(xor("t", "k"), 11), P1)} ELSE t END AS t,
  CASE WHEN o < n THEN o + 1 ELSE o END AS o FROM xxr1$j)"""
      prev = s"xxc1$j"
    }
    out += s"xxa1 AS (SELECT tok, ${smul(xor("t", "t >> 33"), P2)} AS a FROM $prev)"
    out += s"xxa2 AS (SELECT tok, ${smul(xor("a", "a >> 29"), P3)} AS a FROM xxa1)"
    out += s"""xxhash AS (
  SELECT tok, xor(a, a >> 32) AS xu,
    CASE WHEN xor(a, a >> 32) >= 9223372036854775808::UBIGINT
         THEN ((xor(a, a >> 32))::HUGEINT - $M64)::BIGINT
         ELSE (xor(a, a >> 32))::BIGINT END AS xh
  FROM xxa2)"""
    out.mkString(",\n")
  }
}
