package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hash_code matches Java String.hashCode including negatives and empty") {
    val vals = Seq("", "a", "abc", "hello world", "ügly ünïcode", "中文")
    val got = vals.toDF("s").select(hash_code(col("s"))).as[Int].collect()
    assert(got.toSeq === vals.map(_.hashCode))
  }

  test("similar_to implements ANSI pattern semantics") {
    val cases = Seq(
      ("abc", "a%", true),
      ("abc", "%c", true),
      ("abc", "a_c", true),
      ("abc", "a_", false), // full-string match
      ("a.c", "a.c", true), // literal dot, not regex any
      ("axc", "a.c", false),
      ("click", "(cl|si)%", true),
      ("view", "(cl|si)%", false),
      ("a1", "[a-z][0-9]", true))
    cases.foreach { case (s, p, want) =>
      val got = Seq(s).toDF("s").select(similar_to(col("s"), p)).as[Boolean].head()
      assert(got === want, s"'$s' SIMILAR TO '$p'")
    }
  }

  test("is_digit / is_alpha / is_decimal") {
    val rows = Seq("123", "12a", "abc", "1.5", "-2.5", ".5", "", "+41")
    val df = rows.toDF("s").select(
      col("s"), is_digit(col("s")).as("d"), is_alpha(col("s")).as("a"),
      is_decimal(col("s")).as("x"))
    val m = df.collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(m("123") === ((true, false, true)))
    assert(m("12a") === ((false, false, false)))
    assert(m("abc") === ((false, true, false)))
    assert(m("1.5") === ((false, false, true)))
    assert(m("-2.5") === ((false, false, true)))
    assert(m(".5") === ((false, false, true)))
    assert(m("") === ((false, false, false)))
    assert(m("+41") === ((false, false, true)))
  }

  test("split_index is 0-based and null out of range") {
    val df = Seq("a,b,c").toDF("s").select(
      split_index(col("s"), ",", 0).as("i0"),
      split_index(col("s"), ",", 2).as("i2"),
      split_index(col("s"), ",", 5).as("i5"))
    val r = df.head()
    assert(r.getString(0) === "a")
    assert(r.getString(1) === "c")
    assert(r.isNullAt(2))
  }

  test("band_first_match returns the first agreeing slot, else -1") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def bfm(a: Seq[Long], b: Seq[Long]): Int = {
      val df = Seq((a, b)).toDF("a", "b")
      df.select(ColumnBridge.column(
        BandFirstMatch(ColumnBridge.expression(col("a")),
          ColumnBridge.expression(col("b")))).as("m"))
        .as[Int].collect().head
    }
    val base = Seq(1L, 2L, 3L)
    assert(bfm(base, base) === 0) // every band agrees → first
    assert(bfm(base, Seq(9L, 2L, 3L)) === 1) // band 0 differs
    assert(bfm(base, Seq(9L, 9L, 3L)) === 2) // only last band
    assert(bfm(base, Seq(9L, 9L, 9L)) === -1) // no band agrees
  }

  test("SQL registration resolves hash_code and cosine_sim") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT hash_code('abc') h, cosine_sim(array(1.0F,0.0F), array(1.0F,0.0F)) c")
      .head()
    assert(r.getInt(0) === "abc".hashCode)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("single_value returns the singleton and raises on multi-row groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ok = Seq((1, "a"), (2, "b")).toDF("k", "v")
      .groupBy("k").agg(GraftFunctions.single_value(col("v")).as("v"))
      .orderBy("k").as[(Int, String)].collect()
    assert(ok.toSeq === Seq((1, "a"), (2, "b")))
    val multi = Seq((1, "a"), (1, "b")).toDF("k", "v")
      .groupBy("k").agg(GraftFunctions.single_value(col("v")).as("v"))
    val e = intercept[Exception] { multi.collect() }
    assert(e.getMessage.contains("SINGLE_VALUE"))
  }
}
