package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spark-side golden tests for the §2.9 function tail that DuckDB v1.0
  * cannot oracle (no str_to_map/parse_url/overlay; uuid/rand are
  * nondeterministic): STR_TO_MAP, PARSE_URL, OVERLAY, UUID, ENCODE/
  * DECODE, TO_BASE64/FROM_BASE64, and the collection functions
  * CARDINALITY/ELEMENT/FLATTEN (ref: FlinkSqlOperatorTable string +
  * collection sections).
  */
class FunctionTailSpec extends SparkSpec {
  import spark.implicits._

  test("str_to_map") {
    val m = Seq("a=1,b=2").toDF("s")
      .select(expr("str_to_map(s, ',', '=')")).head().getMap[String, String](0)
    assert(m === Map("a" -> "1", "b" -> "2"))
  }

  test("parse_url") {
    val r = Seq("https://example.com:8080/path/p?x=1&y=2#frag").toDF("u").select(
      expr("parse_url(u, 'HOST')"), expr("parse_url(u, 'PATH')"),
      expr("parse_url(u, 'QUERY', 'y')")).head()
    assert(r.getString(0) === "example.com")
    assert(r.getString(1) === "/path/p")
    assert(r.getString(2) === "2")
  }

  test("overlay replaces at position") {
    val r = Seq(("hello", "XX")).toDF("s", "r")
      .select(overlay(col("s"), col("r"), lit(2))).head().getString(0)
    assert(r === "hXXlo")
  }

  test("uuid shape and uniqueness per row") {
    val ids = spark.range(100).select(expr("uuid()")).as[String].collect()
    assert(ids.distinct.length === 100)
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }

  test("encode/decode and base64 round-trip") {
    val r = Seq("graft").toDF("s").select(
      expr("decode(encode(s, 'UTF-8'), 'UTF-8')"),
      unbase64(base64(col("s").cast("binary"))).cast("string")).head()
    assert(r.getString(0) === "graft")
    assert(r.getString(1) === "graft")
  }

  test("collection functions: cardinality, element_at (1-based), flatten") {
    val r = Seq((Seq(Seq(1, 2), Seq(3)), Map("k" -> 7))).toDF("arr", "m").select(
      size(col("arr")).as("card"),
      element_at(col("arr"), 1).as("el"), // Flink ITEM is 1-based; element_at matches
      flatten(col("arr")).as("flat"),
      element_at(col("m"), "k").as("mv"))
      .head()
    assert(r.getInt(0) === 2)
    assert(r.getSeq[Int](1) === Seq(1, 2))
    assert(r.getSeq[Int](2) === Seq(1, 2, 3))
    assert(r.getInt(3) === 7)
  }
}
