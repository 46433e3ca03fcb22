package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the expectations gate: null predicates count as
  * violations (SQL CHECK semantics), uniqueness counts excess rows,
  * empty input reports cleanly, and the report unions both rule
  * classes.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10),
    (2L, Some("b"), -5),
    (2L, None, 3),
    (3L, Some("c"), 7)
  ).toDF("id", "name", "v")

  test("audit: null predicate is a violation; counts are per rule") {
    val r = Expectations.audit(df, Seq(
      ("v_positive", col("v") > 0),
      ("name_set", col("name").isin("a", "b", "c"))))
      .orderBy("rule")
      .as[(String, Long, Long, Double, Boolean)].collect()
    // name_set: the None row's predicate is null → violation
    assert(r.toSeq == Seq(
      ("name_set", 4L, 1L, 0.25, false),
      ("v_positive", 4L, 1L, 0.25, false)))
  }

  test("uniqueness counts excess rows of duplicated keys") {
    val r = Expectations.uniqueness(df, "id_unique", Seq("id"))
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(r == (("id_unique", 4L, 1L, 0.25, false)))
  }

  test("report unions row and key rules; empty input passes everything") {
    val rep = Expectations.report(df,
      Seq(("v_positive", col("v") > 0)), Seq(("id_unique", Seq("id"))))
      .as[(String, Long, Long, Double, Boolean)].collect()
    assert(rep.map(_._1).toSeq == Seq("id_unique", "v_positive"))
    val empty = Expectations.report(df.limit(0),
      Seq(("v_positive", col("v") > 0)), Seq(("id_unique", Seq("id"))))
      .as[(String, Long, Long, Double, Boolean)].collect()
    assert(empty.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0.0 && r._5))
  }
}
