package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the declarative constraint gate every
  * production ingest runs before data is allowed downstream (the
  * Deequ / dbt-tests / Delta-constraints surface, built from plain
  * aggregates; the reference's closest analog is the table-API
  * NOT NULL / primary-key metadata it validates at insert,
  * flink-table-common `TableColumn`/constraint validation).
  *
  * Two constraint classes, deliberately separate because their scale
  * shapes differ:
  *
  *  - ROW rules (`audit`): each rule is a boolean Column over one row
  *    (null checks, ranges, regex shape, set membership). ALL rules
  *    evaluate in ONE corpus scan — each compiles to a
  *    `sum(violates)` beside the others in a single aggregate, so 20
  *    rules cost the same scan as one. No shuffle beyond the 1-row
  *    final aggregate.
  *  - KEY rules (`uniqueness`): "column set is a key" needs a
  *    group-by — one hash shuffle on the candidate key, map-side
  *    partial counts, and only duplicate groups (not the corpus)
  *    reach the final count.
  *
  * Output of both: one row per rule — (rule, n_rows, n_violations,
  * violation_frac, pass) — union-compatible, so a pipeline's whole
  * contract lands in one tiny report table regardless of corpus size.
  */
object Expectations {

  private val outCols = Seq("rule", "n_rows", "n_violations", "violation_frac", "pass")

  /** Row-level rules: (name, predicate) pairs where the predicate is
    * TRUE for conforming rows; nulls count as violations (a null
    * range-check is a failed check, matching SQL CHECK semantics
    * under `NOT coalesce(p, false)`).
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = count(lit(1)).cast("long").as("__n") +:
      rules.map { case (n, p) =>
        // coalesce: sum() over zero rows is null — an empty corpus has
        // zero violations, not unknown violations
        coalesce(sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)), lit(0L))
          .cast("long").as(s"__v_$n")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (n, _) =>
      wide.select(lit(n).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$n").as("n_violations"))
    }.reduce(_ unionByName _)
    stacked.select(col("rule"), col("n_rows"), col("n_violations"),
      round(when(col("n_rows") === 0L, lit(0.0))
        .otherwise(col("n_violations").cast("double") / col("n_rows")), 6)
        .as("violation_frac"),
      (col("n_violations") === 0L).as("pass"))
  }

  /** Key rule: every value combination of `cols` appears at most once.
    * n_violations counts the EXCESS rows (rows beyond the first of
    * each duplicated key) — 0 ⇔ the columns form a key.
    */
  def uniqueness(df: DataFrame, ruleName: String, cols: Seq[String]): DataFrame = {
    val g = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
    g.agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n_rows"),
        coalesce(sum(col("c") - 1), lit(0L)).cast("long").as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_rows"), col("n_violations"),
        round(when(col("n_rows") === 0L, lit(0.0))
          .otherwise(col("n_violations").cast("double") / col("n_rows")), 6)
          .as("violation_frac"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Convenience: row rules + key rules in one report, ordered by rule
    * name (each part keeps its own optimal scale shape — the union is
    * of per-rule 1-row aggregates).
    */
  def report(df: DataFrame, rowRules: Seq[(String, Column)],
      keyRules: Seq[(String, Seq[String])]): DataFrame = {
    val parts = (if (rowRules.nonEmpty) Seq(audit(df, rowRules)) else Nil) ++
      keyRules.map { case (n, cs) => uniqueness(df, n, cs) }
    require(parts.nonEmpty, "no rules")
    parts.reduce(_ unionByName _).select(outCols.map(col): _*).orderBy("rule")
  }
}
