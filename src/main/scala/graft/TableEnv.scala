package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TableEnvironment-like facade (ref: TableEnvironmentImpl.java:585
  * sqlQuery/executeSql): registers the warehouse tables as temp views
  * (with the events timestamp normalization) and the graft function
  * library, then delegates SQL to Catalyst — the entire §3.1 planner
  * stack (parse → analyze → optimize → codegen) is Spark's.
  */
final class TableEnv(val spark: SparkSession, dir: String) {
  GraftFunctions.register(spark)
  Seq("region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings").foreach { t =>
    Tables(spark, dir, t).createOrReplaceTempView(t)
  }

  /** ref: TableEnvironment.sqlQuery. Three pre-parse steps for the SQL
    * shapes Catalyst has no parse rule for: MATCH_RECOGNIZE statements
    * route through [[graft.cep.MatchRecognizeSql]] (lowered onto the
    * oracled NFA machinery), `FOR SYSTEM_TIME AS OF` temporal joins
    * route through [[TemporalSql]] (lowered onto the oracled
    * [[graft.operators.AsOfJoin]] union-sort plan), and windowing-TVF
    * calls (`TABLE(TUMBLE|HOP|CUMULATE|SESSION(...))`) rewrite through
    * [[WindowTvfSql]] into Spark's own `window()`/`session_window()`
    * before parsing; everything else goes to Catalyst verbatim.
    */
  private val versionedViews =
    scala.collection.mutable.Map.empty[String, (String, Option[String])]

  /** Versioned-table DDL analog (ref: SqlSnapshot / the PRIMARY KEY +
    * WATERMARK declaration that makes a table joinable with
    * `FOR SYSTEM_TIME AS OF`): registers `df` under `name` and records
    * its version-time column (+ optional tie-break for concurrent
    * versions) so temporal-join statements can pick the axis up
    * implicitly, exactly like the reference.
    */
  def createVersionedView(name: String, df: DataFrame,
      versionTimeCol: String, tieBreak: Option[String] = None): DataFrame = {
    require(df.columns.contains(versionTimeCol),
      s"createVersionedView($name): no column $versionTimeCol")
    df.createOrReplaceTempView(name)
    versionedViews.update(name.toLowerCase, (versionTimeCol, tieBreak))
    df
  }

  def sqlQuery(sql: String): DataFrame =
    if (graft.cep.MatchRecognizeSql.applies(sql)) graft.cep.MatchRecognizeSql.run(spark, sql)
    else if (TemporalSql.applies(sql))
      TemporalSql.run(spark, sql, n => versionedViews.get(n.toLowerCase))
    else if (WindowTvfSql.applies(sql)) {
      // streaming sources need the aggregate lowering (GROUP BY
      // window(...)) to keep the event-time tag; batch takes the
      // generic derived-table rewrite
      val streaming = WindowTvfSql.tvfTable(sql).exists(t =>
        scala.util.Try(spark.table(t).isStreaming).getOrElse(false))
      if (streaming)
        WindowTvfSql.rewriteStreamingAgg(sql).map(spark.sql)
          .getOrElse(spark.sql(WindowTvfSql.rewrite(sql)))
      else spark.sql(WindowTvfSql.rewrite(sql))
    } else if (RankSql.applies(sql))
      // StreamExecRank/StreamExecDeduplicate subsumption: batch inputs
      // fall through to Catalyst inside the route
      RankSql.run(spark, sql, "/tmp/graft-stream-out/ranksql")
    else spark.sql(sql)

  /** ref: TableEnvironment.from(tableName) */
  def from(table: String): DataFrame = spark.table(table)

  /** ref: TableEnvironment.explainSql — the reference prints the AST +
    * optimized logical + physical plan; Catalyst's formatted explain is
    * the same three-layer story.
    */
  def explainSql(sql: String): String =
    sqlQuery(sql).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Watermark-DDL analog (ref: `WATERMARK FOR rowtime AS rowtime -
    * INTERVAL '…'` — SqlWatermark / WatermarkSpec.java:36): the
    * reference declares the watermark once, per TABLE, and every query
    * over that table inherits the bound; Spark attaches watermarks
    * per-DataFrame, so without this each streaming query hand-places
    * `withWatermark`. `createStreamingView` registers a watermarked
    * streaming view under `name` — downstream `sqlQuery`/`from` reads
    * pick up the bound from the catalog exactly like a reference query
    * over a watermarked table.
    */
  def createStreamingView(name: String, df: DataFrame,
      rowtimeCol: String, delay: String): DataFrame = {
    require(df.isStreaming,
      s"createStreamingView($name): input is a batch DataFrame — watermarks bound event time on streams")
    val wm = df.withWatermark(rowtimeCol, delay)
    wm.createOrReplaceTempView(name)
    wm
  }
}

object TableEnv {
  def apply(spark: SparkSession, dir: String): TableEnv = new TableEnv(spark, dir)
}
