package graft.queries

import graft.Tables
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function parity batteries (SURVEY.md §2.9 / M2). One query per
  * category — string, math, temporal (date + time-of-day), conditional,
  * and the custom gap-list functions — each cell checked against DuckDB.
  *
  * Dialect rules (see tools/check.py findings): DuckDB length/instr/
  * ascii/rank/epoch/datediff return BIGINT (or DOUBLE for epoch) → cast
  * both sides to BIGINT; trig/log outputs round(…, 6) to absorb last-ulp
  * libm differences; pure arithmetic (+,-,*,/, abs, least/greatest) is
  * IEEE-identical and stays unrounded.
  */
object FunctionQueries {

  /** String functions (ref: FlinkSqlOperatorTable string section;
    * SqlFunctionUtils.java:1199).
    */
  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_type")).as("lo"),
      length(col("p_name")).cast("long").as("len"),
      substring(col("p_name"), 1, 5).as("sub"),
      concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
      concat(col("p_brand"), lit("-"), col("p_type")).as("cc"),
      lpad(col("p_brand"), 12, "*").as("lp"),
      rpad(col("p_type"), 10, ".").as("rp"),
      reverse(col("p_name")).as("rev"),
      expr("replace(p_name, ' ', '_')").as("rep"),
      expr("split_part(p_name, ' ', 1)").as("sp1"),
      split_index(col("p_name"), " ", 1).as("sp2"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
      ascii(col("p_brand")).cast("long").as("asc"),
      expr("instr(p_name, 'e')").cast("long").as("ins"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("tr"),
      md5(col("p_name")).as("h_md5"),
      sha2(col("p_name"), 256).as("h_sha"),
      base64(col("p_name").cast("binary")).as("b64"),
      expr("left(p_name, 3)").as("lft"),
      expr("right(p_name, 3)").as("rgt"),
      translate(col("p_name"), "aeiou", "AEIOU").as("tl"),
      repeat(col("p_brand"), 2).as("rpt"),
      levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"))
      .orderBy("p_partkey")

  val fnStringSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS up, lower(p_type) AS lo,
      |  length(p_name)::BIGINT AS len,
      |  substr(p_name, 1, 5) AS sub,
      |  concat_ws('|', p_brand, p_type) AS cw,
      |  p_brand || '-' || p_type AS cc,
      |  lpad(p_brand, 12, '*') AS lp, rpad(p_type, 10, '.') AS rp,
      |  reverse(p_name) AS rev,
      |  replace(p_name, ' ', '_') AS rep,
      |  split_part(p_name, ' ', 1) AS sp1,
      |  split_part(p_name, ' ', 2) AS sp2,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS rex,
      |  ascii(p_brand)::BIGINT AS asc,
      |  instr(p_name, 'e')::BIGINT AS ins,
      |  trim('  ' || p_name || '  ') AS tr,
      |  md5(p_name) AS h_md5, sha256(p_name) AS h_sha,
      |  base64(p_name::BLOB) AS b64,
      |  left(p_name, 3) AS lft, right(p_name, 3) AS rgt,
      |  translate(p_name, 'aeiou', 'AEIOU') AS tl,
      |  repeat(p_brand, 2) AS rpt,
      |  levenshtein(p_brand, p_type)::BIGINT AS lev
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Math functions (ref: FlinkSqlOperatorTable math section). */
  def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(lit(0) - col("l_extendedprice")).as("ab"),
      ceil(col("l_quantity")).as("cl"),
      floor(col("l_quantity")).as("fl"),
      round(sqrt(col("l_quantity")), 6).as("sq"),
      round(exp(col("l_discount")), 6).as("ex"),
      round(log(col("l_extendedprice")), 6).as("lg"),
      round(log10(col("l_extendedprice")), 6).as("l10"),
      round(pow(col("l_quantity"), 2.0), 4).as("pw"),
      round(sin(col("l_quantity")), 6).as("sn"),
      round(cos(col("l_quantity")), 6).as("cs"),
      round(atan2(col("l_quantity"), col("l_extendedprice")), 6).as("at2"),
      signum(col("l_discount") - 0.05).cast("long").as("sg"),
      (col("l_linenumber") % 3).cast("long").as("md"),
      round(radians(col("l_quantity")), 6).as("rd"),
      round(degrees(col("l_discount")), 6).as("dg"),
      greatest(col("l_quantity"), col("l_extendedprice") / 1000).as("gt"),
      least(col("l_quantity"), col("l_extendedprice") / 1000).as("lt"))
      .orderBy("l_orderkey", "l_linenumber")

  val fnMathSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  abs(0 - l_extendedprice) AS ab,
      |  ceil(l_quantity)::BIGINT AS cl,
      |  floor(l_quantity)::BIGINT AS fl,
      |  round(sqrt(l_quantity), 6) AS sq,
      |  round(exp(l_discount), 6) AS ex,
      |  round(ln(l_extendedprice), 6) AS lg,
      |  round(log10(l_extendedprice), 6) AS l10,
      |  round(pow(l_quantity, 2.0), 4) AS pw,
      |  round(sin(l_quantity), 6) AS sn,
      |  round(cos(l_quantity), 6) AS cs,
      |  round(atan2(l_quantity, l_extendedprice), 6) AS at2,
      |  sign(l_discount - 0.05)::BIGINT AS sg,
      |  (l_linenumber % 3)::BIGINT AS md,
      |  round(radians(l_quantity), 6) AS rd,
      |  round(degrees(l_discount), 6) AS dg,
      |  greatest(l_quantity, l_extendedprice / 1000) AS gt,
      |  least(l_quantity, l_extendedprice / 1000) AS lt
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Temporal functions, date-level (ref: FlinkSqlOperatorTable temporal
    * section). DuckDB dayofweek is 0-based (Sunday=0), Spark 1-based.
    */
  def fnTemporalDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      quarter(col("o_orderdate")).cast("long").as("q"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      dayofweek(col("o_orderdate")).cast("long").as("dw"),
      dayofyear(col("o_orderdate")).cast("long").as("dy"),
      weekofyear(col("o_orderdate")).cast("long").as("wk"),
      date_trunc("month", col("o_orderdate")).as("mon"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
      datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).cast("long").as("dd"),
      (col("o_orderdate") + expr("INTERVAL 3 MONTH")).as("plus3m"),
      unix_timestamp(col("o_orderdate")).as("ep"))
      .orderBy("o_orderkey")

  val fnTemporalDateSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate)::BIGINT AS y,
      |  quarter(o_orderdate)::BIGINT AS q,
      |  month(o_orderdate)::BIGINT AS m,
      |  day(o_orderdate)::BIGINT AS d,
      |  (dayofweek(o_orderdate) + 1)::BIGINT AS dw,
      |  dayofyear(o_orderdate)::BIGINT AS dy,
      |  week(o_orderdate)::BIGINT AS wk,
      |  date_trunc('month', o_orderdate)::TIMESTAMP AS mon,
      |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
      |  datediff('day', o_orderdate, TIMESTAMP '1998-01-01')::BIGINT AS dd,
      |  o_orderdate + INTERVAL 3 MONTH AS plus3m,
      |  epoch(o_orderdate)::BIGINT AS ep
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Temporal functions, time-of-day level, over the event stream. */
  def fnTemporalTime(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      hour(col("ts")).cast("long").as("hr"),
      minute(col("ts")).cast("long").as("mi"),
      second(col("ts")).cast("long").as("se"),
      date_trunc("hour", col("ts")).as("th"),
      date_trunc("minute", col("ts")).as("tm"),
      to_date(col("ts")).as("dt"),
      date_format(col("ts"), "HH:mm:ss").as("fmt"))
      .orderBy("event_id")

  val fnTemporalTimeSql: String =
    Tables.eventsCte +
      """
        |SELECT event_id,
        |  hour(ts)::BIGINT AS hr,
        |  minute(ts)::BIGINT AS mi,
        |  second(ts)::BIGINT AS se,
        |  date_trunc('hour', ts) AS th,
        |  date_trunc('minute', ts) AS tm,
        |  CAST(ts AS DATE) AS dt,
        |  strftime(ts, '%H:%M:%S') AS fmt
        |FROM ev ORDER BY event_id""".stripMargin

  /** Conditional / comparison functions (ref: FlinkSqlOperatorTable
    * comparison/logic section): CASE, NULLIF, COALESCE, IS DISTINCT
    * FROM, IN, BETWEEN, LEAST/GREATEST.
    */
  def fnConditional(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high").as("bal_class"),
      coalesce(nullif(col("c_mktsegment"), lit("AUTOMOBILE")), lit("auto")).as("seg"),
      least(col("c_acctbal"), lit(1000.0)).as("lst"),
      greatest(col("c_acctbal"), lit(0.0)).as("grt"),
      col("c_mktsegment").isin("BUILDING", "MACHINERY").as("in_seg"),
      (!(col("c_nationkey") <=> lit(5))).as("dist5"),
      col("c_acctbal").between(0, 5000).as("btw"))
      .orderBy("c_custkey")

  val fnConditionalSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class,
      |  coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'auto') AS seg,
      |  least(c_acctbal, 1000.0) AS lst,
      |  greatest(c_acctbal, 0.0) AS grt,
      |  c_mktsegment IN ('BUILDING', 'MACHINERY') AS in_seg,
      |  c_nationkey IS DISTINCT FROM 5 AS dist5,
      |  c_acctbal BETWEEN 0 AND 5000 AS btw
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Custom gap-list functions (SURVEY.md §2.9 "custom Catalyst
    * expressions needed"): HASH_CODE, IS_DIGIT/ALPHA/DECIMAL, SIMILAR TO,
    * plus JSON access on the props column. The oracle reproduces Java
    * String.hashCode with a list_reduce over UTF-16 code units mod 2^32.
    */
  def fnGraft(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      is_digit(get_json_object(col("props"), "$.k")).as("isd"),
      is_alpha(col("event_type")).as("isa"),
      is_decimal(get_json_object(col("props"), "$.k")).as("isdec"),
      hash_code(col("event_type")).cast("long").as("hc"),
      similar_to(col("event_type"), "(cl|si)%").as("sim"))
      .orderBy("event_id")
  }

  val fnGraftSql: String =
    Tables.eventsCte +
      """
        |SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  regexp_full_match(json_extract_string(props, '$.k'), '[0-9]+') AS isd,
        |  regexp_full_match(event_type, '[a-zA-Z]+') AS isa,
        |  regexp_full_match(json_extract_string(props, '$.k'), '[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)') AS isdec,
        |  CASE WHEN hc_raw >= 2147483648 THEN hc_raw - 4294967296 ELSE hc_raw END AS hc,
        |  regexp_full_match(event_type, '(?:(cl|si).*)') AS sim
        |FROM (
        |  SELECT *, list_reduce(
        |    list_transform(string_split_regex(event_type, ''), c -> unicode(c)::BIGINT),
        |    (a, b) -> (a * 31 + b) % 4294967296) AS hc_raw
        |  FROM ev)
        |ORDER BY event_id""".stripMargin

  /** JSON access + map-type function battery (ref: FlinkSqlOperatorTable
    * JSON_VALUE / the table API MAP type and its accessors;
    * SqlJsonUtils): `get_json_object` and a schema'd `from_json` both
    * extract the same field (parser cross-check), then a constructed
    * map runs through transform_values → map_filter → keys/values/
    * element_at. The DuckDB oracle computes every output from k by
    * DIRECT arithmetic — the map pipeline must reduce to it (route
    * independence): values {k+1, 2k+1, 3k+1}, evens ⇔ k odd ⇒
    * n_even ∈ {0, 2}, even_keys ∈ {'', 'a,c'}, sum = 6k+3.
    */
  def fnJson(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("props"))
      .withColumn("k", k)
      .withColumn("k2",
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k"))
    val m = map(lit("a"), col("k"), lit("b"), col("k") * 2, lit("c"), col("k") * 3)
    val tv = transform_values(m, (_, v) => v + 1)
    val mf = map_filter(tv, (_, v) => v % 2 === 0)
    ev.select(col("event_id"), col("k"), col("k2"),
        size(mf).cast("long").as("n_even"),
        array_join(sort_array(map_keys(mf)), ",").as("even_keys"),
        aggregate(map_values(tv), lit(0), (a, x) => a + x).cast("long").as("sum_vals"),
        element_at(map_concat(tv, map(lit("d"), lit(100))), "d").cast("long").as("d_val"))
      .orderBy("event_id")
  }

  val fnJsonSql: String =
    Tables.eventsCte +
      """
        |, j AS (SELECT event_id, CAST(props::JSON->>'k' AS INTEGER) AS k FROM ev)
        |SELECT event_id, k, k AS k2,
        |  (CASE WHEN k % 2 = 1 THEN 2 ELSE 0 END)::BIGINT AS n_even,
        |  CASE WHEN k % 2 = 1 THEN 'a,c' ELSE '' END AS even_keys,
        |  (6 * k + 3)::BIGINT AS sum_vals,
        |  100::BIGINT AS d_val
        |FROM j ORDER BY event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_fn_json", fnJson, Some(fnJsonSql)),
    Q("q_fn_string", fnString, Some(fnStringSql)),
    Q("q_fn_math", fnMath, Some(fnMathSql)),
    Q("q_fn_temporal_date", fnTemporalDate, Some(fnTemporalDateSql)),
    Q("q_fn_temporal_time", fnTemporalTime, Some(fnTemporalTimeSql)),
    Q("q_fn_conditional", fnConditional, Some(fnConditionalSql)),
    Q("q_fn_graft", fnGraft, Some(fnGraftSql))
  )
}
