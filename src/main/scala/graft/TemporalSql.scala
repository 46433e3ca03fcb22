package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `FOR SYSTEM_TIME AS OF` statement surface (ref:
  * StreamExecTemporalJoin.scala:51 / SqlSnapshot — the reference's
  * temporal-join SQL shape over a versioned table). Spark's parser has
  * no SYSTEM_TIME clause, so [[TableEnv.sqlQuery]] routes statements
  * containing one through this pre-parser, the same move the
  * MATCH_RECOGNIZE and windowing-TVF routes make: parse the restricted
  * statement shape, lower the temporal join onto the oracled
  * [[AsOfJoin.backward]] union-sort plan (ONE exchange + sort, no
  * build-side explosion), register the joined frame, and hand the rest
  * of the statement back to Catalyst.
  *
  * The reference declares a table's version axis in DDL (PRIMARY KEY +
  * WATERMARK); here [[TableEnv.createVersionedView]] plays that role,
  * recording the version-time column (and optional tie-break) the join
  * then picks up implicitly — the statement itself never names the
  * right-side time column, exactly like the reference.
  *
  * Supported shape (one temporal join; aliases required; equi-keys in
  * the ON clause; WHERE/GROUP BY/ORDER BY/LIMIT tails pass through):
  *
  * {{{
  * SELECT <exprs> FROM <probe> [AS] p
  *   [LEFT] JOIN <versioned> FOR SYSTEM_TIME AS OF p.<ts> [AS] v
  *   ON v.<k> = p.<k> [AND ...]
  * [WHERE ...] [GROUP BY ...] [ORDER BY ...] [LIMIT ...]
  * }}}
  *
  * JOIN is INNER per the reference (a probe row with no version at its
  * time drops); LEFT JOIN keeps it with NULL payload.
  */
object TemporalSql {

  /** A registered temporal table function (ref:
    * TemporalTableFunction.java / Table.createTemporalTableFunction —
    * the reference's OTHER temporal-join syntax, predating
    * FOR SYSTEM_TIME AS OF): the versioned frame plus its declared
    * version-time axis and primary keys.
    */
  final case class TemporalFn(df: org.apache.spark.sql.DataFrame,
      timeAttr: String, primaryKeys: Seq[String], tieBreak: Option[String])

  private val FnStmt =
    raw"(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+AS)?\s+(\w+)\s*,\s*LATERAL\s+TABLE\s*\(\s*(\w+)\s*\(\s*(\w+)\.(\w+)\s*\)\s*\)(?:\s+AS)?\s+(\w+)\s+WHERE\s+(.+?)(\s+(?:GROUP|ORDER|LIMIT)\b.*|\s*)$$".r

  def appliesFn(sql: String): Boolean =
    raw"(?is)LATERAL\s+TABLE\s*\(".r.findFirstIn(sql).isDefined

  /** `SELECT … FROM probe p, LATERAL TABLE (fn(p.ts)) r WHERE r.pk =
    * p.k [AND …]` — the temporal table FUNCTION join (ref:
    * `LATERAL TABLE (Rates(o.rowtime))` in the reference docs and
    * TemporalTableFunctionJoin planning): the function carries the
    * version axis and primary keys, the WHERE supplies the key
    * equalities (ALL primary keys must be covered — fail loudly
    * otherwise), residual conjuncts and GROUP/ORDER/LIMIT tails pass
    * through to Catalyst over the joined view. INNER semantics, like
    * the reference's lateral temporal join. Lowering = the same
    * oracled [[AsOfJoin.backward]] union-sort plan as the
    * FOR SYSTEM_TIME route — the two syntaxes must agree.
    */
  def runFn(spark: SparkSession, sql: String,
      fns: String => Option[TemporalFn]): DataFrame = sql match {
    case FnStmt(selectList, probeTbl, probeAlias, fnName, tsAlias, probeTs,
        verAlias, whereClause, tail) =>
      // the statement regex is literal-unaware: a clause keyword INSIDE
      // a string can shear the match mid-literal — reject loudly (an
      // odd dangling quote in any captured fragment) instead of letting
      // the rewrites corrupt the literal (r10 review)
      Seq(selectList, whereClause, tail).foreach(f =>
        require(SqlLex.literalsClosed(f),
          s"LATERAL TABLE statement: a string literal spans a clause boundary " +
            s"(unclosed quote in fragment '${f.take(60)}…') — rephrase without " +
            "clause keywords inside literals"))
      require(tsAlias.equalsIgnoreCase(probeAlias),
        s"LATERAL TABLE ($fnName($tsAlias.$probeTs)): the time argument must come " +
          s"from the probe side ($probeAlias)")
      val fn = fns(fnName).getOrElse(throw new IllegalArgumentException(
        s"$fnName is not a registered temporal table function — register it with " +
          "createTemporalTableFunction(name, df, timeAttr, primaryKeys[, tieBreak]) " +
          "(the reference's Table.createTemporalTableFunction)"))
      // split WHERE on top-level ANDs (literal- and paren-aware — an AND
      // inside a string or a parenthesized disjunct is not a conjunct
      // boundary): pk equalities join, the rest pass through
      val conjuncts = SqlLex.splitTopAnd(whereClause)
      val (keyConjs, residual) = conjuncts.partition {
        case KeyPair(a1, c1, a2, c2) =>
          (a1.equalsIgnoreCase(verAlias) && a2.equalsIgnoreCase(probeAlias) &&
            fn.primaryKeys.exists(_.equalsIgnoreCase(c1))) ||
          (a1.equalsIgnoreCase(probeAlias) && a2.equalsIgnoreCase(verAlias) &&
            fn.primaryKeys.exists(_.equalsIgnoreCase(c2)))
        case _ => false
      }
      val keys = keyConjs.map {
        case KeyPair(a1, c1, _, c2) if a1.equalsIgnoreCase(verAlias) => (c1, c2)
        case KeyPair(_, c1, _, c2) => (c2, c1)
      }.distinct // a repeated equality must not double-rename the key
      val missing = fn.primaryKeys.filterNot(pk => keys.exists(_._1.equalsIgnoreCase(pk)))
      require(missing.isEmpty,
        s"LATERAL TABLE ($fnName): WHERE must equate every declared primary key " +
          s"with a probe column; missing: ${missing.mkString(", ")}")
      val probe = spark.table(probeTbl)
      val matched = "__temporal_matched"
      val version0 = keys.foldLeft(fn.df) {
        case (df, (vk, pk)) => if (vk == pk) df else df.withColumnRenamed(vk, pk)
      }.withColumn(matched, lit(true))
      val payload = version0.columns.toSeq.diff(keys.map(_._2) :+ fn.timeAttr)
      val joined = AsOfJoin.backward(
        probe, version0,
        keys = keys.map(_._2), leftTs = probeTs, rightTs = fn.timeAttr,
        payload = payload, tieBreak = fn.tieBreak)
      val result = joined.filter(col(matched)).drop(matched)
      val view = s"__temporalfn_${probeTbl}_$fnName"
      result.createOrReplaceTempView(view)
      val strip = (s: String) =>
        SqlLex.stripQualifiers(s, Seq(probeAlias, verAlias))
      val where = if (residual.isEmpty) "" else s" WHERE ${strip(residual.mkString(" AND "))}"
      spark.sql(s"SELECT ${strip(selectList)} FROM $view$where${strip(tail)}")
    case _ =>
      throw new IllegalArgumentException(
        "unsupported LATERAL TABLE statement shape — expected SELECT ... FROM probe p, " +
          "LATERAL TABLE (fn(p.ts)) r WHERE r.pk = p.k [AND ...]")
  }

  private val Stmt =
    raw"(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+AS)?\s+(\w+)\s+(LEFT\s+)?JOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)(?:\s+AS)?\s+(\w+)\s+ON\s+(.+?)(\s+(?:WHERE|GROUP|ORDER|LIMIT)\b.*|\s*)$$".r

  private val KeyPair = raw"(?i)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*".r

  def applies(sql: String): Boolean =
    raw"(?is)FOR\s+SYSTEM_TIME\s+AS\s+OF".r.findFirstIn(sql).isDefined

  /** @param versionTime version-time column + optional tie-break per
    *                    versioned view name, from the TableEnv registry
    */
  def run(spark: SparkSession, sql: String,
      versionTime: String => Option[(String, Option[String])]): DataFrame = sql match {
    case Stmt(selectList, probeTbl, probeAlias, leftKw, verTbl, asOfAlias,
        probeTs, verAlias, onClause, tail) =>
      Seq(selectList, onClause, tail).foreach(f =>
        require(SqlLex.literalsClosed(f),
          s"FOR SYSTEM_TIME statement: a string literal spans a clause boundary " +
            s"(unclosed quote in fragment '${f.take(60)}…') — rephrase without " +
            "clause keywords inside literals"))
      require(asOfAlias.equalsIgnoreCase(probeAlias),
        s"FOR SYSTEM_TIME AS OF $asOfAlias.$probeTs: the AS OF time must come " +
          s"from the probe side ($probeAlias)")
      val (verTs, tieBreak) = versionTime(verTbl).getOrElse(
        throw new IllegalArgumentException(
          s"$verTbl is not a declared versioned table — register it with " +
            "createVersionedView(name, df, versionTimeCol[, tieBreak]) first " +
            "(the reference's PRIMARY KEY + WATERMARK DDL)"))
      // equi-key pairs, either orientation (v.k = p.k or p.k = v.k);
      // literal-aware split so an AND inside a string cannot shear a
      // conjunct (same lexer as the WHERE route)
      val keys = SqlLex.splitTopAnd(onClause).map {
        case KeyPair(a1, c1, a2, c2) if a1.equalsIgnoreCase(verAlias) && a2.equalsIgnoreCase(probeAlias) => (c1, c2)
        case KeyPair(a1, c1, a2, c2) if a1.equalsIgnoreCase(probeAlias) && a2.equalsIgnoreCase(verAlias) => (c2, c1)
        case other => throw new IllegalArgumentException(
          s"temporal join ON clause must be equi-keys between $probeAlias and $verAlias; got: $other")
      }
      val probe = spark.table(probeTbl)
      val matched = "__temporal_matched"
      // align version key names to the probe's, mark real versions so
      // INNER can drop probe rows with no version at their time
      val version0 = keys.foldLeft(spark.table(verTbl)) {
        case (df, (vk, pk)) => if (vk == pk) df else df.withColumnRenamed(vk, pk)
      }.withColumn(matched, lit(true))
      val payload = version0.columns.toSeq.diff(keys.map(_._2) :+ verTs)
      val joined = AsOfJoin.backward(
        probe, version0,
        keys = keys.map(_._2), leftTs = probeTs, rightTs = verTs,
        payload = payload, tieBreak = tieBreak)
      val inner = leftKw == null || leftKw.trim.isEmpty
      val result = (if (inner) joined.filter(col(matched)) else joined).drop(matched)
      val view = s"__temporal_${probeTbl}_$verTbl"
      result.createOrReplaceTempView(view)
      // the temporal join is resolved; the rest of the statement is
      // ordinary Catalyst SQL over the joined view
      val strip = (s: String) =>
        SqlLex.stripQualifiers(s, Seq(probeAlias, verAlias))
      spark.sql(s"SELECT ${strip(selectList)} FROM $view${strip(tail)}")
    case _ =>
      throw new IllegalArgumentException(
        "unsupported FOR SYSTEM_TIME AS OF statement shape — expected " +
          "SELECT ... FROM probe p [LEFT] JOIN versioned FOR SYSTEM_TIME AS OF p.ts v ON v.k = p.k")
  }
}
