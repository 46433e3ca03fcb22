package graft

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** SQL DDL + statement-execution surface (ref:
  * flink-sql-parser/.../ddl/SqlCreateTable.java, SqlWatermark.java,
  * SqlCreateView.java, and TableEnvironmentImpl.java:605 executeSql /
  * StatementSetImpl): the reference user's first act is
  * `executeSql("CREATE TABLE t (…, WATERMARK FOR ts AS ts - INTERVAL
  * '10' SECOND) WITH ('connector'='filesystem', 'path'=…,
  * 'format'=…)")` followed by `INSERT INTO sink SELECT …`. Spark's
  * parser has its own CREATE TABLE but no WATERMARK clause and no
  * connector-options WITH list, so [[TableEnv.executeSql]] routes DDL
  * statements through this pre-parser — the same restricted-shape,
  * fail-loud move as [[graft.cep.MatchRecognizeSql]] / [[TemporalSql]]
  * — and lowers them onto Spark's own readers/writers:
  *
  *  - `CREATE TABLE` registers the declared schema + path + format;
  *    a WATERMARK clause makes the registered view a STREAMING read
  *    (`readStream` + `withWatermark` — the per-table WatermarkSpec
  *    posture, inherited by every downstream statement), otherwise a
  *    batch read with the declared schema (empty-path safe).
  *  - `CREATE [OR REPLACE] VIEW v AS SELECT …` evaluates through the
  *    full [[TableEnv.sqlQuery]] route (MATCH_RECOGNIZE / temporal /
  *    TVF shapes included) and registers the result.
  *  - `INSERT INTO|OVERWRITE t SELECT …` aligns the select POSITIONALLY
  *    to the declared columns with implicit casts (the reference's
  *    insert semantics) and writes with the table's declared
  *    format+path — `writeStream` (AvailableNow, append) when the
  *    select is streaming, `DataFrameWriter` otherwise.
  *
  * Supported WITH options: `connector` (must be `filesystem`), `path`,
  * `format` (`parquet` | `csv` | `json`), and
  * `source.max-files-per-trigger` (micro-batch replay granularity for
  * streaming reads). Anything else fails loudly — never silently
  * ignored.
  */
object DdlSql {

  /** One declared column: physical (name + type, backed by files) or
    * computed (`name AS expr` — ref SqlTableColumn.java's computed
    * variant: virtual, projected into the registered view in declared
    * order, never an INSERT target). `PROCTIME()` lowers to
    * `current_timestamp()` — the documented processing-time posture.
    */
  sealed trait Col { def name: String }
  final case class PhysCol(name: String, typ: String) extends Col
  final case class CompCol(name: String, sqlExpr: String) extends Col

  /** A DDL-declared table: the catalog entry every later statement
    * resolves against (ref CatalogTable / ResolvedSchema).
    */
  final case class TableDef(
      name: String,
      colDefs: Seq[Col], // declared order, physical + computed
      watermark: Option[(String, String)], // (rowtime col, "10 minutes")
      path: String,
      format: String,
      maxFilesPerTrigger: Option[Int],
      partitions: Seq[String] = Nil) { // PARTITIONED BY columns (physical)
    /** Physical (file-backed, insertable) columns in declared order. */
    def cols: Seq[(String, String)] = colDefs.collect { case PhysCol(n, t) => (n, t) }
    def computed: Seq[(String, String)] = colDefs.collect { case CompCol(n, e) => (n, e) }
    def schema: StructType =
      StructType(cols.map { case (n, t) => StructField(n, DataType.fromDDL(t)) })
  }

  /** `cols` empty = positional insert over ALL physical columns (the
    * classic shape); non-empty = the declared column-list subset, with
    * unnamed physical columns null-filled (ref SqlInsert's column
    * list).
    */
  final case class Insert(table: String, select: String, overwrite: Boolean,
      cols: Seq[String] = Nil)

  private val CreateTableRx =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s*\((.*?)\)\s*(?:PARTITIONED\s+BY\s*\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)\s*)?WITH\s*\((.*)\)\s*$$".r
  private val CreateViewRx =
    raw"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+([A-Za-z_]\w*)\s+AS\s+(.+)$$".r
  private val InsertRx =
    raw"(?is)^\s*INSERT\s+(INTO|OVERWRITE)\s+([A-Za-z_]\w*)\s*(?:\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)\s*)?(SELECT\b.+)$$".r
  private val CreateTableLikeRx =
    raw"(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+(?:WITH\s*\((.*)\)\s+)?LIKE\s+([A-Za-z_]\w*)\s*$$".r
  private val WatermarkRx =
    raw"(?is)^WATERMARK\s+FOR\s+([A-Za-z_]\w*)\s+AS\s+([A-Za-z_]\w*)\s*-\s*INTERVAL\s*'(\d+)'\s*(SECOND|MINUTE|HOUR|DAY)S?$$".r
  private val ComputedColRx =
    raw"(?is)^([A-Za-z_]\w*)\s+AS\s+(.+)$$".r
  private val DropRx =
    raw"(?is)^\s*DROP\s+(TABLE|VIEW)\s+(?:(IF\s+EXISTS)\s+)?([A-Za-z_]\w*)\s*$$".r
  private val AlterRenameRx =
    raw"(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+RENAME\s+TO\s+([A-Za-z_]\w*)\s*$$".r
  private val CreateFunctionRx =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+AS\s+'([^']+)'\s*$$".r

  def isCreateTable(sql: String): Boolean = CreateTableRx.pattern.matcher(sql).matches()
  def isCreateView(sql: String): Boolean = CreateViewRx.pattern.matcher(sql).matches()
  def isInsert(sql: String): Boolean = InsertRx.pattern.matcher(sql).matches()
  def isDrop(sql: String): Boolean = DropRx.pattern.matcher(sql).matches() ||
    raw"(?is)^\s*DROP\s+(TABLE|VIEW)\b.*".r.pattern.matcher(sql).matches()
  def isAlterTable(sql: String): Boolean =
    raw"(?is)^\s*ALTER\s+TABLE\b.*".r.pattern.matcher(sql).matches()
  def isCreateFunction(sql: String): Boolean =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\b.*".r
      .pattern.matcher(sql).matches()
  def isShowTables(sql: String): Boolean =
    raw"(?is)^\s*SHOW\s+TABLES\s*$$".r.pattern.matcher(sql).matches()
  def isShowDatabases(sql: String): Boolean =
    raw"(?is)^\s*SHOW\s+DATABASES\s*$$".r.pattern.matcher(sql).matches()
  def isShowCatalogs(sql: String): Boolean =
    raw"(?is)^\s*SHOW\s+CATALOGS\s*$$".r.pattern.matcher(sql).matches()
  def isShowFunctions(sql: String): Boolean =
    raw"(?is)^\s*SHOW\s+(?:USER\s+)?FUNCTIONS\s*$$".r.pattern.matcher(sql).matches()
  def isUse(sql: String): Boolean =
    raw"(?is)^\s*USE\b.*".r.pattern.matcher(sql).matches()

  private val UseRx =
    raw"(?is)^\s*USE\s+(CATALOG\s+)?([A-Za-z_]\w*)(?:\s*\.\s*([A-Za-z_]\w*))?\s*$$".r

  /** USE CATALOG cat | USE [cat.]db → (isCatalog, catalogPart, name).
    * The reference's SqlUseDatabase stores a COMPOUND identifier
    * (fullDatabaseName() is String[]), so `USE default_catalog.
    * default_database` is valid grammar and carries the catalog part
    * separately; SqlUseCatalog takes a simple name only. Loud on any
    * other USE shape.
    */
  def parseUse(sql: String): (Boolean, Option[String], String) = sql match {
    case UseRx(cat, a, b) if cat != null && b != null =>
      throw new IllegalArgumentException(
        s"USE CATALOG $a.$b: a catalog is a simple name (ref SqlUseCatalog)")
    case UseRx(cat, a, _) if cat != null => (true, None, a)
    case UseRx(_, a, b) if b != null => (false, Some(a), b)
    case UseRx(_, a, _) => (false, None, a)
    case _ => throw new IllegalArgumentException(
      "unsupported USE shape — expected USE CATALOG name | USE [catalog.]database")
  }
  def isDescribe(sql: String): Boolean =
    raw"(?is)^\s*DESC(?:RIBE)?\s+(?!EXTENDED\b|FORMATTED\b)(?:TABLE\s+)?[A-Za-z_]\w*\s*$$".r
      .pattern.matcher(sql).matches()
  def applies(sql: String): Boolean = isCreateTable(sql) || isCreateView(sql) || isInsert(sql)

  // --- the statement tail: function/database DDL + catalog DQL ---

  private val DropFunctionRx =
    raw"(?is)^\s*DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(?:(IF\s+EXISTS)\s+)?([A-Za-z_]\w*)\s*$$".r
  private val CreateDatabaseRx =
    raw"(?is)^\s*CREATE\s+DATABASE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z_]\w*)\s*(?:COMMENT\s+'([^']*)'\s*)?(?:WITH\s*\((.*)\)\s*)?$$".r
  private val DropDatabaseRx =
    raw"(?is)^\s*DROP\s+DATABASE\s+(?:(IF\s+EXISTS)\s+)?([A-Za-z_]\w*)\s*(RESTRICT|CASCADE)?\s*$$".r
  private val AlterDatabaseRx =
    raw"(?is)^\s*ALTER\s+DATABASE\s+([A-Za-z_]\w*)\s+SET\s*\((.*)\)\s*$$".r
  private val AlterTableSetRx =
    raw"(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+SET\s*\((.*)\)\s*$$".r
  private val DescribeCatalogRx =
    raw"(?is)^\s*DESC(?:RIBE)?\s+CATALOG\s+([A-Za-z_]\w*)\s*$$".r
  private val DescribeDatabaseRx =
    raw"(?is)^\s*DESC(?:RIBE)?\s+DATABASE\s+(EXTENDED\s+)?([A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)?)\s*$$".r

  def isDropFunction(sql: String): Boolean =
    raw"(?is)^\s*DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\b.*".r
      .pattern.matcher(sql).matches()
  def isCreateDatabase(sql: String): Boolean =
    raw"(?is)^\s*CREATE\s+DATABASE\b.*".r.pattern.matcher(sql).matches()
  def isDropDatabase(sql: String): Boolean =
    raw"(?is)^\s*DROP\s+DATABASE\b.*".r.pattern.matcher(sql).matches()
  def isAlterDatabase(sql: String): Boolean =
    raw"(?is)^\s*ALTER\s+DATABASE\b.*".r.pattern.matcher(sql).matches()
  def isAlterTableSet(sql: String): Boolean =
    AlterTableSetRx.pattern.matcher(sql).matches()
  def isDescribeCatalog(sql: String): Boolean =
    raw"(?is)^\s*DESC(?:RIBE)?\s+CATALOG\b.*".r.pattern.matcher(sql).matches()
  def isDescribeDatabase(sql: String): Boolean =
    raw"(?is)^\s*DESC(?:RIBE)?\s+DATABASE\b.*".r.pattern.matcher(sql).matches()

  /** DROP [TEMPORARY] [SYSTEM] FUNCTION [IF EXISTS] name →
    * (ifExists, name); loud on any other shape (ref
    * ddl/SqlDropFunction.java — the TEMPORARY/SYSTEM keywords select
    * the registry tier; one session registry here, so they parse and
    * fold).
    */
  def parseDropFunction(sql: String): (Boolean, String) = sql match {
    case DropFunctionRx(ifExists, name) => (ifExists != null, name)
    case _ => throw new IllegalArgumentException(
      "unsupported DROP FUNCTION shape — expected DROP [TEMPORARY] [SYSTEM] " +
        "FUNCTION [IF EXISTS] name")
  }

  /** CREATE DATABASE [IF NOT EXISTS] name [COMMENT '…'] [WITH (…)] →
    * (ifNotExists, name, comment, properties) (ref
    * ddl/SqlCreateDatabase.java — name, optional comment, property
    * list).
    */
  def parseCreateDatabase(sql: String): (Boolean, String, Option[String], Map[String, String]) =
    sql match {
      case CreateDatabaseRx(ifNotExists, name, comment, propsRaw) =>
        (ifNotExists != null, name, Option(comment),
          Option(propsRaw).map(parseOptions).getOrElse(Map.empty))
      case _ => throw new IllegalArgumentException(
        "unsupported CREATE DATABASE shape — expected CREATE DATABASE " +
          "[IF NOT EXISTS] name [COMMENT '…'] [WITH ('k'='v', …)]")
    }

  /** DROP DATABASE [IF EXISTS] name [RESTRICT|CASCADE] →
    * (ifExists, name, cascade) (ref ddl/SqlDropDatabase.java —
    * RESTRICT is the default, CASCADE drops contained tables too).
    */
  def parseDropDatabase(sql: String): (Boolean, String, Boolean) = sql match {
    case DropDatabaseRx(ifExists, name, mode) =>
      (ifExists != null, name, mode != null && mode.equalsIgnoreCase("CASCADE"))
    case _ => throw new IllegalArgumentException(
      "unsupported DROP DATABASE shape — expected DROP DATABASE [IF EXISTS] name " +
        "[RESTRICT|CASCADE]")
  }

  /** ALTER DATABASE name SET ('k'='v', …) → (name, properties) (ref
    * ddl/SqlAlterDatabase.java — SET is the only ALTER DATABASE verb).
    */
  def parseAlterDatabase(sql: String): (String, Map[String, String]) = sql match {
    case AlterDatabaseRx(name, propsRaw) => (name, parseOptions(propsRaw))
    case _ => throw new IllegalArgumentException(
      "unsupported ALTER DATABASE shape — expected ALTER DATABASE name SET ('k'='v', …)")
  }

  /** ALTER TABLE t SET ('k'='v', …) → (table, properties) (ref
    * ddl/SqlAlterTableProperties.java — mutates the table's WITH
    * options in place).
    */
  def parseAlterTableSet(sql: String): (String, Map[String, String]) = sql match {
    case AlterTableSetRx(name, propsRaw) => (name, parseOptions(propsRaw))
    case _ => throw new IllegalArgumentException(
      "unsupported ALTER TABLE SET shape — expected ALTER TABLE t SET ('k'='v', …)")
  }

  /** DESCRIBE CATALOG name → name (ref dql/SqlDescribeCatalog.java). */
  def parseDescribeCatalog(sql: String): String = sql match {
    case DescribeCatalogRx(name) => name
    case _ => throw new IllegalArgumentException(
      "unsupported DESCRIBE CATALOG shape — expected DESCRIBE CATALOG name")
  }

  /** DESCRIBE DATABASE [EXTENDED] [catalog.]db → (extended,
    * catalogPart, db) (ref dql/SqlDescribeDatabase.java — compound
    * database identifier, EXTENDED adds the property list).
    */
  def parseDescribeDatabase(sql: String): (Boolean, Option[String], String) = sql match {
    case DescribeDatabaseRx(ext, ident) =>
      val parts = ident.split(raw"\s*\.\s*")
      if (parts.length == 2) (ext != null, Some(parts(0)), parts(1))
      else (ext != null, None, parts(0))
    case _ => throw new IllegalArgumentException(
      "unsupported DESCRIBE DATABASE shape — expected DESCRIBE DATABASE [EXTENDED] " +
        "[catalog.]database")
  }

  /** DROP TABLE|VIEW [IF EXISTS] name → (kind, ifExists, name); loud on
    * any other DROP shape (ref SqlDropTable.java / SqlDropView.java).
    */
  def parseDrop(sql: String): (String, Boolean, String) = sql match {
    case DropRx(kind, ifExists, name) => (kind.toUpperCase, ifExists != null, name)
    case _ => throw new IllegalArgumentException(
      "unsupported DROP shape — expected DROP TABLE|VIEW [IF EXISTS] name")
  }

  /** ALTER TABLE a RENAME TO b → (a, b); loud on every other ALTER
    * (ref SqlAlterTable.java — RENAME and SET (see
    * [[parseAlterTableSet]]) are the supported subset).
    */
  def parseAlterRename(sql: String): (String, String) = sql match {
    case AlterRenameRx(from, to) => (from, to)
    case _ => throw new IllegalArgumentException(
      "unsupported ALTER TABLE shape — expected ALTER TABLE a RENAME TO b or " +
        "ALTER TABLE t SET ('k'='v', …) (ADD/MODIFY/DROP COLUMN are not in the " +
        "supported subset)")
  }

  /** CREATE FUNCTION alias AS 'target' → (alias, target) (ref
    * SqlCreateFunction.java:41 — the identifier names a function
    * already known to the session's registry, the class-loading route
    * is out of scope for a library build).
    */
  def parseCreateFunction(sql: String): (String, String) = sql match {
    case CreateFunctionRx(name, target) => (name, target)
    case _ => throw new IllegalArgumentException(
      "unsupported CREATE FUNCTION shape — expected CREATE [TEMPORARY] FUNCTION " +
        "name AS '<registered function name>'")
  }

  def parseDescribe(sql: String): String =
    raw"(?is)^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s*$$".r
      .findFirstMatchIn(sql).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException("unsupported DESCRIBE shape"))

  /** Top-level comma split ([[SqlLex.splitTopCommas]] — the shared
    * quote/paren-aware lexer), so `DECIMAL(38,0)` / `'a,b'` survive.
    */
  private def splitTop(s: String): Seq[String] = SqlLex.splitTopCommas(s)

  /** Flink type name → Spark DDL type. Precision on TIMESTAMP is
    * documentation (Spark timestamps are fixed micros); VARCHAR/CHAR
    * lengths erase to string, the reference's own runtime behavior.
    */
  private def mapType(t: String): String = {
    val up = t.trim.toUpperCase
    up match {
      case "STRING" => "string"
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => "string"
      case "BIGINT" => "bigint"
      case "INT" | "INTEGER" => "int"
      case "SMALLINT" => "smallint"
      case "TINYINT" => "tinyint"
      case "DOUBLE" => "double"
      case "FLOAT" | "REAL" => "float"
      case "BOOLEAN" => "boolean"
      case "DATE" => "date"
      case s if s.startsWith("TIMESTAMP_LTZ") || s.startsWith("TIMESTAMP") => "timestamp"
      case s if s.startsWith("DECIMAL") || s.startsWith("NUMERIC") =>
        "decimal" + s.dropWhile(_ != '(')
      case s if s.startsWith("BINARY") || s.startsWith("VARBINARY") || s == "BYTES" => "binary"
      case other => throw new IllegalArgumentException(
        s"CREATE TABLE: unsupported column type $other (supported: STRING/VARCHAR/CHAR, " +
          "BIGINT/INT/SMALLINT/TINYINT, DOUBLE/FLOAT, BOOLEAN, DATE, TIMESTAMP[_LTZ](p), " +
          "DECIMAL(p,s), BINARY/BYTES)")
    }
  }

  private def parseOptions(raw: String): Map[String, String] =
    splitTop(raw).map { kv =>
      val m = raw"(?s)^\s*'([^']*)'\s*=\s*'([^']*)'\s*$$".r
        .findFirstMatchIn(kv).getOrElse(throw new IllegalArgumentException(
          s"CREATE TABLE WITH: expected 'key'='value', got: $kv"))
      m.group(1).toLowerCase -> m.group(2)
    }.toMap

  /** `name AS expr` computed-column lowering: PROCTIME() becomes
    * `current_timestamp()` (the documented processing-time posture —
    * evaluation-time, non-replayable, so oracled queries must not
    * emit it); everything else passes to Catalyst's expression parser
    * at view-registration time, which fails loudly on unknown columns
    * or functions. Subqueries are rejected here — a computed column
    * is a scalar projection, not a correlated plan.
    */
  private def mapComputedExpr(name: String, e: String): String = {
    val t = e.trim
    require(!raw"(?is)\bSELECT\b".r.findFirstIn(t).isDefined,
      s"computed column $name: subqueries are not supported in computed columns")
    if (t.equalsIgnoreCase("PROCTIME()")) "current_timestamp()" else t
  }

  def parseCreateTable(sql: String): TableDef = sql match {
    case CreateTableRx(name, colsRaw, partsRaw, optsRaw) =>
      var watermark: Option[(String, String)] = None
      val colDefs: Seq[Col] = splitTop(colsRaw).flatMap { item =>
        WatermarkRx.findFirstMatchIn(item) match {
          case Some(m) =>
            require(m.group(1).equalsIgnoreCase(m.group(2)),
              s"WATERMARK FOR ${m.group(1)}: the bound expression must subtract from " +
                s"the same column (got ${m.group(2)})")
            require(watermark.isEmpty, "CREATE TABLE: at most one WATERMARK clause")
            watermark = Some((m.group(1), s"${m.group(3)} ${m.group(4).toLowerCase}s"))
            None
          case None =>
            require(!item.toUpperCase.startsWith("WATERMARK"),
              s"unsupported WATERMARK clause (expected WATERMARK FOR ts AS ts - " +
                s"INTERVAL 'n' SECOND|MINUTE|HOUR|DAY): $item")
            require(!item.toUpperCase.startsWith("PRIMARY KEY"),
              "CREATE TABLE: PRIMARY KEY constraints are not in the supported subset — " +
                "declare version axes with createVersionedView")
            ComputedColRx.findFirstMatchIn(item.trim) match {
              case Some(c) =>
                Some(CompCol(c.group(1), mapComputedExpr(c.group(1), c.group(2))))
              case None =>
                val m = raw"(?s)^([A-Za-z_]\w*)\s+(.+)$$".r.findFirstMatchIn(item.trim)
                  .getOrElse(throw new IllegalArgumentException(
                    s"CREATE TABLE: cannot parse column declaration: $item"))
                Some(PhysCol(m.group(1), mapType(m.group(2))))
            }
        }
      }
      val cols = colDefs.collect { case PhysCol(n, t) => (n, t) }
      require(cols.nonEmpty, s"CREATE TABLE $name: no physical columns declared")
      val dupes = colDefs.groupBy(_.name.toLowerCase).filter(_._2.size > 1).keys
      require(dupes.isEmpty, s"CREATE TABLE $name: duplicate columns ${dupes.mkString(", ")}")
      watermark.foreach { case (c, _) =>
        require(colDefs.exists(_.name.equalsIgnoreCase(c)),
          s"WATERMARK FOR $c: no such column")
      }
      val partitions = Option(partsRaw).toSeq
        .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      partitions.foreach { p =>
        require(cols.exists(_._1.equalsIgnoreCase(p)),
          s"PARTITIONED BY $p: not a declared physical column " +
            "(computed columns cannot partition the layout)")
      }
      val opts = parseOptions(optsRaw)
      val known = Set("connector", "path", "format", "source.max-files-per-trigger")
      val unknown = opts.keySet.diff(known)
      require(unknown.isEmpty,
        s"CREATE TABLE $name: unsupported WITH options ${unknown.mkString(", ")} " +
          s"(supported: ${known.mkString(", ")})")
      require(opts.get("connector").forall(_ == "filesystem"),
        s"CREATE TABLE $name: only 'connector'='filesystem' is supported " +
          s"(got ${opts.get("connector")})")
      val path = opts.getOrElse("path", throw new IllegalArgumentException(
        s"CREATE TABLE $name: WITH must declare 'path'"))
      val format = opts.getOrElse("format", "parquet").toLowerCase
      require(Set("parquet", "csv", "json").contains(format),
        s"CREATE TABLE $name: unsupported format $format (parquet|csv|json)")
      TableDef(name, colDefs, watermark, path, format,
        opts.get("source.max-files-per-trigger").map(_.toInt), partitions)
    case _ => throw new IllegalArgumentException(
      "unsupported CREATE TABLE shape — expected CREATE TABLE name (col TYPE | col AS expr, …" +
        "[, WATERMARK FOR ts AS ts - INTERVAL 'n' UNIT]) [PARTITIONED BY (col, …)] " +
        "WITH ('path'='…'[, 'format'='…'])")
  }

  def parseCreateView(sql: String): (String, String) = sql match {
    case CreateViewRx(name, select) => (name, select.trim)
    case _ => throw new IllegalArgumentException(
      "unsupported CREATE VIEW shape — expected CREATE [OR REPLACE] VIEW name AS SELECT …")
  }

  def parseInsert(sql: String): Insert = sql match {
    case InsertRx(kind, table, colsRaw, select) =>
      val cols = Option(colsRaw).toSeq
        .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      require(cols.map(_.toLowerCase).distinct.length == cols.length,
        s"INSERT INTO $table: duplicate columns in the insert list")
      Insert(table, select.trim, kind.equalsIgnoreCase("OVERWRITE"), cols)
    case _ => throw new IllegalArgumentException(
      "unsupported INSERT shape — expected INSERT INTO|OVERWRITE table [(col, …)] SELECT …")
  }

  def isCreateTableLike(sql: String): Boolean =
    CreateTableLikeRx.pattern.matcher(sql).matches()

  /** `CREATE TABLE b [WITH (…)] LIKE a` (ref SqlCreateTable's LIKE
    * clause — Flink's schema-inheritance DDL): returns (newName,
    * overrideOptions, sourceName). Schema, watermark, and partitioning
    * inherit from the source; WITH overrides connector options
    * (typically a new path).
    */
  def parseCreateTableLike(sql: String): (String, Map[String, String], String) = sql match {
    case CreateTableLikeRx(name, optsRaw, src) =>
      (name, Option(optsRaw).map(parseOptions).getOrElse(Map.empty), src)
    case _ => throw new IllegalArgumentException(
      "unsupported CREATE TABLE LIKE shape — expected CREATE TABLE name [WITH (…)] LIKE other")
  }
}
