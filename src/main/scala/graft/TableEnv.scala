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
  // env-registered BASE tables: catalog TABLES in the reference (its
  // SqlDropTable accepts them), even though Spark registers them as
  // temp views — DROP kind-classification must not call them views
  private val baseTables = scala.collection.mutable.Set(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
  baseTables.foreach { t =>
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
    // a versioned view is declared table-like (the reference's
    // PRIMARY KEY + WATERMARK table), so DROP classifies it as a TABLE
    baseTables += name.toLowerCase
    df
  }

  private val ddlTables =
    scala.collection.mutable.Map.empty[String, DdlSql.TableDef]

  // ref: the reference's default namespace pair
  // (default_catalog.default_database) — the one database statements
  // resolve against; USE can only re-select it
  private val currentDatabase = "default_database"

  // CREATE FUNCTION aliases (the droppable tier — ref SqlDropFunction
  // refuses system functions) and the database property map ALTER
  // DATABASE SET maintains (ref SqlAlterDatabase)
  private val createdFunctions = scala.collection.mutable.Set.empty[String]
  private val dbProps = scala.collection.mutable.Map.empty[String, String]

  /** ref: TableEnvironmentImpl.executeSql:605 — the statement route:
    * DDL (CREATE TABLE / CREATE VIEW) and DML (INSERT) execute and
    * return a one-row status frame (the reference's TableResult "OK");
    * everything else delegates to [[sqlQuery]].
    */
  def executeSql(sql: String): DataFrame =
    if (raw"(?is)^\s*EXPLAIN\s+(PLAN\s+FOR\s+)?(?!EXTENDED\b|FORMATTED\b|CODEGEN\b|COST\b|ANALYZE\b)".r
        .findFirstIn(sql).isDefined) {
      // ref: TableEnvironment.explainSql / the EXPLAIN [PLAN FOR]
      // statement — returns the three-layer plan as a one-row result.
      // Spark's own EXPLAIN EXTENDED/FORMATTED/CODEGEN/COST modes fall
      // through to sqlQuery untouched (they parsed before this route
      // existed and must keep doing so — r10 review)
      import spark.implicits._
      Seq(explainSql(sql.replaceFirst(raw"(?is)^\s*EXPLAIN\s+(PLAN\s+FOR\s+)?", ""))).toDF("plan")
    } else if (DdlSql.isCreateTableLike(sql)) {
      // ref: SqlCreateTable's LIKE clause — inherit schema, watermark,
      // and partitioning from a declared table; WITH overrides the
      // connector options (typically a fresh path for a same-shape sink)
      val (name, opts, src) = DdlSql.parseCreateTableLike(sql)
      val base = ddlTables.getOrElse(src.toLowerCase,
        throw new IllegalArgumentException(
          s"CREATE TABLE $name LIKE $src: source is not a DDL-declared table"))
      val known = Set("connector", "path", "format", "source.max-files-per-trigger")
      val unknown = opts.keySet.diff(known)
      require(unknown.isEmpty,
        s"CREATE TABLE $name LIKE: unsupported WITH options ${unknown.mkString(", ")}")
      require(opts.get("connector").forall(_ == "filesystem"),
        s"CREATE TABLE $name LIKE: only 'connector'='filesystem' is supported")
      val td = base.copy(name = name,
        path = opts.getOrElse("path", base.path),
        format = opts.getOrElse("format", base.format).toLowerCase,
        maxFilesPerTrigger = opts.get("source.max-files-per-trigger").map(_.toInt)
          .orElse(base.maxFilesPerTrigger))
      require(Set("parquet", "csv", "json").contains(td.format),
        s"CREATE TABLE $name LIKE: unsupported format ${td.format}")
      ddlTables.update(name.toLowerCase, td)
      registerDdlView(td)
      okResult("CREATE TABLE LIKE", s"$name <- $src")
    } else if (DdlSql.isCreateTable(sql)) {
      val td = DdlSql.parseCreateTable(sql)
      ddlTables.update(td.name.toLowerCase, td)
      registerDdlView(td)
      okResult("CREATE TABLE", td.name)
    } else if (DdlSql.isCreateView(sql)) {
      val (name, select) = DdlSql.parseCreateView(sql)
      sqlQuery(select).createOrReplaceTempView(name)
      okResult("CREATE VIEW", name)
    } else if (DdlSql.isInsert(sql)) {
      val ins = DdlSql.parseInsert(sql)
      runInsert(ins)
      okResult(if (ins.overwrite) "INSERT OVERWRITE" else "INSERT INTO", ins.table)
    } else if (DdlSql.isDrop(sql)) {
      // ref: SqlDropTable.java / SqlDropView.java — unregister from the
      // DDL catalog AND the session view catalog; IF EXISTS swallows
      // only the not-found case, never a parse failure
      val (kind, ifExists, name) = DdlSql.parseDrop(sql)
      // kind must MATCH the catalog entry (ref SqlDropTable/SqlDropView
      // each reject the other kind): DROP VIEW on a DDL-declared table,
      // or DROP TABLE on a plain view, errors instead of unregistering
      if (ddlTables.contains(name.toLowerCase)) {
        require(kind == "TABLE",
          s"DROP VIEW $name: $name is a table (use DROP TABLE)")
        ddlTables.remove(name.toLowerCase)
        spark.catalog.dropTempView(name)
      } else if (baseTables.contains(name.toLowerCase)) {
        // env-registered base/versioned tables are catalog TABLES in
        // the reference, not views, even though Spark holds them as
        // temp views (r12 ADVICE: the kind test was inverted for them)
        require(kind == "TABLE",
          s"DROP VIEW $name: $name is a table (use DROP TABLE)")
        baseTables.remove(name.toLowerCase)
        versionedViews.remove(name.toLowerCase)
        spark.catalog.dropTempView(name)
      } else if (spark.catalog.tableExists(name)) {
        require(kind == "VIEW",
          s"DROP TABLE $name: $name is a view (use DROP VIEW)")
        spark.catalog.dropTempView(name)
      } else require(ifExists,
        s"DROP $kind $name: no such ${kind.toLowerCase} (add IF EXISTS to ignore)")
      okResult(s"DROP $kind", name)
    } else if (DdlSql.isAlterTableSet(sql)) {
      // ref: SqlAlterTableProperties.java — mutate the table's WITH
      // options in place; the view re-registers so the new path/format
      // takes effect for every later statement
      val (name, props) = DdlSql.parseAlterTableSet(sql)
      val td = ddlTables.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(
          s"ALTER TABLE $name SET: not a DDL-declared table"))
      val known = Set("connector", "path", "format", "source.max-files-per-trigger")
      val unknown = props.keySet.diff(known)
      require(unknown.isEmpty,
        s"ALTER TABLE $name SET: unsupported options ${unknown.mkString(", ")} " +
          s"(supported: ${known.mkString(", ")})")
      require(props.get("connector").forall(_ == "filesystem"),
        s"ALTER TABLE $name SET: only 'connector'='filesystem' is supported")
      val updated = td.copy(
        path = props.getOrElse("path", td.path),
        format = props.getOrElse("format", td.format).toLowerCase,
        maxFilesPerTrigger = props.get("source.max-files-per-trigger").map(_.toInt)
          .orElse(td.maxFilesPerTrigger))
      require(Set("parquet", "csv", "json").contains(updated.format),
        s"ALTER TABLE $name SET: unsupported format ${updated.format} (parquet|csv|json)")
      ddlTables.update(name.toLowerCase, updated)
      registerDdlView(updated)
      okResult("ALTER TABLE SET", name)
    } else if (DdlSql.isAlterTable(sql)) {
      // ref: SqlAlterTable.java — RENAME is the supported subset; the
      // files stay where they are, only the catalog entry moves
      val (from, to) = DdlSql.parseAlterRename(sql)
      val td = ddlTables.getOrElse(from.toLowerCase,
        throw new IllegalArgumentException(
          s"ALTER TABLE $from: not a DDL-declared table"))
      require(!ddlTables.contains(to.toLowerCase) &&
          !spark.catalog.tableExists(to),
        s"ALTER TABLE $from RENAME TO $to: target already exists")
      ddlTables.remove(from.toLowerCase)
      spark.catalog.dropTempView(from)
      val renamed = td.copy(name = to)
      ddlTables.update(to.toLowerCase, renamed)
      registerDdlView(renamed)
      okResult("ALTER TABLE RENAME", s"$from -> $to")
    } else if (DdlSql.isCreateFunction(sql)) {
      // ref: SqlCreateFunction.java:41 — the identifier binds to a
      // function the session registry already knows (graft library or
      // Spark built-in); the class-loading route is out of scope
      val (alias, target) = DdlSql.parseCreateFunction(sql)
      val reg = spark.sessionState.functionRegistry
      val builder = reg.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(target.toLowerCase))
        .getOrElse(throw new IllegalArgumentException(
          s"CREATE FUNCTION $alias AS '$target': unknown function $target " +
            "(must name a registered graft or Spark function)"))
      reg.createOrReplaceTempFunction(alias.toLowerCase, builder, "built-in")
      createdFunctions += alias.toLowerCase
      okResult("CREATE FUNCTION", alias)
    } else if (DdlSql.isDropFunction(sql)) {
      // ref: SqlDropFunction.java — unregisters a CREATE FUNCTION
      // alias; the library/built-in tier is not droppable (the
      // reference refuses dropping system functions), and IF EXISTS
      // swallows only the not-found case
      val (ifExists, name) = DdlSql.parseDropFunction(sql)
      val lc = name.toLowerCase
      val reg = spark.sessionState.functionRegistry
      if (createdFunctions.contains(lc)) {
        reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(lc))
        createdFunctions -= lc
        okResult("DROP FUNCTION", name)
      } else if (reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(lc))) {
        throw new IllegalArgumentException(
          s"DROP FUNCTION $name: $name is a built-in or library function, " +
            "not a CREATE FUNCTION alias — it cannot be dropped")
      } else {
        require(ifExists,
          s"DROP FUNCTION $name: no such function (add IF EXISTS to ignore)")
        okResult("DROP FUNCTION", name)
      }
    } else if (DdlSql.isCreateDatabase(sql)) {
      // ref: SqlCreateDatabase.java + the single-catalog environment:
      // default_database is the one database; creating it again is the
      // reference's DatabaseAlreadyExistException unless IF NOT EXISTS,
      // and creating any OTHER name is LOUD (no multi-database store)
      val (ifNotExists, name, _, _) = DdlSql.parseCreateDatabase(sql)
      if (name.equalsIgnoreCase(currentDatabase)) {
        require(ifNotExists,
          s"CREATE DATABASE $name: database already exists (add IF NOT EXISTS to ignore)")
        okResult("CREATE DATABASE", name)
      } else throw new IllegalArgumentException(
        s"CREATE DATABASE $name: this environment is single-database " +
          s"(only $currentDatabase exists; new databases are not supported)")
    } else if (DdlSql.isDropDatabase(sql)) {
      // ref: SqlDropDatabase.java — dropping the current (and only)
      // database is refused; a missing name is loud unless IF EXISTS
      val (ifExists, name, _) = DdlSql.parseDropDatabase(sql)
      if (name.equalsIgnoreCase(currentDatabase))
        throw new IllegalArgumentException(
          s"DROP DATABASE $name: cannot drop the current database")
      require(ifExists,
        s"DROP DATABASE $name: no such database (add IF EXISTS to ignore)")
      okResult("DROP DATABASE", name)
    } else if (DdlSql.isAlterDatabase(sql)) {
      // ref: SqlAlterDatabase.java — SET merges into the database's
      // property map (surfaced by DESCRIBE DATABASE EXTENDED)
      val (name, props) = DdlSql.parseAlterDatabase(sql)
      require(name.equalsIgnoreCase(currentDatabase),
        s"ALTER DATABASE $name: no database named $name (only $currentDatabase exists)")
      dbProps ++= props
      okResult("ALTER DATABASE SET", name)
    } else if (DdlSql.isShowCatalogs(sql)) {
      // ref: dql/SqlShowCatalogs.java / TableEnvironmentImpl
      // .listCatalogs — one default catalog in this environment
      import spark.implicits._
      Seq("default_catalog").toDF("catalog_name")
    } else if (DdlSql.isDescribeCatalog(sql)) {
      // ref: dql/SqlDescribeCatalog.java — the catalog's name and its
      // default database, as info rows; unknown catalogs are LOUD
      val name = DdlSql.parseDescribeCatalog(sql)
      require(name.equalsIgnoreCase("default_catalog"),
        s"DESCRIBE CATALOG $name: no catalog named $name (only default_catalog exists)")
      import spark.implicits._
      Seq(("catalog name", "default_catalog"),
        ("default database", currentDatabase)).toDF("info_name", "info_value")
    } else if (DdlSql.isDescribeDatabase(sql)) {
      // ref: dql/SqlDescribeDatabase.java — database info rows;
      // EXTENDED appends the ALTER DATABASE SET property map
      val (extended, catalogPart, name) = DdlSql.parseDescribeDatabase(sql)
      catalogPart.foreach(c => require(c.equalsIgnoreCase("default_catalog"),
        s"DESCRIBE DATABASE $c.$name: no catalog named $c (only default_catalog exists)"))
      require(name.equalsIgnoreCase(currentDatabase),
        s"DESCRIBE DATABASE $name: no database named $name (only $currentDatabase exists)")
      import spark.implicits._
      val base = Seq(("database name", currentDatabase), ("comment", ""))
      val rows = if (extended) base ++ dbProps.toSeq.sortBy(_._1)
        .map { case (k, v) => (s"property $k", v) } else base
      rows.toDF("info_name", "info_value")
    } else if (DdlSql.isShowDatabases(sql)) {
      // ref: TableEnvironmentImpl.listDatabases — the reference's
      // single-catalog/single-database layout maps to Spark's session
      // catalog: one default database
      import spark.implicits._
      Seq(currentDatabase).toDF("database_name")
    } else if (DdlSql.isShowFunctions(sql)) {
      // ref: TableEnvironmentImpl.listFunctions — every function a
      // statement in this environment can call (Spark built-ins, the
      // graft library, and CREATE FUNCTION aliases share one registry)
      import spark.implicits._
      spark.sessionState.functionRegistry.listFunction()
        .map(_.funcName).distinct.sorted.toDF("function_name")
    } else if (DdlSql.isUse(sql)) {
      // ref: SqlUseCatalog.java / SqlUseDatabase.java — switching is
      // only valid onto a catalog/database that exists; the environment
      // has exactly one of each, so anything else is LOUD. The database
      // identifier may be compound (SqlUseDatabase.fullDatabaseName()
      // is String[]): USE default_catalog.default_database is valid.
      val (isCatalog, catalogPart, name) = DdlSql.parseUse(sql)
      if (isCatalog) {
        require(name.equalsIgnoreCase("default_catalog"),
          s"USE CATALOG $name: no catalog named $name (only default_catalog exists)")
        okResult("USE CATALOG", name)
      } else {
        catalogPart.foreach(c => require(c.equalsIgnoreCase("default_catalog"),
          s"USE $c.$name: no catalog named $c (only default_catalog exists)"))
        require(name.equalsIgnoreCase(currentDatabase),
          s"USE $name: no database named $name (only $currentDatabase exists)")
        okResult("USE", name)
      }
    } else if (DdlSql.isShowTables(sql)) {
      // ref: TableEnvironmentImpl.listTables — sorted names of every
      // table visible to statements in this environment
      import spark.implicits._
      spark.catalog.listTables().collect().map(_.name).toSeq.sorted
        .toDF("table_name")
    } else if (DdlSql.isDescribe(sql)) {
      describeTable(DdlSql.parseDescribe(sql))
    } else sqlQuery(sql)

  /** ref: DESCRIBE statement / TableEnvironmentImpl.from(...).getSchema
    * — declared columns with the DDL annotations a reference user sees:
    * computed expression and watermark bound on the rowtime column.
    * Non-DDL views describe their Catalyst schema with empty extras.
    */
  private def describeTable(name: String): DataFrame = {
    import spark.implicits._
    ddlTables.get(name.toLowerCase) match {
      case Some(td) =>
        td.colDefs.map {
          case DdlSql.PhysCol(n, t) =>
            val wm = td.watermark.collect {
              case (c, d) if c.equalsIgnoreCase(n) => s"WATERMARK $c - INTERVAL $d" }
            (n, t.toUpperCase, "", wm.getOrElse(""))
          case DdlSql.CompCol(n, e) =>
            val wm = td.watermark.collect {
              case (c, d) if c.equalsIgnoreCase(n) => s"WATERMARK $c - INTERVAL $d" }
            (n, "", s"AS $e", wm.getOrElse(""))
        }.toDF("col_name", "data_type", "expr", "watermark")
      case None =>
        require(spark.catalog.tableExists(name), s"DESCRIBE $name: no such table or view")
        spark.table(name).schema.fields.toSeq
          .map(f => (f.name, f.dataType.sql, "", ""))
          .toDF("col_name", "data_type", "expr", "watermark")
    }
  }

  private def okResult(op: String, name: String): DataFrame = {
    import spark.implicits._
    Seq((op, name, "OK")).toDF("operation", "object", "result")
  }

  /** Register the view a DDL table resolves to. A WATERMARK clause
    * makes it a STREAMING read with the declared bound (the reference's
    * per-table WatermarkSpec — every downstream statement inherits it);
    * otherwise a batch read with the declared schema, safe on a
    * not-yet-written sink path (empty frame, declared schema).
    */
  private def registerDdlView(td: DdlSql.TableDef): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(td.path)
      .toAbsolutePath.getParent)
    import org.apache.spark.sql.functions.{col, expr}
    // computed columns project in DECLARED order over the physical read
    // (ref SqlTableColumn's computed variant); Catalyst's expression
    // parser/analyzer is the loud gate for unsupported expressions
    // chained withColumn in declared order lets a computed column
    // reference earlier computed columns (forward references fail loud)
    def project(df: DataFrame): DataFrame =
      if (td.computed.isEmpty) df
      else td.computed.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
        .select(td.colDefs.map(c => col(c.name)): _*)
    val df = if (td.watermark.isDefined) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(td.path))
      var r = spark.readStream.schema(td.schema).format(td.format)
      td.maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
      if (td.format == "csv") r = r.option("header", "true")
      val (wmCol, delay) = td.watermark.get
      // project BEFORE the watermark so a computed rowtime can carry it
      project(r.load(td.path)).withWatermark(wmCol, delay)
    } else {
      val exists = {
        val p = new java.io.File(td.path)
        p.exists && (p.isFile || Option(p.listFiles()).exists(_.nonEmpty))
      }
      if (!exists)
        project(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], td.schema))
      else {
        var r = spark.read.schema(td.schema).format(td.format)
        if (td.format == "csv") r = r.option("header", "true")
        project(r.load(td.path))
      }
    }
    df.createOrReplaceTempView(td.name)
  }

  /** INSERT INTO|OVERWRITE: the select runs through the full
    * [[sqlQuery]] route, aligns POSITIONALLY to the declared columns
    * with implicit casts (the reference's insert semantics), and writes
    * with the target's declared format+path — `writeStream`
    * (AvailableNow, append output) when the select is streaming. The
    * target's view is re-registered afterwards so later statements see
    * the new files (a cached file index would not).
    */
  private def runInsert(ins: DdlSql.Insert): Unit = {
    val td = ddlTables.getOrElse(ins.table.toLowerCase,
      throw new IllegalArgumentException(
        s"INSERT INTO ${ins.table}: not a DDL-declared table — CREATE TABLE it first"))
    val df0 = sqlQuery(ins.select)
    import org.apache.spark.sql.functions.{col, lit}
    // backtick-quote: auto-generated select-item names can contain dots
    val aligned = if (ins.cols.isEmpty) {
      require(df0.columns.length == td.cols.length,
        s"INSERT INTO ${ins.table}: select has ${df0.columns.length} columns, " +
          s"table declares ${td.cols.length} physical " +
          "(computed columns are virtual — never INSERT targets)")
      df0.select(df0.columns.toSeq.zip(td.cols).map {
        case (c, (name, typ)) => col(s"`$c`").cast(typ).as(name)
      }: _*)
    } else {
      // column-list insert (ref SqlInsert): the select aligns
      // positionally to the NAMED physical columns; unnamed physical
      // columns null-fill (the reference's nullable-fill semantics)
      ins.cols.foreach { c =>
        require(td.cols.exists(_._1.equalsIgnoreCase(c)),
          s"INSERT INTO ${ins.table} ($c, …): $c is not a declared physical column")
      }
      require(df0.columns.length == ins.cols.length,
        s"INSERT INTO ${ins.table}: select has ${df0.columns.length} columns, " +
          s"insert list names ${ins.cols.length}")
      val byTarget = ins.cols.map(_.toLowerCase).zip(df0.columns.toSeq).toMap
      df0.select(td.cols.map { case (name, typ) =>
        byTarget.get(name.toLowerCase) match {
          case Some(src) => col(s"`$src`").cast(typ).as(name)
          case None => lit(null).cast(typ).as(name)
        }
      }: _*)
    }
    if (aligned.isStreaming) {
      require(!ins.overwrite, s"INSERT OVERWRITE ${ins.table}: streaming inserts append")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ddl-ckpt").toString
      var ws = aligned.writeStream.format(td.format)
        .outputMode("append")
        .option("path", td.path)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      // the read path consumes csv with header=true — a headerless
      // streamed file would lose its first data row there (r10 review)
      if (td.format == "csv") ws = ws.option("header", "true")
      if (td.partitions.nonEmpty) ws = ws.partitionBy(td.partitions: _*)
      val q = ws.start()
      q.awaitTermination()
    } else {
      var w = aligned.write.mode(if (ins.overwrite) "overwrite" else "append")
        .format(td.format)
      if (td.format == "csv") w = w.option("header", "true")
      // PARTITIONED BY (ref SqlCreateTable.java:306): dynamic partition
      // layout — partition values become directories, so a reader's
      // partition-column filter prunes whole directories at plan time
      if (td.partitions.nonEmpty) w = w.partitionBy(td.partitions: _*)
      w.save(td.path)
    }
    // a sink declared with a watermark stays a streaming view; re-read
    // batch sinks so subsequent statements see the inserted files
    registerDdlView(td)
  }

  /** ref: TableEnvironment.createStatementSet / StatementSetImpl —
    * N INSERT statements sharing this environment's registered views,
    * executed by one `execute()` call. The reference fuses multi-sink
    * plans into one job with shared scans; Spark re-plans per sink, so
    * at 100 TB a shared upstream should be staged (persist/checkpoint
    * or an explicit intermediate table) — documented, not hidden.
    */
  final class StatementSet private[TableEnv] () {
    private val stmts = scala.collection.mutable.Buffer.empty[String]
    def addInsertSql(sql: String): this.type = {
      require(DdlSql.isInsert(sql),
        s"StatementSet.addInsertSql: not an INSERT statement: $sql")
      stmts += sql
      this
    }
    def execute(): DataFrame = {
      require(stmts.nonEmpty, "StatementSet.execute: no statements added")
      stmts.map(executeSql).reduce(_ union _)
    }
  }

  def createStatementSet(): StatementSet = new StatementSet()

  private val temporalFns =
    scala.collection.mutable.Map.empty[String, TemporalSql.TemporalFn]

  /** ref: Table.createTemporalTableFunction(timeAttribute, primaryKey)
    * + createTemporarySystemFunction — the reference's OTHER
    * temporal-join declaration, consumed by the
    * `LATERAL TABLE (fn(o.ts))` statement shape (routed through
    * [[TemporalSql.runFn]], lowered onto the same as-of plan as
    * FOR SYSTEM_TIME AS OF).
    */
  def createTemporalTableFunction(name: String, df: DataFrame,
      timeAttr: String, primaryKeys: Seq[String],
      tieBreak: Option[String] = None): Unit = {
    require(df.columns.contains(timeAttr),
      s"createTemporalTableFunction($name): no column $timeAttr")
    primaryKeys.foreach(pk => require(df.columns.contains(pk),
      s"createTemporalTableFunction($name): no primary-key column $pk"))
    temporalFns.update(name.toLowerCase,
      TemporalSql.TemporalFn(df, timeAttr, primaryKeys, tieBreak))
  }

  def sqlQuery(sql: String): DataFrame =
    if (graft.cep.MatchRecognizeSql.applies(sql)) graft.cep.MatchRecognizeSql.run(spark, sql)
    else if (TemporalSql.appliesFn(sql))
      TemporalSql.runFn(spark, sql, n => temporalFns.get(n.toLowerCase))
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
